package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as a native expression: `minhash_sig(shingles, k)`
  * → ARRAY<LONG> of k affine-permutation minima over the shingle set.
  *
  * Same math as the declarative fold in [[graft.ops.Dedup.minHashSignature]]
  * (xxhash64 seed 42 → reduce mod P=2^31-1 → per-permutation affine map
  * `h·aᵢ+bᵢ mod P`, empty set → P), but as ONE tight JVM loop per row
  * instead of a higher-order expression tree: the HOF form pays an
  * interpreted lambda dispatch per (shingle × permutation), which
  * profiling showed dominating the LSH bench stage. CodegenFallback is
  * deliberate — the expression evaluates once per row and its inner
  * loop is already primitive; generating Java for it would only widen
  * the codegen span, not the hot loop.
  */
case class MinHashSig(child: Expression, numHashes: Int)
  extends UnaryExpression with CodegenFallback {

  private val P = 2147483647L // 2^31-1, matches Dedup.minHashSignature

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires ARRAY<STRING>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(P)
    var s = 0
    while (s < n) {
      // Null elements hash to the seed itself (42) — what SQL
      // xxhash64(NULL) returns — preserving bit parity with the HOF
      // reference fold on arrays that contain nulls.
      val h0 =
        if (arr.isNullAt(s)) 42L
        else XxHash64Function.hash(
          arr.getUTF8String(s), StringType, 42L) // xxhash64's default seed
      val h = ((h0 % P) + P) % P // pmod
      var i = 0
      while (i < numHashes) {
        val a = (i * 2L + 1315423911L) % P
        val v = ((h * a + (i * 7919L + 104729L)) % P + P) % P
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      s += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
