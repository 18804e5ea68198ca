package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash as a native expression: `simhash64(tokens)` → LONG.
  *
  * Same math as the declarative fold in [[graft.ops.Dedup.simHashHof]]
  * (per token: xxhash64 seed 42; each bit votes ±1 by its value; output
  * bit `b` is set when votes are positive), but as one tight JVM loop
  * per row. The HOF form allocates a fresh 64-long vote array per token
  * and pays an interpreted lambda dispatch per (token × bit) —
  * ~13k dispatches for a 200-token doc — which made the signature scan
  * the second-slowest bench stage. CodegenFallback for the same reason
  * as [[MinHashSig]]: the expression runs once per row and the inner
  * loop is already primitive.
  */
case class SimHash64(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires ARRAY<STRING>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Long](64)
    var t = 0
    while (t < n) {
      // Null tokens hash to the seed (42) — what SQL xxhash64(NULL)
      // returns — preserving bit parity with the HOF reference fold.
      val h =
        if (arr.isNullAt(t)) 42L
        else XxHash64Function.hash(arr.getUTF8String(t), StringType, 42L)
      var b = 0
      while (b < 64) {
        votes(b) += ((h >> b) & 1L) * 2L - 1L
        b += 1
      }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0L) sig |= 1L << b
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
