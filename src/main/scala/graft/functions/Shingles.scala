package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles as a native expression:
  * `graft_shingles(tokens, n)` → ARRAY<STRING> of the `size-n+1`
  * space-joined n-grams (empty for shorter inputs).
  *
  * Bit-identical semantics to the declarative HOF form kept as
  * [[graft.ops.Text.shinglesHof]] (transform over an index sequence
  * with per-element `concat_ws`, including concat_ws's null-skipping),
  * but ONE tight loop per row over the token array: the HOF form pays
  * an interpreted lambda dispatch per shingle plus an `element_at`
  * per (shingle × n) — the dominant cost of every shingle consumer
  * (q52 Jaccard, q54/q94 MinHash-LSH, q111 decontamination).
  * CodegenFallback for the same reason as [[MinHashSig]]: the
  * expression runs once per row and its inner loop is already
  * primitive.
  */
case class Shingles(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"graft_shingles n must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles requires ARRAY<STRING>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  @transient private lazy val sp = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sz = arr.numElements()
    val m = sz - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](sz)
    var i = 0
    while (i < sz) {
      // concat_ws SKIPS null inputs — preserve that for bit parity
      // with the HOF reference on arrays containing nulls.
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val out = new Array[Any](m)
    val window = new Array[UTF8String](n)
    i = 0
    while (i < m) {
      var j = 0
      while (j < n) { window(j) = toks(i + j); j += 1 }
      out(i) = UTF8String.concatWs(sp, window: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
