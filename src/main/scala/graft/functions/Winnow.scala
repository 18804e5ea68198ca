package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Winnowing fingerprint selection as a native expression:
  * `graft_winnow(hashes, w)` → ARRAY<LONG> of the DISTINCT sliding-
  * window-of-`w` minima of the input hash array, in first-occurrence
  * order (Schleimer et al. 2003 — the MOSS local fingerprinting
  * scheme q194 builds on).
  *
  * Contract (bit-identical to the declarative HOF reference kept as
  * [[graft.ops.Text.winnowHof]], parity-tested in LlmSpec):
  * empty input → empty; 0 < size < w → the single global minimum;
  * else `array_distinct(transform(0..size-w, i -> array_min(slice(h,
  * i+1, w))))` — array_distinct keeps FIRST occurrences, array_min
  * skips nulls (a window of only nulls yields a null fingerprint,
  * kept if first).
  *
  * The HOF form pays an interpreted lambda dispatch per window plus an
  * O(w) slice+min per window (O(n·w) per row, all interpreted); this
  * is ONE pass with a monotonic deque (O(n) total) plus a hash set for
  * the distinct. CodegenFallback for the same reason as [[Shingles]]:
  * once per row, primitive inner loop.
  */
case class Winnow(child: Expression, w: Int)
  extends UnaryExpression with CodegenFallback {

  require(w >= 1, s"graft_winnow w must be >= 1, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_winnow requires ARRAY<BIGINT>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_winnow"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sz = arr.numElements()
    if (sz == 0) return new GenericArrayData(Array.empty[Any])
    // null-skipping min semantics of array_min: track nulls explicitly.
    val hs = new Array[Long](sz)
    val nl = new Array[Boolean](sz)
    var i = 0
    while (i < sz) {
      if (arr.isNullAt(i)) nl(i) = true else hs(i) = arr.getLong(i)
      i += 1
    }
    val out = new java.util.LinkedHashSet[Any]()
    if (sz < w) {
      // global min of the non-null values; all-null → null fingerprint
      var best = Long.MaxValue; var seen = false
      i = 0
      while (i < sz) {
        if (!nl(i) && (!seen || hs(i) < best)) { best = hs(i); seen = true }
        i += 1
      }
      out.add(if (seen) best else null)
    } else {
      // monotonic deque of indices over non-null values; a window with
      // no non-null value yields null (array_min of all-null slice).
      val dq = new Array[Int](sz)
      var lo = 0; var hi = 0 // dq[lo until hi]
      i = 0
      while (i < sz) {
        if (!nl(i)) {
          while (hi > lo && hs(dq(hi - 1)) >= hs(i)) hi -= 1
          dq(hi) = i; hi += 1
        }
        if (i >= w - 1) {
          val start = i - w + 1
          while (hi > lo && dq(lo) < start) lo += 1
          out.add(if (hi > lo) hs(dq(lo)) else null)
        }
        i += 1
      }
    }
    val res = new Array[Any](out.size)
    val it = out.iterator(); var j = 0
    while (it.hasNext) { res(j) = it.next(); j += 1 }
    new GenericArrayData(res)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
