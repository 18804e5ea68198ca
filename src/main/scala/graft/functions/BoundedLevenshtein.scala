package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_lev_bounded(a, b, k)` → INT: the Levenshtein distance of `a`
  * and `b` if it is ≤ `k`, else `k + 1` — the BANDED dynamic program.
  *
  * Why it exists (the q142 scale path): fuzzy matching only ever asks
  * "is the distance ≤ k", but the built-in `levenshtein` fills the full
  * |a|×|b| DP table — O(len²) per candidate pair. The banded DP visits
  * only the 2k+1-wide diagonal (cells that can hold a value ≤ k),
  * byte-length-gates |bytes_a − bytes_b| > 4k in O(1) before any
  * decode (then the exact UTF-16 length gate after decoding), and
  * early-exits the moment a whole row exceeds k — O(k·len) per pair
  * with tiny constants, which is what a blocked fuzzy join does per
  * candidate at 100 TB. Contract proven in `LevenshteinSpec`:
  * bit-equal to the full DP whenever distance ≤ k, and exactly k+1
  * otherwise, so `graft_lev_bounded(a,b,k) <= k` ⟺
  * `levenshtein(a,b) <= k` (the DuckDB-oracle equivalence q142 rides).
  *
  * Comparison is over UTF-16 code units (Java chars) — identical to
  * the full DP on ASCII (all harness data); supplementary-plane
  * characters count as two units.
  *
  * Codegen: one static call inside the generated code — no interpreted
  * expression dispatch; the hot loop lives in [[BoundedLevenshtein
  * .banded]] where the JIT sees a monomorphic primitive DP.
  */
case class BoundedLevenshtein(left: Expression, right: Expression, k: Int)
  extends BinaryExpression {
  require(k >= 0, s"graft_lev_bounded k must be >= 0, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_lev_bounded requires two STRING arguments, got " +
          s"${l.simpleString} and ${r.simpleString}")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_lev_bounded"

  override def nullSafeEval(a: Any, b: Any): Any =
    BoundedLevenshtein.banded(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.BoundedLevenshtein.banded($x, $y, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BoundedLevenshtein {

  /** Banded DP core. Returns lev(a, b) when ≤ k, else k + 1.
    *
    * Band invariant: row i only writes columns [max(1,i−k)−1,
    * min(lb,i+k)] of `cur` (the −1 is the explicit left-boundary
    * sentinel); reads outside a row's valid band are guarded (the
    * `j == i + k` up-cell) or land on cells the previous row wrote.
    * INF = k+1 saturates so no overflow and no value below it can
    * reappear once a row's minimum hits INF (early exit).
    */
  def banded(ua: UTF8String, ub: UTF8String, k: Int): Int = {
    val inf = k + 1
    // O(1) pre-gate BEFORE any decode: one UTF-16-unit edit changes the
    // UTF-8 byte length by at most 4, so |byteLen diff| > 4k proves
    // distance > k without touching characters (numBytes is a stored
    // field). On ASCII — all harness data — this is just a 4× slack on
    // the exact length gate below.
    if (math.abs(ua.numBytes - ub.numBytes) > 4 * k) return inf
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (math.abs(la - lb) > k) return inf
    if (la == 0) return math.min(lb, inf)
    if (lb == 0) return math.min(la, inf)
    var prev = new Array[Int](lb + 1)
    var cur = new Array[Int](lb + 1)
    var j = 0
    while (j <= lb) { prev(j) = if (j <= k) j else inf; j += 1 }
    var i = 1
    while (i <= la) {
      val jlo = math.max(1, i - k)
      val jhi = math.min(lb, i + k)
      cur(jlo - 1) = if (jlo - 1 == 0 && i <= k) i else inf
      var rowMin = cur(jlo - 1)
      val ca = a.charAt(i - 1)
      j = jlo
      while (j <= jhi) {
        val cost = if (ca == b.charAt(j - 1)) 0 else 1
        val up = if (j == i + k) inf else prev(j)
        var v = prev(j - 1) + cost
        val step = math.min(up, cur(j - 1)) + 1
        if (step < v) v = step
        if (v > inf) v = inf
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (rowMin >= inf) return inf
      val t = prev; prev = cur; cur = t
      i += 1
    }
    math.min(prev(lb), inf)
  }
}
