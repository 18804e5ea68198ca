package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_jaro_winkler(a, b)` → BIGINT: the Jaro-Winkler similarity
  * half-up quantized to integer 1e-6 units (`floor(sim·10⁶ + 0.5)`).
  *
  * Why it exists (the q238 record-linkage path): Jaro-Winkler is the
  * standard name/title matcher (prefix-weighted, transposition-
  * tolerant) and Spark ships no built-in for it, while DuckDB does
  * (`jaro_winkler_similarity`) — so the oracle replays the same score.
  * The formula is the published Winkler form (standard parameters:
  * matching window max(|a|,|b|)/2 − 1, transpositions t = ⌊tc/2⌋,
  * boost threshold 0.7, prefix weight 0.1, prefix cap 4), computed
  * with the SAME IEEE double dag both engines use — every dividend is
  * a small exact integer and each op is exactly rounded, and the 1e-6
  * quantization absorbs any residual cross-engine ulp (half a 1e-6
  * cell is ~5e8 ulps of headroom; the 3-SF sweep is the per-dataset
  * proof, per the q101 contract).
  *
  * Match/transposition counting is over UTF-16 code units (Java
  * chars) — identical to DuckDB on ASCII, which is all harness data.
  *
  * Codegen: one static call in generated code (the
  * [[BoundedLevenshtein]] pattern) — the match loop is a monomorphic
  * primitive scan the JIT compiles tight; O(|a|·window) per pair,
  * which a blocked fuzzy join pays per candidate, never per corpus
  * row.
  */
case class JaroWinkler(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_jaro_winkler requires two STRING arguments, got " +
          s"${l.simpleString} and ${r.simpleString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.jw6(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.JaroWinkler.jw6($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** floor(jaro_winkler(a, b) · 1e6 + 0.5) as a Long. */
  def jw6(ua: UTF8String, ub: UTF8String): Long = {
    val a = ua.toString
    val b = ub.toString
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 && l2 == 0) return 1000000L
    if (l1 == 0 || l2 == 0) return 0L
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val am = new Array[Boolean](l1)
    val bm = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val ca = a.charAt(i)
      val hi = math.min(l2 - 1, i + window)
      var j = math.max(0, i - window)
      var matched = false
      while (j <= hi && !matched) {
        if (!bm(j) && ca == b.charAt(j)) {
          am(i) = true; bm(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0L
    // Raw count of aligned-match mismatches; t = tc / 2 (integer —
    // the standard definition all reference implementations use).
    var tc = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (am(i)) {
        while (!bm(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) tc += 1
        k += 1
      }
      i += 1
    }
    val t = tc / 2
    // The published double dag, left-associated exactly as written —
    // each dividend/divisor is a small exact integer, each IEEE op
    // exactly rounded, so any standard implementation reproduces
    // these bits.
    var sim = (m.toDouble / l1 + m.toDouble / l2 +
      (m - t).toDouble / m) / 3.0
    if (sim > 0.7) {
      var p = 0
      val pMax = math.min(4, math.min(l1, l2))
      while (p < pMax && a.charAt(p) == b.charAt(p)) p += 1
      sim = sim + p.toDouble * 0.1 * (1.0 - sim)
    }
    math.floor(sim * 1e6 + 0.5).toLong
  }
}
