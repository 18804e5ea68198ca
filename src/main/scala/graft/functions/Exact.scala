package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-exact numeric helpers.
  *
  * Floating-point SUM is evaluation-order dependent, and Spark and the
  * DuckDB oracle aggregate in different orders. Money columns in the
  * harness data are 2-decimal doubles, so we quantize each row to
  * integer cents — `round(x * 100)` is a deterministic scalar (identical
  * IEEE ops on identical input bits in both engines) — and sum the
  * resulting BIGINTs, which is exact and order-independent. The final
  * division by 100.0 is a single deterministic op. The oracle SQL uses
  * the literally-equivalent `sum(CAST(round(x*100) AS BIGINT))/100.0`.
  *
  * At 100 TB the same trick doubles as an efficiency win: integer sums
  * stay inside whole-stage codegen with no Kahan/compensation cost and
  * partial (map-side) aggregation remains exact.
  */
object Exact {
  /** Row-level money value quantized to integer cents. */
  def cents(c: Column): Column = round(c * lit(100), 0).cast("long")

  /** Order-independent, bit-exact money sum (result in currency units). */
  def moneySum(c: Column): Column = sum(cents(c)) / lit(100.0)

  /** Order-independent money avg. Divides by the non-null count of `c`
    * (SQL AVG null semantics — round-1 ADVICE fix). */
  def moneyAvg(c: Column): Column = sum(cents(c)) / lit(100.0) / count(c)

  /** Oracle-side SQL fragment equivalent of [[cents]] — the ONE place
    * the quantization is spelled in SQL, so engine and oracle cannot
    * silently desync (window sums build on it too, e.g. q23). */
  def centsSql(expr: String): String =
    s"CAST(round(($expr)*100) AS BIGINT)"

  /** Oracle-side SQL fragment equivalent of [[moneySum]]. */
  def moneySumSql(expr: String): String =
    s"sum(${centsSql(expr)})/100.0"

  def moneyAvgSql(expr: String): String =
    s"sum(${centsSql(expr)})/100.0/count($expr)"
}
