package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared AMS sign-sketch machinery for the frequency-moment family —
  * q291 (F₂ = self inner product) and q296 (join size = cross inner
  * product). Single-sourced because the hash family and the median
  * rule are CROSS-QUERY CONTRACTS: q296's estimator is unbiased only
  * if both sides share the identical sign function (the q261
  * shared-salt lesson), and each query's DuckDB oracle replays these
  * exact md5 inputs — a drift in either would desync four sites at
  * once (review-driven extraction).
  *
  * Conventions:
  *   - [[Rows]] = 16 sketch rows; estimates use the LOWER median (the
  *     8th of 16 ordered by (value, row) — an exact integer pick, no
  *     float averaging).
  *   - sign_r(k) = ±1 from the first hex digit of
  *     md5("<salt><r>:<k>"), replayed oracle-side as
  *     ('0x' || substring(md5(...), 1, 1))::INT % 2 * 2 - 1.
  *   - row sums ride DECIMAL(38,0): |S| ≤ N total rows, so products
  *     of two sums hold to N_a·N_b < 10³⁸.
  */
object AmsSketch {

  val Rows = 16

  /** ±1 sign from one md5 hex digit of `"<salt><r>:<k>"`. */
  def sign(salt: String, r: Column, k: Column): Column =
    conv(substring(md5(concat(lit(salt), r.cast("string"), lit(":"),
      k.cast("string"))), 1, 1), 16, 10).cast("int") % 2 * 2 - 1

  /** Per-sketch-row signed sums Σ f·sign_r(k) over a (k, f)
    * value-count table → ([[Rows]] rows: r, <out>), DECIMAL(38,0).
    */
  def rowSums(vc: DataFrame, salt: String, out: String): DataFrame =
    vc.select(col("k"), col("f"),
        explode(array((0 until Rows).map(lit(_)): _*)).as("r"))
      .groupBy("r")
      .agg(sum(col("f").cast("decimal(38,0)") *
        sign(salt, col("r"), col("k"))).as(out))

  /** The lower median of column `e` over a ([[Rows]])-row estimate
    * table carrying (e, r) — deterministic ties by r.
    */
  def lowerMedian(est: DataFrame): DataFrame =
    est.withColumn("rn",
        row_number().over(Window.orderBy(col("e"), col("r"))))
      .filter(col("rn") === Rows / 2).select(col("e"))
}
