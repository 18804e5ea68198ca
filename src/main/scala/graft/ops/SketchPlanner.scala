package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-DRIVEN join planning — the q291/q296 AMS statistics applied
  * as a planning input rather than a reported exhibit (round-11 advice
  * #5: "turn the planner-statistic pair from exhibit into capability").
  *
  * [[plannedPairCount]] decides HOW to compute a join-pair count before
  * touching the join: the AMS join-size estimate (one bounded sketch
  * pass per side, q296's estimator) is materialized driver-side — the
  * runtime-statistics pattern AQE itself uses between stages — and the
  * join is only MATERIALIZED row-by-row when the estimate says its
  * output stays within a small multiple of the probe side. When the
  * estimate reveals a fanout explosion (the skewed self-join case: a
  * 100-key side turns |fact|² / |keys| pairs), the count computes from
  * the per-key value-count tables instead (Σ f_a·f_b over |keys| rows)
  * and the row explosion never exists anywhere in the plan.
  *
  * This is the decision a cost-based planner makes from exactly this
  * statistic: at 100 TB the difference is a join output of ~10¹² rows
  * (uniform, safe to materialize and stream into downstream operators)
  * vs ~10¹⁷ (skewed self-join — anything that materializes it is dead,
  * regardless of partitioning). The sketch costs one aggregate per side
  * and 16 bounded row-sums; being wrong by even 10× cannot flip a
  * decision with these magnitudes, which is the regime sketch-driven
  * planning is FOR (q296 documents the near-uniform small-ratio regime
  * where it is not).
  */
object SketchPlanner {

  /** AMS join-size estimate between two (k, f) value-count tables
    * sharing `salt` (identical sign family on both sides is the
    * unbiasedness precondition — [[AmsSketch]]'s contract), collected
    * to the driver as a 1-row action. Exact DECIMAL(38,0) arithmetic:
    * |S_a·S_b| ≤ N_a·N_b < 10³⁸.
    */
  def estimateJoinSize(fa: DataFrame, fb: DataFrame,
      salt: String): java.math.BigDecimal = {
    val est = AmsSketch.rowSums(fa, salt, "se")
      .join(AmsSketch.rowSums(fb, salt, "so"), "r")
      .select(col("r"), (col("se") * col("so")).as("e"))
    // An EMPTY side yields an empty row-sum table (groupBy on zero
    // rows), so the median table is empty too — the estimate of a join
    // against nothing is exactly 0, not a NoSuchElementException (the
    // q276/bpeMerges degenerate-input class).
    AmsSketch.lowerMedian(est).collect().headOption
      .map(_.getDecimal(0)).getOrElse(java.math.BigDecimal.ZERO)
  }

  /** Join-pair count of probe ⋈ build on probeKey = buildKey, computed
    * by the strategy the sketch estimate selects:
    *
    *  - '''direct''' (est ≤ 32·|probe|): COUNT over the materialized
    *    equi join of the raw sides — the plan a downstream consumer of
    *    the join rows would share.
    *  - '''preagg''' (est > 32·|probe|): Σ f_a·f_b over the value-count
    *    tables — |keys|-row inputs, the explosion never materializes.
    *
    * Both strategies return the identical count (BIGINT; the exact
    * DECIMAL(38,0) product sum is bound-checked by construction at
    * ≤ N_a·N_b). `fa`/`fb` must be the (k, f) value counts of the two
    * sides — pass the SAME frame twice for a self-join (key columns are
    * renamed internally, so self-joins resolve unambiguously).
    *
    * Returns (1-row pairs DataFrame, chosen strategy, estimate,
    * probe-row count).
    */
  def plannedPairCount(
      probe: DataFrame, probeKey: String,
      build: DataFrame, buildKey: String,
      fa: DataFrame, fb: DataFrame,
      salt: String): (DataFrame, String, java.math.BigDecimal, Long) = {
    val est = estimateJoinSize(fa, fb, salt)
    // coalesce: sum over an empty value-count table is NULL; an empty
    // probe side means est = 0 ≤ 0 → direct → an empty join → pairs 0.
    val nProbe = fa.agg(coalesce(sum("f"), lit(0L))).head().getLong(0)
    val direct =
      est.compareTo(java.math.BigDecimal.valueOf(32L * nProbe)) <= 0
    val pairs =
      if (direct)
        probe.select(col(probeKey).as("__pk"))
          .join(build.select(col(buildKey).as("__bk")),
            col("__pk") === col("__bk"))
          .agg(count(lit(1)).as("pairs"))
      else
        fa.select(col("k").as("ka"), col("f").cast("decimal(38,0)").as("f_a"))
          .join(fb.select(col("k").as("kb"),
            col("f").cast("decimal(38,0)").as("f_b")),
            col("ka") === col("kb"))
          .agg(sum(col("f_a") * col("f_b")).cast("long").as("pairs"))
    (pairs, if (direct) "direct" else "preagg", est, nProbe)
  }
}
