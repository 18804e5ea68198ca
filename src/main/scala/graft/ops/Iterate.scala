package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** The house discipline for unrolled iterative fixpoints (PageRank q159,
  * Bradley–Terry q222, HITS q285, connected components in [[Dedup]],
  * BOM rollup q286, DBSCAN q320 — the shapes that top every bench
  * profile), extracted once (round-12 verdict #7) so the three rules it
  * encodes are written and tested in one place:
  *
  *  1. **Materialize the base once, cut each round.** A round that
  *     references the previous state more than once (both legs of a
  *     join, or a normalizer aggregate plus the next join) re-embeds
  *     the entire history in its plan — plan size doubles per round
  *     even though runtime exchange-reuse exists. A LAZY
  *     `localCheckpoint(false)` severs the lineage without forcing a
  *     job on plan-only consumers (PlanSpec sweeps, `.explain`), and
  *     its cached partitions are shared by every consumer of the
  *     round's output (measured on q285: 13.7 → 5.6 s at sf0.1).
  *  2. **Every-Nth-round stats reset.** `localCheckpoint` rewrites the
  *     new LogicalRDD's sizeInBytes FROM the round plan, whose leaves
  *     are the previous rounds' LogicalRDDs: join estimates MULTIPLY
  *     child sizes, so the carried BigInt's digit count compounds per
  *     round and by ~round 10 a single stats visit grinds the driver
  *     in million-digit BigInteger multiplies (observed on q320's
  *     8-round spatial graph before the reset existed). Re-wrapping
  *     the checkpointed RDD through `createDataFrame` resets the leaf
  *     to constant default stats; doing it every THIRD round keeps
  *     intermediate digit counts in the thousands while skipping the
  *     per-round Row-conversion tax on short loops — which is also why
  *     the 3–4-round unrolled queries run with the reset OFF: their
  *     digit counts never leave the thousands.
  *  3. **1-row normalizer broadcasts read the CUT state.** A per-round
  *     normalizer built from the evolving state must aggregate the
  *     checkpointed table, not the raw round plan — otherwise the
  *     broadcast subtree re-embeds the history rule 1 just cut, and
  *     the raw scores compute twice per round (once for the total,
  *     once for the division).
  */
object Iterate {

  /** Rule-2 stats reset: re-wrap a (checkpointed) frame so its leaf
    * carries constant default stats instead of the compounded product
    * of every prior round's estimates. Values and schema unchanged.
    */
  def statsReset(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(df.rdd, df.schema)

  /** Rules 1+2 for one round's output: lazy lineage cut, plus the
    * stats reset every `resetEvery` rounds (0 = off, the right setting
    * for short unrolled loops).
    */
  def cut(df: DataFrame, round: Int, resetEvery: Int = 0): DataFrame = {
    val ck = df.localCheckpoint(false)
    if (resetEvery > 0 && round % resetEvery == 0) statsReset(ck) else ck
  }

  /** K unrolled rounds of `state ← step(state, round)` with the cut
    * discipline applied to each round's output. `cutEvery = 0` runs
    * the pure in-plan composition (right when the state appears ONCE
    * per round and K is small — q159's four PageRank steps chain
    * linearly); `cutEvery = 1` cuts every round (right when the next
    * round reads the state more than once — q222's MM update joins the
    * strength table on both legs).
    */
  def rounds(init: DataFrame, k: Int, cutEvery: Int = 1,
             resetEvery: Int = 0)
            (step: (DataFrame, Int) => DataFrame): DataFrame = {
    var st = init
    for (r <- 1 to k) {
      st = step(st, r)
      if (cutEvery > 0 && r % cutEvery == 0) st = cut(st, r, resetEvery)
    }
    st
  }

  /** Rule 3, one renormalization half-step: cut the raw score table
    * (its normalizer aggregate AND the caller's next join both read
    * it), build the 1-row total as a broadcast OVER THE CUT, and hand
    * both to the caller's division.
    */
  def renorm(raw: DataFrame, round: Int, resetEvery: Int = 0)
            (totalAgg: DataFrame => DataFrame)
            (divide: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val rawCut = cut(raw, round, resetEvery)
    divide(rawCut, broadcast(totalAgg(rawCut)))
  }
}
