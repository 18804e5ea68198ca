package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase scalable ranking (the round-6 verdict's prescription for the
  * q21/q71/q77 defect class).
  *
  * A plain `row_number().over(Window.partitionBy(k).orderBy(o))` sorts each
  * window partition inside ONE task. When `k` is low-cardinality (3 order
  * statuses, 3 return flags) and the output is the full table, that task
  * holds rows/|k| rows — a single-task sort that grows linearly with the
  * data and is the classic 100 TB scale-killer. (A `rn <= N` filter
  * escapes via map-side WindowGroupLimit — see q20/q86 — but full-output
  * ranking has no such escape.)
  *
  * The two-phase shape bounds every sort by a RANGE BUCKET instead:
  *
  *  1. `repartitionByRange(buckets, part ++ order)` — rows land in range
  *     buckets that respect the (part, order) lexicographic total order,
  *     so within a part key, bucket i sorts entirely before bucket i+1.
  *  2. Count rows per (part, bucket) — a tiny aggregate, |part|×buckets
  *     rows — and prefix-sum it per part key into bucket START OFFSETS.
  *  3. Broadcast the offsets back and add each row's bucket-local
  *     `row_number()` (a window over (part, bucket) — every partition now
  *     at most one range bucket, ~rows/buckets) to its bucket's offset.
  *
  * The result equals the one-shuffle window's global row_number exactly,
  * and is independent of where the sampled range boundaries fall: offsets
  * absorb any imbalance, ties that straddle a boundary are ordered by the
  * unique tie-break inside `order` (callers MUST include one, same as any
  * deterministic row_number). Cost: the classic zip-with-index trade —
  * one extra pass for the counts (the range exchange is reused, not
  * re-scanned) and a tiny broadcast, in exchange for per-task memory
  * bounded at rows/buckets regardless of key skew. At cluster scale,
  * `buckets` is the shuffle parallelism (thousands), not 32.
  */
object ScalableRank {

  /** Shared phase-0 preamble: range-bucket `df` on partCols ++ orderCols
    * and tag each row with its bucket id. Every two-phase operator
    * below derives BOTH its branches (per-bucket offsets and the
    * bucket-local window) from this ONE frame — see [[bucketize]]'s
    * exchange-reuse contract for why that sharing is load-bearing. */
  private def rangeBucketed(
      df: DataFrame,
      partCols: Seq[String],
      orderCols: Seq[Column],
      buckets: Int): (DataFrame, Seq[Column], org.apache.spark.sql.expressions.WindowSpec) = {
    val rangeCols = partCols.map(col) ++ orderCols
    val bucketed = df
      .repartitionByRange(buckets, rangeCols: _*)
      .withColumn("__pid", spark_partition_id())
    val grpPid = (partCols :+ "__pid").map(col)
    val byPart = Window.partitionBy(partCols.map(col): _*)
    (bucketed, grpPid, byPart)
  }

  /** Phase 1, shared by [[rowNumbered]] and bucket-pruned consumers
    * (q103's order statistics): range-bucket `df` and count each
    * bucket. Returns (bucketed, offsets, stats):
    *  - `bucketed` = `df` + `__pid` (the range bucket id);
    *  - `offsets`  = one row per (part, `__pid`) with `__cnt` (bucket
    *    row count) and `__off` (exclusive prefix sum = global rank of
    *    the bucket's first row, minus one) — |part|×buckets rows;
    *  - `stats`    = one row per part key with its total count `n`.
    *
    * CORRECTNESS CONTRACT — one exchange, two consumers. The offsets
    * branch and the data branch must observe the SAME `__pid`
    * assignment. Range boundaries come from sampling seeded by RDD
    * lineage, so two INDEPENDENT executions of the exchange may pick
    * different boundaries — consistent only because Spark's exchange
    * reuse (default-on, AQE stage reuse at runtime) unifies the two
    * branches into one physical exchange. For reuse to fire, the two
    * exchange subtrees must canonicalize identically, which holds as
    * long as EVERY column of `df` appears in `partCols ++ orderCols`
    * (as q102/q103's inputs do): a payload column would let column
    * pruning narrow the counts branch's scan and split the subtrees.
    * Callers adding payload columns must instead join them back on the
    * tie-break key afterwards (or persist `bucketed`). PlanSpec asserts
    * ReusedExchange in both q102's and q103's executed plans, and
    * ScalableRankSpec's 1..n-permutation property would fail loudly on
    * any divergence.
    */
  def bucketize(
      df: DataFrame,
      partCols: Seq[String],
      orderCols: Seq[Column],
      buckets: Int,
      n: String = "n"): (DataFrame, DataFrame, DataFrame) = {
    val (bucketed, grpPid, byPart) = rangeBucketed(df, partCols, orderCols, buckets)
    val counts = bucketed.groupBy(grpPid: _*).agg(count(lit(1)).as("__cnt"))
    val offsets = counts.withColumn(
      "__off",
      coalesce(
        sum("__cnt").over(byPart.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val stats = counts.groupBy(partCols.map(col): _*).agg(sum("__cnt").as(n))
    (bucketed, offsets, stats)
  }

  /** Returns (ranked, stats): `ranked` = `df` + column `rn` (1-based
    * global row number within `partCols` under `orderCols`, BIGINT);
    * `stats` = one row per part key with its total row count `n` —
    * tiny, broadcastable, computed from the bucket counts rather than a
    * second scan of `df`.
    *
    * `orderCols` must include a unique tie-break column for the output
    * to be deterministic (standard row_number contract).
    */
  def rowNumbered(
      df: DataFrame,
      partCols: Seq[String],
      orderCols: Seq[Column],
      buckets: Int,
      rn: String = "rn",
      n: String = "n"): (DataFrame, DataFrame) = {
    val (bucketed, offsets, stats) = bucketize(df, partCols, orderCols, buckets, n)
    val wLocal = Window.partitionBy((partCols :+ "__pid").map(col): _*).orderBy(orderCols: _*)
    val ranked = bucketed
      .join(broadcast(offsets.drop("__cnt")), partCols :+ "__pid")
      .withColumn(rn, col("__off") + row_number().over(wLocal))
      .drop("__pid", "__off")
    (ranked, stats)
  }

  /** Two-phase scalable RUNNING SUM (prefix sum) of integral `valCol`
    * within `partCols` under `orderCols` — [[rowNumbered]]'s shape
    * accumulating a value instead of a count. A plain
    * `sum(v).over(partitionBy(k).orderBy(o))` on a low-cardinality `k`
    * is the same single-task scan as the rank case; here each task
    * folds only its range bucket, and bucket START sums (exclusive
    * prefix over per-bucket totals, |part|×buckets rows) are broadcast
    * back and added.
    *
    * Bit-exactness: `valCol` is summed as LONG — integer partial sums
    * are associative/commutative, so the decomposition equals the
    * single-pass window under ANY bucket boundaries. (A double value
    * column would NOT be safe: fold order changes.)
    *
    * Exchange-reuse contract: same as [[bucketize]] — both branches
    * consume the one range exchange. `valCol` is referenced by BOTH
    * branches (bucket totals and the local running sum), and the order
    * columns are partitioning expressions, so column pruning cannot
    * split the canonical subtrees; keep `df` projected to exactly
    * partCols ++ orderCols ++ valCol regardless.
    */
  def runningSummed(
      df: DataFrame,
      partCols: Seq[String],
      orderCols: Seq[Column],
      valCol: String,
      buckets: Int,
      run: String = "run"): DataFrame = {
    val (bucketed, grpPid, byPart) = rangeBucketed(df, partCols, orderCols, buckets)
    val offsets = bucketed
      .groupBy(grpPid: _*)
      .agg(sum(col(valCol).cast("long")).as("__bsum"))
      .withColumn(
        "__off",
        coalesce(
          sum("__bsum").over(byPart.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .drop("__bsum")
    val wLocal = Window.partitionBy(grpPid: _*).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .join(broadcast(offsets), partCols :+ "__pid")
      .withColumn(run, col("__off") + sum(col(valCol).cast("long")).over(wLocal))
      .drop("__pid", "__off")
  }

  /** Multi-column sibling of [[runningSummed]]: all `valCols` running
    * sums in ONE two-phase pass over ONE range exchange.
    *
    * This is not just a convenience: CHAINING two single-column calls
    * is measurably NONDETERMINISTIC (q277 found it) — the second
    * call's offsets branch and window branch each embed the first
    * call's whole subtree, the duplicated range exchanges can sample
    * DIFFERENT boundaries once the subtrees stop canonicalizing
    * identically, and the bucket-local windows then disagree between
    * branches. One pass has exactly the [[runningSummed]] structure
    * (offsets + local window over the SAME bucketed frame), for which
    * the exchange-reuse contract is gate-proven.
    */
  def runningSummedAll(
      df: DataFrame,
      partCols: Seq[String],
      orderCols: Seq[Column],
      valCols: Seq[String],
      buckets: Int,
      runs: Seq[String]): DataFrame = {
    require(valCols.nonEmpty && valCols.size == runs.size,
      s"valCols (${valCols.size}) and runs (${runs.size}) must pair up")
    val (bucketed, grpPid, byPart) = rangeBucketed(df, partCols, orderCols, buckets)
    val aggs = valCols.map(v => sum(col(v).cast("long")).as(s"__bsum_$v"))
    val offsets0 = bucketed
      .groupBy(grpPid: _*)
      .agg(aggs.head, aggs.tail: _*)
    val offsets = valCols.foldLeft(offsets0) { (acc, v) =>
      acc.withColumn(s"__off_$v",
        coalesce(
          sum(s"__bsum_$v").over(
            byPart.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
    }.drop(valCols.map(v => s"__bsum_$v"): _*)
    val wLocal = Window.partitionBy(grpPid: _*).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = bucketed.join(broadcast(offsets), partCols :+ "__pid")
    valCols.zip(runs).foldLeft(joined) { case (acc, (v, run)) =>
      acc.withColumn(run, col(s"__off_$v") + sum(col(v).cast("long")).over(wLocal))
    }.drop("__pid").drop(valCols.map(v => s"__off_$v"): _*)
  }

  /** Two-phase scalable EXCLUSIVE RUNNING MAX of `valCol` within
    * `partCols` under `orderCols` — the prefix-extremum sibling of
    * [[runningSummed]] (same range-bucket shape, max instead of sum;
    * max is associative/commutative on any type, so the decomposition
    * is exact for doubles too, unlike a float running SUM). Exclusive:
    * row i sees the max over rows strictly before it (NULL when none),
    * which is what dominance tests (skyline/Pareto, record-breaking
    * scans) need. Bucket START maxima are the exclusive prefix max over
    * per-bucket totals (|part|×buckets rows), broadcast back and
    * combined with the bucket-local exclusive running max via
    * `greatest` (null-skipping on both legs).
    *
    * Exchange-reuse contract: identical to [[runningSummed]] — keep
    * `df` projected to exactly partCols ++ orderCols ++ valCol.
    */
  def runningMaxed(
      df: DataFrame,
      partCols: Seq[String],
      orderCols: Seq[Column],
      valCol: String,
      buckets: Int,
      run: String = "runmax"): DataFrame = {
    val (bucketed, grpPid, byPart) = rangeBucketed(df, partCols, orderCols, buckets)
    val offsets = bucketed
      .groupBy(grpPid: _*)
      .agg(max(col(valCol)).as("__bmax"))
      .withColumn(
        "__off",
        max("__bmax").over(
          byPart.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)))
      .drop("__bmax")
    val wLocal = Window.partitionBy(grpPid: _*).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed
      .join(broadcast(offsets), partCols :+ "__pid")
      .withColumn(run, greatest(col("__off"), max(col(valCol)).over(wLocal)))
      .drop("__pid", "__off")
  }
}
