package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Exact._

/** Aggregation-surface completion (SURVEY.md §2.2 "Aggregation"):
  * min/max/stddev/variance, collect_list, rollup/cube/grouping sets,
  * approx_count_distinct. All are partial+final hash aggregates — the
  * map-side combine the reference's rank-0-only "combiner"
  * (`program.c:298-311`) never actually was.
  *
  * Scale notes: rollup/cube expand each input row into one row per
  * grouping set *after* partial aggregation (Spark's Expand sits below
  * the shuffle, so the shuffle carries |groups|×|sets| rows, not
  * |input|×|sets|). collect_list is the one operator here with
  * unbounded per-group state — usable only where group cardinality is
  * bounded by construction (here: customers per nation).
  */
object AggQueries extends QueryPack {

  /** Shared by q103/q104/q164 (their comments stress the math must
    * match Spark's Percentile ulp-for-ulp — one copy, not three): the
    * |flags|×|ps| (flag, p) target table with interpolation position
    * pos = p·(n−1) and bracketing 1-based ranks ⌊pos⌋+1 / ⌈pos⌉+1,
    * built from per-flag counts (`l_returnflag`, `n`). */
  private def percentileTargets(stats: org.apache.spark.sql.DataFrame,
                                ps: Seq[Double] = Seq(0.5, 0.9)) =
    stats
      .select(
        col("l_returnflag").as("tf"),
        explode(array(ps.map(lit(_)): _*)).as("p"),
        col("n"))
      .withColumn("pos", col("p") * (col("n") - 1).cast("double"))
      .withColumn("rk_lo", floor(col("pos")) + 1)
      .withColumn("rk_hi", ceil(col("pos")) + 1)

  /** Shared by q103/q104/q164: Percentile.getPercentile's exact blend
    * as a column over (v_lo, v_hi, pos) — v_lo alone when pos is
    * integral (NOT v_lo + frac·Δ, which differs in the last ulp). */
  private def percentileBlend: org.apache.spark.sql.Column =
    when(floor(col("pos")) === ceil(col("pos")), col("v_lo"))
      .otherwise(
        (ceil(col("pos")).cast("double") - col("pos")) * col("v_lo") +
          (col("pos") - floor(col("pos")).cast("double")) * col("v_hi"))

  /** Shared by q103/q104/q164: the value-count rank-hit join — each
    * (flag, p) target matched to the count-table rows whose cumulative
    * range covers its bracketing ranks, reduced to (flag, p, v_lo,
    * v_hi, pos). `cum` carries (l_returnflag, valueCol, cum, prev). */
  private def percentileHits(cum: org.apache.spark.sql.DataFrame,
                             targets: org.apache.spark.sql.DataFrame,
                             valueCol: String) =
    cum
      .join(
        broadcast(targets),
        col("l_returnflag") === col("tf") &&
          ((col("rk_lo") > col("prev") && col("rk_lo") <= col("cum")) ||
            (col("rk_hi") > col("prev") && col("rk_hi") <= col("cum"))))
      .groupBy("l_returnflag", "p")
      .agg(
        min(when(col("rk_lo") > col("prev") && col("rk_lo") <= col("cum"),
          col(valueCol))).as("v_lo"),
        min(when(col("rk_hi") > col("prev") && col("rk_hi") <= col("cum"),
          col(valueCol))).as("v_hi"),
        min("pos").as("pos"))

  /** Shared by q103/q104: Percentile.getPercentile's exact blend —
    * (⌈pos⌉−pos)·v_lo + (pos−⌊pos⌋)·v_hi, v_lo alone when pos is
    * integral (NOT v_lo + frac·Δ, which differs in the last ulp) —
    * over grouped (l_returnflag, p, v_lo, v_hi, pos), pivoted to
    * p50/p90 per flag. */
  private def percentileBlendPivot(grouped: org.apache.spark.sql.DataFrame) =
    grouped
      .withColumn("pct", percentileBlend)
      .groupBy("l_returnflag")
      .agg(
        min(when(col("p") === 0.5, col("pct"))).as("p50"),
        min(when(col("p") === 0.9, col("pct"))).as("p90"))
      .orderBy("l_returnflag")

  override val queries: Map[String, Q] = Map(
    // MIN/MAX/STDDEV/VARIANCE over groups.
    "q29_stats" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_linestatus")
        .agg(
          min("l_quantity").as("min_qty"),
          max("l_quantity").as("max_qty"),
          // round(…, 9): moment merges are evaluation-order dependent
          // (partial-aggregate arrival order is nondeterministic even
          // run-to-run within Spark), so raw stddev/var can differ in
          // the final ulp from any oracle. 9 decimals is far above ulp
          // noise and far below the statistic's meaningful precision.
          round(stddev_samp(col("l_quantity")), 9).as("sd_qty"),
          round(var_samp(col("l_quantity")), 9).as("var_qty"))
        .orderBy("l_linestatus")),

    // collect_list + array_sort; joined to a string so the compare is
    // hash-stable (array columns round-trip differently through
    // parquet/pandas than through DuckDB's native lists).
    "q30_collect_list" -> ((s, dir) =>
      Tables.customer(s, dir)
        .groupBy("c_nationkey")
        .agg(
          array_join(array_sort(collect_list(col("c_mktsegment"))), ",").as("segs"),
          size(collect_set(col("c_mktsegment"))).as("n_distinct_segs"))
        .orderBy("c_nationkey")),

    // ROLLUP: (flag, status), (flag), () — grand total included.
    "q31_rollup" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .rollup("l_returnflag", "l_linestatus")
        // grouping_id() is only resolvable inside the agg of the
        // rollup/cube itself, not in a later select.
        .agg(grouping_id().cast("long").as("gid"),
          sum("l_quantity").as("sum_qty"), count(lit(1)).as("n"))
        .select(
          col("gid"),
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("sum_qty"), col("n"))
        .orderBy("gid", "rf", "ls")),

    // CUBE over orders dims with an exact money sum.
    "q32_cube" -> ((s, dir) =>
      Tables.orders(s, dir)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("rev"))
        .select(
          col("gid"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
          col("n"), col("rev"))
        .orderBy("gid", "st", "prio")),

    // GROUPING SETS via the SQL surface (the DataFrame API exposes only
    // rollup/cube; arbitrary sets are a SQL-level feature in Spark).
    "q33_grouping_sets" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("li_gsets")
      s.sql(
        """SELECT CAST(grouping_id() AS BIGINT) AS gid,
          |  coalesce(l_returnflag, 'ALL') AS rf,
          |  coalesce(l_linestatus, 'ALL') AS ls,
          |  sum(l_quantity) AS sum_qty
          |FROM li_gsets
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY gid, rf, ls""".stripMargin)
    }),

    // Pivot (SURVEY.md §2.1 S19: the reference's text-parse → pivot-to-
    // matrix step, `program.c:447-464`, as the relational operator).
    // Explicit pivot values keep the output schema static — the
    // scale-safe form (value discovery would need an extra pass).
    "q66_pivot" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum("l_quantity"))
        .withColumnsRenamed(Map("F" -> "qty_f", "O" -> "qty_o"))
        .na.fill(0.0, Seq("qty_f", "qty_o"))
        .orderBy("l_returnflag")),

    // q242: ORACLE-REPLAYABLE HYPERLOGLOG — the from-scratch register
    // HLL that closes the q34/q96 rows-only gap: md5-derived 60-bit
    // hashes, bucket = low 8 bits (m = 256), rho = leading-zero rank
    // of the 52-bit substream via BINARY-STRING length (the q236
    // no-float-log2 trick), registers max-merged in one map-side-
    // combinable aggregate. The harmonic sum Σ 2^{−rho} is kept EXACT
    // as the BIGINT Σ 2^{53−rho} (≤ 2^61), the small-range linear-
    // counting branch (raw ≤ 2.5 m with empty registers — active at
    // every harness SF) uses m·ln(m/zeros), and the final estimate is
    // half-up 1e-9 quantized (q101 ln class). Unlike q34/q96, every
    // bit replays in DuckDB — the estimator itself is under the hash
    // gate, not just property-tested. Scale: one corpus pass into 256
    // registers; n_exact rides along as the accuracy reference (its
    // count-distinct is the expensive half — the sketch is the cheap
    // one).
    "q242_hll_replayable" -> ((s, dir) => {
      val alpha = 0.7213 / (1 + 1.079 / 256)
      val h = conv(substring(md5(concat(lit("hll:"),
        col("l_partkey").cast("string"))), 1, 15), 16, 10).cast("long")
      // Two deliberate scans (registers; exact reference) — cheaper at
      // scale than checkpointing a corpus-sized hash stream, and the
      // md5 is only computed on the register pass.
      val li = Tables.lineitem(s, dir).select(col("l_partkey"))
      val rho = li.select(h.as("h"))
        .select(pmod(col("h"), lit(256L)).as("bucket"),
          expr("shiftright(h, 8)").as("v"))
        .select(col("bucket"),
          when(col("v") === 0L, lit(53L))
            .otherwise(lit(53L) - length(bin(col("v")))).as("rho"))
        .groupBy("bucket").agg(max("rho").as("rho"))
      val regs = broadcast(s.range(0, 256).select(col("id").as("bucket")))
        .join(rho, Seq("bucket"), "left")
        .select(coalesce(col("rho"), lit(0L)).as("rho"))
      val agg = regs.agg(
        sum(expr("shiftleft(1L, cast(53 - rho as int))")).as("s53"),
        sum(when(col("rho") === 0L, 1L).otherwise(0L)).as("zeros"))
      val nExact = broadcast(li.agg(
        countDistinct(col("l_partkey")).as("n_exact")))
      val raw = lit(alpha) * lit(65536.0) * lit(9007199254740992.0) /
        col("s53").cast("double")
      val est = when(raw <= lit(640.0) && col("zeros") > 0L,
        lit(256.0) * log(lit(256.0) / col("zeros").cast("double")))
        .otherwise(raw)
      agg.crossJoin(nExact)
        .select(lit(256L).as("m"), col("s53"), col("zeros"),
          floor(est * 1e9 + 0.5).cast("long").as("est9"), col("n_exact"))
    }),

    // q261: BLOOM FILTER BUILD + FPR AUDIT — the membership sketch
    // built FROM SCRATCH under the hash gate (q116 uses Spark's
    // runtime bloom inside a join; this one materializes the filter
    // as 265 OR-aggregated 62-bit words (bit index pos mod 62 keeps
    // every shift <= 61 — BIGINT << 63 faults under checked math) and measures it): m = 16384
    // bits, k = 7 md5-derived positions per key, inserted set = even
    // part keys, probe set = odd part keys (disjoint by construction,
    // so every probe hit is a false positive). The observed FPR is
    // exact integer counting; the theoretical (1 − e^{−kn/m})^k is
    // one double dag with the power as an explicit 7-fold product and
    // the result 1e-9 quantized (exp is the q101 ln class — the 3-SF
    // sweep is the proof). Scale: k× constant fanout map-side, one
    // 256-word OR aggregate, probes join the broadcast word table.
    "q261_bloom_fpr" -> ((s, dir) => {
      val keys = Tables.part(s, dir).select(col("p_partkey"))
      // One shared hash family for insert AND probe — sharing the salt
      // is load-bearing for the membership test (a per-side salt would
      // silently break it), so the helper takes no side parameter.
      def positions = (0 until 7).map(j =>
        pmod(conv(substring(md5(concat(lit(s"bf$j:"),
          col("p_partkey").cast("string"))), 1, 15), 16, 10).cast("long"),
          lit(16384L)).as(s"pos$j"))
      val ins = keys.filter(col("p_partkey") % 2 === 0)
      val nIns = broadcast(ins.agg(count(lit(1)).as("n_ins")))
      val words = ins.select(positions: _*)
        .select(explode(array((0 until 7).map(j => col(s"pos$j")): _*))
          .as("pos"))
        .select(expr("pos div 62").as("word"),
          expr("shiftleft(1L, cast(pos % 62 as int))").as("mask"))
        .groupBy("word").agg(expr("bit_or(mask)").as("bits"))
      val probes = keys.filter(col("p_partkey") % 2 === 1)
        .select(col("p_partkey"), posexplode(array(
          (0 until 7).map(j => positions(j)): _*)).as(Seq("j", "pos")))
        .select(col("p_partkey"), expr("pos div 62").as("word"),
          expr("cast(pos % 62 as int)").as("bit"))
        .join(broadcast(words), Seq("word"), "left")
        .select(col("p_partkey"),
          coalesce(expr("(bits >> bit) & 1"), lit(0L)).as("hit"))
        .groupBy("p_partkey").agg(min("hit").as("all_set"))
        .agg(count(lit(1)).as("n_probes"), sum("all_set").as("n_false_pos"))
      val kD = lit(7.0)
      val mD = lit(16384.0)
      val pTheory = {
        val x = lit(1.0) - exp(lit(-1.0) * kD * col("n_ins").cast("double") / mD)
        x * x * x * x * x * x * x
      }
      probes.crossJoin(nIns)
        .select(lit(16384L).as("m"), lit(7L).as("k"), col("n_ins"),
          col("n_probes"), col("n_false_pos"),
          floor(col("n_false_pos").cast("double") /
            col("n_probes").cast("double") * 1e9 + 0.5).cast("long")
            .as("fpr_obs9"),
          floor(pTheory * 1e9 + 0.5).cast("long").as("fpr_theory9"))
    }),

    // q257: KMV (THETA-SKETCH) SET INTERSECTION — the sketch-family
    // member HLL cannot provide: |A ∩ B| without exact distinct, via
    // the k-minimum-values estimator (k = 256 smallest md5 hashes of
    // the union define θ; members below θ present in BOTH sets scale
    // by 1/θ). Every ingredient replays in DuckDB: md5 60-bit hashes,
    // the k-th order statistic via TakeOrdered (per-partition top-k,
    // no global sort), one double dag for the estimate, 1e-9
    // quantized. The exact intersection rides along as the accuracy
    // reference (the expensive path the sketch replaces — at 100 TB
    // the sketch needs one pass + a 256-row exchange per set). Sets:
    // view-active vs purchase-active user-days.
    "q257_kmv_intersection" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .filter(col("event_type").isin("view", "purchase"))
        // 100000L multiplier: day index fits 0..99999 (~273 years past
        // the 2024-01-01 fixture epoch), so (user_id, day) pairs can't
        // alias; the old *100 packing would collide for calendars >100
        // days (round-10 advice). Oracle mirrors the same literal.
        .select(col("event_type").as("t"),
          (col("user_id") * 100000L +
            datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")))
            .as("key"))
        .distinct()
        .select(col("t"),
          conv(substring(md5(concat(lit("kmv:"), col("key").cast("string"))),
            1, 15), 16, 10).cast("long").as("h"))
        .localCheckpoint(false) // feeds union top-k, both-sets, exact
      val hk = broadcast(ev.select("h").distinct()
        .orderBy("h").limit(256)
        .agg(max("h").as("hk"), count(lit(1)).as("k")))
      val nBoth = ev.groupBy("h")
        .agg(countDistinct("t").as("nt"))
        .crossJoin(hk)
        .filter(col("h") <= col("hk") && col("nt") === 2)
        .agg(count(lit(1)).as("n_both"))
      val exact = ev.groupBy("h").agg(countDistinct("t").as("nt"))
        .filter(col("nt") === 2).agg(count(lit(1)).as("n_exact_inter"))
      // est = n_both / θ with θ = hk/2^60 (uniform-hash inclusion
      // probability), rounded half-up to a count.
      val est = col("n_both").cast("double") *
        lit(1152921504606846976.0) / col("hk").cast("double")
      nBoth.crossJoin(hk).crossJoin(broadcast(exact))
        .select(col("k"), col("hk"), col("n_both"),
          floor(est + 0.5).cast("long").as("est_inter"),
          col("n_exact_inter"))
    }),

    // q244: SLIDING-WINDOW DISTINCT USERS VIA HLL REGISTER ROLLUP —
    // the operator that makes 7-day rolling DAU affordable at 100 TB:
    // per-(day, bucket) q242-style registers (one corpus pass), then
    // the sliding union is a RANGE-window max over the calendar×256
    // register grid — max-merge is lossless, so day d's estimate
    // equals a from-scratch sketch of the union (the q96 property,
    // here fully oracle-replayed). The exact 7-day distinct (q138's
    // shape — a 7× explode + distinct per window) rides along as the
    // accuracy reference and is the expensive path this query exists
    // to replace. Same est dag as q242 (exact BIGINT harmonic mass,
    // linear-counting branch, 1e-9 quantized).
    "q244_hll_sliding_dau" -> ((s, dir) => {
      val alpha = 0.7213 / (1 + 1.079 / 256)
      val ev = Tables.events(s, dir).select(
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
          .as("day"),
        col("user_id"))
      val h = conv(substring(md5(concat(lit("hll:"),
        col("user_id").cast("string"))), 1, 15), 16, 10).cast("long")
      val dayReg = ev.select(col("day"), h.as("h"))
        .select(col("day"), pmod(col("h"), lit(256L)).as("bucket"),
          expr("shiftright(h, 8)").as("v"))
        .select(col("day"), col("bucket"),
          when(col("v") === 0L, lit(53L))
            .otherwise(lit(53L) - length(bin(col("v")))).as("rho"))
        .groupBy("day", "bucket").agg(max("rho").as("rho"))
      val days = ev.select("day").distinct()
      val grid = broadcast(days)
        .join(broadcast(s.range(0, 256).select(col("id").as("bucket"))),
          lit(true))
        .join(dayReg, Seq("day", "bucket"), "left")
        .select(col("day"), col("bucket"),
          coalesce(col("rho"), lit(0L)).as("rho"))
      val slid = grid
        .withColumn("rho7", max("rho").over(Window.partitionBy("bucket")
          .orderBy("day").rangeBetween(-6, 0)))
      val perDay = slid.groupBy("day").agg(
        sum(expr("shiftleft(1L, cast(53 - rho7 as int))")).as("s53"),
        sum(when(col("rho7") === 0L, 1L).otherwise(0L)).as("zeros"))
      // Each active (day, user) contributes to windows day..day+6;
      // phantom wdays past the calendar drop in the inner join below.
      val exact7 = ev.distinct()
        .select(explode(sequence(col("day"), col("day") + 6)).as("day"),
          col("user_id"))
        .groupBy("day").agg(countDistinct("user_id").as("n_exact7"))
      val raw = lit(alpha) * lit(65536.0) * lit(9007199254740992.0) /
        col("s53").cast("double")
      val est = when(raw <= lit(640.0) && col("zeros") > 0L,
        lit(256.0) * log(lit(256.0) / col("zeros").cast("double")))
        .otherwise(raw)
      perDay.join(exact7, "day")
        .select(col("day"), col("s53"), col("zeros"),
          floor(est * 1e9 + 0.5).cast("long").as("est9"), col("n_exact7"))
        .orderBy("day")
    }),

    // approx_count_distinct (HLL++): no SQL oracle — sketches are
    // engine-specific (driver records rows-only; accuracy is property-
    // tested in AggSpec against exact counts).
    "q34_approx_count_distinct" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
        .orderBy("l_returnflag")),

    // Mergeable-sketch rollup (Datasketches HLL): per-month sketches of
    // the customer id, UNIONED into one corpus-wide estimate — the
    // shape a 100 TB distinct-count rollup actually ships (pre-agg a
    // sketch per partition/day, merge downstream; raw re-scan never
    // happens twice). Sketch-register union is lossless, so the merged
    // estimate equals the single global sketch's exactly (AggSpec
    // property). No SQL oracle — sketch bytes are engine-specific
    // (driver records rows-only).
    "q96_hll_union" -> ((s, dir) => {
      val perMonth = Tables.orders(s, dir)
        .groupBy(date_trunc("month", col("o_orderdate")).as("mon"))
        .agg(hll_sketch_agg(col("o_custkey")).as("sk"),
          count(lit(1)).as("n_rows"))
      perMonth.agg(
        hll_sketch_estimate(hll_union_agg(col("sk")))
          .as("approx_distinct_custkeys"),
        sum("n_rows").as("n_orders"))
    }),

    // COUNT-MIN frequency sketch — the mergeable approximate-frequency
    // member of the sketch family (next to HLL distinct q34/q96 and
    // the percentile sketch q88), built fully ORACLE-REPLAYABLE: cell
    // hashing is md5-nibble arithmetic (identical in both engines)
    // instead of engine-private xxhash. One pass: every token
    // increments one cell per hash row (d=4, w=64); the sketch is a
    // 256-cell table mergeable by cell-wise sum (AggSpec property).
    // Estimates = min over the d cells — ≥ truth by construction,
    // verified here against the exact counts of the 20 most frequent
    // tokens. Scale: the sketch aggregate partial-aggregates map-side
    // to ≤ d·w rows per task no matter the corpus size.
    "q117_countmin_freq" -> ((s, dir) => {
      import graft.ops.Sketch
      val toks = Tables.documents(s, dir)
        .select(explode(graft.ops.Text.tokens(col("text"))).as("token"))
      val sketch = Sketch.cmSketch(toks, "token", d = 4, w = 64)
      val truth = toks.groupBy("token").agg(count(lit(1)).as("true_cnt"))
      val probes = truth.orderBy(col("true_cnt").desc, col("token").asc).limit(20)
      Sketch.cmEstimate(probes, sketch, "token", d = 4, w = 64)
        .select("token", "true_cnt", "cm_est")
        .orderBy(col("true_cnt").desc, col("token").asc)
    }),

    // UNPIVOT (melt): wide columns → (metric, value) rows — the inverse
    // of q66's pivot. Narrow, no shuffle until the final sort.
    "q72_unpivot" -> ((s, dir) =>
      Tables.nation(s, dir)
        .unpivot(
          Array(col("n_name")),
          Array(col("n_nationkey"), col("n_regionkey")),
          "metric", "value")
        .orderBy("n_name", "metric")),

    // Exact interpolated percentiles per group. Spark's percentile() is a
    // sort-based aggregate that buffers EVERY value of the group in one
    // task — fine for bounded groups, a single-task memory cliff on a
    // 3-value key at 100×. Kept as the literal built-in surface; the
    // scale paths are q88 (sketch) and q103 (two-pass exact, same bits).
    "q77_percentile_demo_bounded" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.5D)").as("p50"),
          expr("percentile(l_quantity, 0.9D)").as("p90"))
        .orderBy("l_returnflag")),

    // Two-pass EXACT percentile without per-group value buffering (the
    // q77 100 TB fix). Pass 1: ops/ScalableRank range-buckets lineitem
    // on (flag, quantity) and counts each bucket — every sort bounded
    // at rows/buckets, per-flag counts n for free. Pass 2: the
    // interpolation positions pos = p·(n−1) reduce each percentile to
    // TWO order statistics (ranks ⌊pos⌋+1 / ⌈pos⌉+1); the tiny offsets
    // table locates which bucket holds each target rank, so only THOSE
    // buckets' rows (≤ 4 buckets of rows/32 each, regardless of data
    // size) are semi-joined in, locally ranked, and probed — the other
    // 28+ buckets are never sorted at all. Values then blend exactly as
    // Spark's Percentile.getPercentile does: (⌈pos⌉−pos)·v_lo +
    // (pos−⌊pos⌋)·v_hi (NOT v_lo + frac·Δ — the two differ in the last
    // ulp). ScalableRankSpec asserts bit-equality with q77's built-in.
    "q103_percentile_2pass" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select("l_returnflag", "l_quantity", "l_orderkey", "l_linenumber")
      val orderCols =
        Seq(col("l_quantity").asc, col("l_orderkey").asc, col("l_linenumber").asc)
      val (bucketed, offsets, stats) = graft.ops.ScalableRank.bucketize(
        li, partCols = Seq("l_returnflag"), orderCols = orderCols, buckets = 32)
      // 6 rows: (flag, p) with interpolation position + bracketing ranks.
      val targets = percentileTargets(stats)
      // ≤ 12 rows: one per needed order statistic, located to its range
      // bucket via the offsets table (rank rk lives in the bucket where
      // __off < rk ≤ __off + __cnt).
      val wanted = targets
        .withColumn("rk", explode(array(col("rk_lo"), col("rk_hi"))))
        .join(
          offsets,
          col("tf") === col("l_returnflag") &&
            col("rk") > col("__off") && col("rk") <= col("__off") + col("__cnt"))
      val neededBuckets =
        wanted.select("l_returnflag", "__pid", "__off").distinct()
      // Only the located buckets' rows are ranked: the inner broadcast
      // join drops every other bucket before any sort happens.
      val wLocal = org.apache.spark.sql.expressions.Window
        .partitionBy("l_returnflag", "__pid").orderBy(orderCols: _*)
      val ranked = bucketed
        .join(broadcast(neededBuckets), Seq("l_returnflag", "__pid"))
        .withColumn("rn", col("__off") + row_number().over(wLocal))
      val hits = ranked.join(
        broadcast(targets),
        col("l_returnflag") === col("tf") &&
          (col("rn") === col("rk_lo") || col("rn") === col("rk_hi")))
      percentileBlendPivot(hits
        .groupBy("l_returnflag", "p")
        .agg(
          min(when(col("rn") === col("rk_lo"), col("l_quantity"))).as("v_lo"),
          min(when(col("rn") === col("rk_hi"), col("l_quantity"))).as("v_hi"),
          min("pos").as("pos")))
    }),

    // Value-count exact percentile — the third point in the percentile
    // design space (q77 buffers whole groups: dies at scale; q103
    // shuffles the full table once: general but pays row-count shuffle
    // volume). For DISCRETE/quantized value domains, aggregate
    // (group, value) counts first: map-side partial aggregation means
    // the shuffle carries |groups|×|distinct values| rows (3×50 here)
    // no matter how many input rows exist, and every later step runs on
    // that tiny table — cumulative counts locate the two bracketing
    // order statistics as the values whose count interval
    // (prev_cum, cum] contains the target rank. Scale contract: distinct
    // values per group must fit one task (true for integer quantities,
    // star ratings, cents-quantized prices…); for unbounded continuous
    // domains use q103. Same blend as Spark's Percentile — bit-exact.
    "q104_percentile_counts" -> ((s, dir) => {
      val vc = Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_quantity")
        .agg(count(lit(1)).as("cnt"))
      val wCum = org.apache.spark.sql.expressions.Window
        .partitionBy("l_returnflag").orderBy("l_quantity")
      val cum = vc
        .withColumn("cum", sum("cnt").over(wCum))
        .withColumn("prev", col("cum") - col("cnt"))
      val targets = percentileTargets(
        vc.groupBy("l_returnflag").agg(sum("cnt").as("n")))
      percentileBlendPivot(percentileHits(cum, targets, "l_quantity"))
    }),

    // Scalable MODE (most frequent value per group) — q104's value-count
    // shape: (group, value) counts partial-aggregate map-side, then one
    // struct-max per group picks (highest count, then SMALLEST value —
    // the negated-value field makes the lexicographic struct max a
    // deterministic tie-break; DuckDB's native mode() leaves ties
    // unspecified, so the oracle replays the same rule). Every step is
    // an algebraic aggregate: no sort, no window, no per-group buffer.
    "q108_mode" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_quantity")
        .agg(count(lit(1)).as("cnt"))
        .groupBy("l_returnflag")
        .agg(max(struct(col("cnt"), (-col("l_quantity")).as("nv"))).as("m"))
        .select(
          col("l_returnflag"),
          (-col("m.nv")).as("mode_qty"),
          col("m.cnt").as("n_mode"))
        .orderBy("l_returnflag")),

    // Median absolute deviation (robust center + spread) from VALUE
    // COUNTS — q104's discrete-domain shape applied twice: the median
    // of a ≤50-value domain comes from per-(flag, value) counts (an
    // algebraic aggregate; the windows below run over the tiny count
    // table, never the fact table), then deviations |q − med| re-count
    // into a second ≤100-value domain whose median is the MAD. All
    // arithmetic stays integer by doubling units twice: med2 = lo+hi
    // (half-units), d2 = |2q − med2| (half-units), mad4 = lo₂+hi₂
    // (quarter-units); the two final divisions are exact dyadic
    // (÷2.0, ÷4.0), so both engines' doubles are bit-identical with
    // DuckDB's interpolating median() on the raw values.
    "q160_mad" -> ((s, dir) => {
      val wCum = org.apache.spark.sql.expressions.Window
        .partitionBy("l_returnflag").orderBy("q")
      // Doubled-unit interpolated median of a (flag, q, cnt) count
      // table: v(rk_lo) + v(rk_hi) where the 1-based central ranks are
      // (n+1) div 2 and n div 2 + 1 (equal when n is odd).
      def med2(vc: org.apache.spark.sql.DataFrame, out: String) = {
        val n = vc.groupBy("l_returnflag").agg(sum("cnt").as("n"))
          .select(col("l_returnflag").as("tf"),
            expr("(n + 1) div 2").as("rk_lo"), expr("n div 2 + 1").as("rk_hi"))
        vc.withColumn("cum", sum("cnt").over(wCum))
          .withColumn("prev", col("cum") - col("cnt"))
          .join(broadcast(n), col("l_returnflag") === col("tf"))
          .groupBy("l_returnflag")
          .agg((min(when(col("rk_lo") > col("prev") && col("rk_lo") <= col("cum"),
            col("q"))) +
            min(when(col("rk_hi") > col("prev") && col("rk_hi") <= col("cum"),
              col("q")))).as(out))
      }
      val vc = Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_quantity").cast("long").as("q"))
        .agg(count(lit(1)).as("cnt"))
      val m = med2(vc, "m2")
      val dvc = vc
        .join(m.select(col("l_returnflag").as("mf"), col("m2")),
          col("l_returnflag") === col("mf"))
        .groupBy(col("l_returnflag"),
          abs(lit(2) * col("q") - col("m2")).as("q"))
        .agg(sum("cnt").as("cnt"))
      m.join(med2(dvc, "mad4"), "l_returnflag")
        .select(col("l_returnflag"),
          (col("m2").cast("double") / lit(2.0)).as("med"),
          (col("mad4").cast("double") / lit(4.0)).as("mad"))
        .orderBy("l_returnflag")
    }),

    // Winsorized mean — the outlier-clipping aggregate of a feature
    // pipeline: values clamped to the group's [p10, p90] before the
    // mean. Bounds come from the q104 value-count percentile shape
    // (windows over the ≤|flags|×50 count table only, exact
    // Percentile-blend doubles); the CLIPPED SUM is where bit-exactness
    // would die — p10/p90 are non-dyadic interpolations repeated per
    // row, so both the bound and each value quantize to integer 1e-9
    // units BEFORE the clamp, making the sum an order-independent
    // BIGINT. One IEEE division pair at the end.
    "q164_winsorized_mean" -> ((s, dir) => {
      val vc = Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_quantity")
        .agg(count(lit(1)).as("cnt"))
      val targets = percentileTargets(
        vc.groupBy("l_returnflag").agg(sum("cnt").as("n")), Seq(0.1, 0.9))
      val wCum = org.apache.spark.sql.expressions.Window
        .partitionBy("l_returnflag").orderBy("l_quantity")
      val cum = vc
        .withColumn("cum", sum("cnt").over(wCum))
        .withColumn("prev", col("cum") - col("cnt"))
      val bounds = percentileHits(cum, targets, "l_quantity")
        .withColumn("pct", percentileBlend)
        .groupBy(col("l_returnflag").as("bf"))
        .agg(
          floor(min(when(col("p") === 0.1, col("pct"))) * lit(1e9) + lit(0.5))
            .cast("long").as("lo9"),
          floor(min(when(col("p") === 0.9, col("pct"))) * lit(1e9) + lit(0.5))
            .cast("long").as("hi9"))
      Tables.lineitem(s, dir)
        .join(broadcast(bounds), col("l_returnflag") === col("bf"))
        .select(col("l_returnflag"),
          greatest(col("lo9"),
            least(col("hi9"),
              (col("l_quantity") * lit(1e9)).cast("long"))).as("c9"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum("c9").as("s9"))
        .select(col("l_returnflag"), col("n"), col("s9"),
          (col("s9").cast("double") / col("n") / lit(1e9)).as("wmean"))
        .orderBy("l_returnflag")
    }),

    // approx_percentile (t-digest-style sketch): the unbounded-group
    // companion to q77's exact sort-based percentile. Engine-specific
    // sketch → rows-only driver check; AggSpec bounds its error
    // against the exact percentile.
    "q88_approx_percentile" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          expr("approx_percentile(l_quantity, 0.5D, 1000)").as("ap50"),
          expr("approx_percentile(l_quantity, 0.9D, 1000)").as("ap90"))
        .orderBy("l_returnflag")),

    // Two-phase salted aggregation (ops/Skew): the hot-key spread the
    // 100 TB brief mandates, checked for exactness against the plain
    // one-shuffle GROUP BY oracle. Salt source = (orderkey, linenumber)
    // — deterministic row content, so stage retries re-salt
    // identically. Cents quantization keeps the re-ordered partial
    // sums bit-exact.
    "q83_salted_agg" -> ((s, dir) =>
      graft.ops.Skew.saltedAggregate(
        Tables.lineitem(s, dir)
          .select("l_returnflag", "l_quantity", "l_orderkey", "l_linenumber"),
        key = col("l_returnflag"),
        salts = 8,
        partial = Seq(sum(cents(col("l_quantity"))).as("pc"),
          count(lit(1)).as("pn")),
        finalAgg = Seq((sum(col("pc")) / lit(100.0)).as("sum_qty"),
          sum(col("pn")).as("n_rows")),
        saltOn = Some(struct(col("l_orderkey"), col("l_linenumber"))))
        .orderBy("key")),

    // Equi-DEPTH histogram (quantile binning) — q145's equi-width
    // sibling: per flag, quartile bin edges are the TYPE-1 order
    // statistics (smallest value whose cumulative count reaches
    // ⌈k·n/4⌉ — pure integer rank math, no interpolation, no IEEE
    // anywhere in this query), computed from q104's value-count shape:
    // the (flag, value) count table is |flags|×|values| rows no matter
    // how many input rows exist, its cumulative window runs over that
    // aggregated table (bounded by the discrete-domain contract), and
    // the per-row bin assignment is a |flags|-row broadcast of the
    // three edges — the fact table never shuffles until the final
    // (flag, bin) aggregation. Bins are (−∞,e1], (e1,e2], (e2,e3],
    // (e3,∞); depths are near-equal up to value ties (exact depths are
    // impossible when one value straddles a quartile boundary — the
    // per-bin min/max prove the value ranges partition the domain).
    "q182_equidepth_bins" -> ((s, dir) => {
      val vc = Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_quantity")
        .agg(count(lit(1)).as("cnt"))
      val wCum = org.apache.spark.sql.expressions.Window
        .partitionBy("l_returnflag").orderBy("l_quantity")
      val cum = vc.withColumn("cum", sum("cnt").over(wCum))
      val targets = vc.groupBy("l_returnflag").agg(sum("cnt").as("n"))
        .select(col("l_returnflag").as("tf"),
          explode(array(lit(1), lit(2), lit(3))).as("k"), col("n"))
        .withColumn("rk", expr("(k * n + 3) div 4"))
      val edges = cum.join(broadcast(targets),
          col("l_returnflag") === col("tf") && col("cum") >= col("rk"))
        .groupBy("l_returnflag", "k").agg(min("l_quantity").as("edge"))
        .groupBy("l_returnflag").agg(
          min(when(col("k") === 1, col("edge"))).as("e1"),
          min(when(col("k") === 2, col("edge"))).as("e2"),
          min(when(col("k") === 3, col("edge"))).as("e3"))
      Tables.lineitem(s, dir).join(broadcast(edges), "l_returnflag")
        .withColumn("bin",
          when(col("l_quantity") <= col("e1"), 0L)
            .when(col("l_quantity") <= col("e2"), 1L)
            .when(col("l_quantity") <= col("e3"), 2L).otherwise(3L))
        .groupBy("l_returnflag", "bin")
        .agg(count(lit(1)).as("n_rows"),
          min("l_quantity").as("v_min"), max("l_quantity").as("v_max"))
        .orderBy("l_returnflag", "bin")
    }),

    // OHLC downsampling — the time-series resample every metrics store
    // runs: per (event type, hour), open/high/low/close/volume of the
    // value stream. Open and close are NOT min/max of value — they are
    // the value AT the earliest/latest row — picked by lexicographic
    // struct min/max over (ts, event_id, value): a plain algebraic
    // aggregate (mergeable map-side, no window, no per-group buffer),
    // with event_id making ties deterministic. The oracle replays the
    // same rule with row_number windows — different machinery, same
    // rows, proving the struct-extremum trick exact.
    "q191_ohlc_bars" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"), date_trunc("hour", col("ts")).as("hr"),
          col("ts"), col("event_id"), col("value"))
        .groupBy("event_type", "hr")
        .agg(
          min(struct(col("ts"), col("event_id"), col("value"))).as("o"),
          max(struct(col("ts"), col("event_id"), col("value"))).as("c"),
          max("value").as("high"), min("value").as("low"),
          count(lit(1)).as("volume"))
        .select(col("event_type"), col("hr"),
          col("o.value").as("open"), col("high"), col("low"),
          col("c.value").as("close"), col("volume"))
        .orderBy("event_type", "hr"))
,
    // WEIGHTED median — the revenue-weighted center ("the quantity at
    // which half the money sits") — q104's value-count shape with a
    // weight sum instead of a row count: per (flag, value) the weights
    // partial-aggregate map-side, the cumulative window runs over the
    // aggregated ≤|values|-per-flag table, and the lower weighted
    // median is the smallest value whose cumulative weight reaches
    // ⌈W/2⌉. Pure integer arithmetic end to end (weights are cents);
    // no interpolation ambiguity, no IEEE ops.
    "q193_weighted_median" -> ((s, dir) => {
      val vc = Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_quantity")
        .agg(sum(cents(col("l_extendedprice"))).as("w"))
      val wCum = org.apache.spark.sql.expressions.Window
        .partitionBy("l_returnflag").orderBy("l_quantity")
      val cum = vc.withColumn("cum", sum("w").over(wCum))
      val targets = vc.groupBy("l_returnflag").agg(sum("w").as("tw"))
        .select(col("l_returnflag").as("tf"),
          col("tw"), expr("(tw + 1) div 2").as("half"))
      cum.join(broadcast(targets),
          col("l_returnflag") === col("tf") && col("cum") >= col("half"))
        .groupBy("l_returnflag")
        .agg(min("l_quantity").as("w_median"),
          min("tw").as("total_weight_cents"))
        .orderBy("l_returnflag")
    })
  )

  /** Oracle-side twin of [[percentileTargets]] (one copy for both
    * q103/q104 oracles): p cast to DOUBLE up front — a bare 0.5 is
    * DECIMAL in DuckDB, which would compute pos in decimal and round
    * differently. */
  private val percentileTargetsSql: String =
    """targets AS (
      |  SELECT l_returnflag AS tf, p,
      |    p * CAST(n - 1 AS DOUBLE) AS pos,
      |    CAST(floor(p * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1 AS rk_lo,
      |    CAST(ceil(p * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1 AS rk_hi
      |  FROM (SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag),
      |       (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE)]) AS p))""".stripMargin

  /** Oracle-side twin of [[percentileBlendPivot]]: consumes a `hits`
    * CTE with (l_returnflag, p, v_lo, v_hi, pos), same operand order as
    * the Spark side. */
  private val percentileBlendPivotSql: String =
    """interp AS (
      |  SELECT l_returnflag, p,
      |    CASE WHEN floor(pos) = ceil(pos) THEN v_lo
      |         ELSE (ceil(pos) - pos) * v_lo + (pos - floor(pos)) * v_hi
      |    END AS pct
      |  FROM hits)
      |SELECT l_returnflag,
      |  min(CASE WHEN p = 0.5 THEN pct END) AS p50,
      |  min(CASE WHEN p = 0.9 THEN pct END) AS p90
      |FROM interp GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  override val oracles: Map[String, String] = Map(

    // bloom: same md5 positions, OR-word build, probe AND, and
    // 7-fold-product theory dag.
    "q261_bloom_fpr" -> {
      val posList = (0 until 7).map(j =>
        s"CAST(('0x' || substring(md5('bf$j:' || CAST(p_partkey AS VARCHAR)), " +
          s"1, 15)) AS BIGINT) % 16384").mkString("[", ", ", "]")
      s"""WITH ins AS (SELECT p_partkey FROM part WHERE p_partkey % 2 = 0),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n_ins FROM ins),
         |ipos AS (SELECT unnest($posList) AS pos FROM ins),
         |words AS (SELECT pos // 62 AS word,
         |    bit_or(CAST(1 AS BIGINT) << CAST(pos % 62 AS INTEGER)) AS bits
         |  FROM ipos GROUP BY 1),
         |pr AS (SELECT p_partkey, unnest($posList) AS pos FROM part
         |  WHERE p_partkey % 2 = 1),
         |hits AS (SELECT pr.p_partkey,
         |    coalesce((bits >> CAST(pos % 62 AS INTEGER)) & 1, 0) AS hit
         |  FROM pr LEFT JOIN words ON pos // 62 = words.word),
         |ag AS (SELECT CAST(count(*) AS BIGINT) AS n_probes,
         |    CAST(sum(all_set) AS BIGINT) AS n_false_pos
         |  FROM (SELECT p_partkey, min(hit) AS all_set FROM hits
         |    GROUP BY p_partkey)),
         |t AS (SELECT n_ins, n_probes, n_false_pos,
         |    1.0 - exp(-1.0 * 7.0 * CAST(n_ins AS DOUBLE) / 16384.0) AS x
         |  FROM ag, n)
         |SELECT CAST(16384 AS BIGINT) AS m, CAST(7 AS BIGINT) AS k,
         |  n_ins, n_probes, n_false_pos,
         |  CAST(floor(CAST(n_false_pos AS DOUBLE) /
         |    CAST(n_probes AS DOUBLE) * 1e9 + 0.5) AS BIGINT) AS fpr_obs9,
         |  CAST(floor(x * x * x * x * x * x * x * 1e9 + 0.5) AS BIGINT)
         |    AS fpr_theory9
         |FROM t""".stripMargin
    },

    // kmv: same hash/top-k/θ dag, 2^60 as an exact double literal.
    "q257_kmv_intersection" ->
      """WITH ev AS (SELECT DISTINCT event_type AS t,
        |    user_id * 100000 +
        |      datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS key
        |  FROM events WHERE event_type IN ('view', 'purchase')),
        |h AS (SELECT t,
        |    CAST(('0x' || substring(md5('kmv:' || CAST(key AS VARCHAR)),
        |      1, 15)) AS BIGINT) AS h
        |  FROM ev),
        |hk AS (SELECT CAST(max(h) AS BIGINT) AS hk,
        |    CAST(count(*) AS BIGINT) AS k
        |  FROM (SELECT DISTINCT h FROM h ORDER BY h LIMIT 256)),
        |nb AS (SELECT CAST(count(*) AS BIGINT) AS n_both
        |  FROM (SELECT h, count(DISTINCT t) AS nt FROM h GROUP BY h) g, hk
        |  WHERE g.h <= hk.hk AND g.nt = 2),
        |ex AS (SELECT CAST(count(*) AS BIGINT) AS n_exact_inter
        |  FROM (SELECT h, count(DISTINCT t) AS nt FROM h GROUP BY h) g
        |  WHERE g.nt = 2)
        |SELECT k, hk, n_both,
        |  CAST(floor(CAST(n_both AS DOUBLE) *
        |    CAST(1152921504606846976 AS DOUBLE) / CAST(hk AS DOUBLE)
        |    + 0.5) AS BIGINT) AS est_inter,
        |  n_exact_inter
        |FROM nb, hk, ex""".stripMargin,

    // sliding hll: same per-day registers, RANGE-window max-merge over
    // the calendar grid, same est dag, explode-based exact reference.
    "q244_hll_sliding_dau" -> {
      val alpha = "%.17g".format(0.7213 / (1 + 1.079 / 256))
      s"""WITH ev AS (SELECT
         |    datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
         |    user_id FROM events),
         |h AS (SELECT day,
         |    CAST(('0x' || substring(md5('hll:' ||
         |      CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
         |  FROM ev),
         |dr AS (SELECT day, h % 256 AS bucket,
         |    max(CASE WHEN (h >> 8) = 0 THEN 53
         |      ELSE 53 - length(printf('%b', h >> 8)) END) AS rho
         |  FROM h GROUP BY day, h % 256),
         |grid AS (SELECT d.day, b.bucket, coalesce(dr.rho, 0) AS rho
         |  FROM (SELECT DISTINCT day FROM ev) d
         |  CROSS JOIN (SELECT unnest(generate_series(0, 255)) AS bucket) b
         |  LEFT JOIN dr ON d.day = dr.day AND b.bucket = dr.bucket),
         |slid AS (SELECT day, bucket,
         |    max(rho) OVER (PARTITION BY bucket ORDER BY day
         |      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS rho7
         |  FROM grid),
         |pd AS (SELECT day,
         |    CAST(sum(CAST(1 AS BIGINT) << CAST(53 - rho7 AS INTEGER))
         |      AS BIGINT) AS s53,
         |    CAST(sum(CASE WHEN rho7 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS zeros
         |  FROM slid GROUP BY day),
         |e7 AS (SELECT day, CAST(count(DISTINCT user_id) AS BIGINT)
         |      AS n_exact7
         |  FROM (SELECT unnest(generate_series(day, day + 6)) AS day,
         |      user_id FROM (SELECT DISTINCT day, user_id FROM ev))
         |  GROUP BY day),
         |r AS (SELECT pd.day, s53, zeros,
         |    CAST($alpha AS DOUBLE) * CAST(65536 AS DOUBLE) *
         |      CAST(9007199254740992 AS DOUBLE) / CAST(s53 AS DOUBLE)
         |      AS raw, n_exact7
         |  FROM pd JOIN e7 ON pd.day = e7.day)
         |SELECT CAST(day AS BIGINT) AS day, s53, zeros,
         |  CAST(floor((CASE WHEN raw <= 640.0 AND zeros > 0
         |    THEN 256.0 * ln(256.0 / CAST(zeros AS DOUBLE)) ELSE raw END)
         |    * 1e9 + 0.5) AS BIGINT) AS est9,
         |  n_exact7
         |FROM r ORDER BY day""".stripMargin
    },

    // hll: same md5 hash/bucket/rho dag, same exact BIGINT harmonic
    // sum, same linear-counting branch, alpha embedded as the
    // identical %.17g double literal.
    "q242_hll_replayable" -> {
      val alpha = "%.17g".format(0.7213 / (1 + 1.079 / 256))
      s"""WITH li AS (SELECT l_partkey,
         |    CAST(('0x' || substring(md5('hll:' ||
         |      CAST(l_partkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
         |  FROM lineitem),
         |rh AS (SELECT h % 256 AS bucket,
         |    CASE WHEN (h >> 8) = 0 THEN 53
         |      ELSE 53 - length(printf('%b', h >> 8)) END AS rho
         |  FROM li),
         |rg AS (SELECT bucket, max(rho) AS rho FROM rh GROUP BY bucket),
         |regs AS (SELECT coalesce(rg.rho, 0) AS rho
         |  FROM (SELECT unnest(generate_series(0, 255)) AS bucket) b
         |  LEFT JOIN rg USING (bucket)),
         |ag AS (SELECT
         |    CAST(sum(CAST(1 AS BIGINT) << CAST(53 - rho AS INTEGER))
         |      AS BIGINT) AS s53,
         |    CAST(sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS zeros
         |  FROM regs),
         |ne AS (SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_exact
         |  FROM li),
         |raw AS (SELECT s53, zeros,
         |    CAST($alpha AS DOUBLE) * CAST(65536 AS DOUBLE) *
         |      CAST(9007199254740992 AS DOUBLE) / CAST(s53 AS DOUBLE)
         |      AS raw
         |  FROM ag)
         |SELECT CAST(256 AS BIGINT) AS m, s53, zeros,
         |  CAST(floor((CASE WHEN raw <= 640.0 AND zeros > 0
         |    THEN 256.0 * ln(256.0 / CAST(zeros AS DOUBLE)) ELSE raw END)
         |    * 1e9 + 0.5) AS BIGINT) AS est9,
         |  n_exact
         |FROM raw, ne""".stripMargin
    },
    // q117: the md5-nibble cell hash replays exactly — both engines
    // md5 identically, and instr-over-hexdigits is plain arithmetic.
    "q117_countmin_freq" ->
      """WITH toks AS (SELECT unnest(list_filter(string_split(text, ' '),
        |    t -> t <> '')) AS token FROM documents),
        |cells AS (
        |  SELECT token, hd.d AS d,
        |    ((instr('0123456789abcdef',
        |        substr(md5('cm' || hd.d || ':' || token), 1, 1)) - 1) * 16
        |     + (instr('0123456789abcdef',
        |        substr(md5('cm' || hd.d || ':' || token), 2, 1)) - 1)) % 64 AS b
        |  FROM toks, LATERAL (SELECT unnest(generate_series(0, 3)) AS d) hd),
        |sketch AS (SELECT d, b, count(*) AS cnt FROM cells GROUP BY d, b),
        |truth AS (SELECT token, count(*) AS true_cnt FROM toks GROUP BY token),
        |probes AS (SELECT token, true_cnt FROM truth
        |  ORDER BY true_cnt DESC, token LIMIT 20),
        |pcells AS (
        |  SELECT p.token, p.true_cnt, hd.d AS d,
        |    ((instr('0123456789abcdef',
        |        substr(md5('cm' || hd.d || ':' || p.token), 1, 1)) - 1) * 16
        |     + (instr('0123456789abcdef',
        |        substr(md5('cm' || hd.d || ':' || p.token), 2, 1)) - 1)) % 64 AS b
        |  FROM probes p, LATERAL (SELECT unnest(generate_series(0, 3)) AS d) hd)
        |SELECT token, CAST(true_cnt AS BIGINT) AS true_cnt,
        |  CAST(min(cnt) AS BIGINT) AS cm_est
        |FROM pcells JOIN sketch USING (d, b)
        |GROUP BY token, true_cnt
        |ORDER BY true_cnt DESC, token""".stripMargin,
    "q29_stats" ->
      """SELECT l_linestatus,
        |  min(l_quantity) AS min_qty,
        |  max(l_quantity) AS max_qty,
        |  round(stddev_samp(l_quantity), 9) AS sd_qty,
        |  round(var_samp(l_quantity), 9) AS var_qty
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "q30_collect_list" ->
      """SELECT c_nationkey,
        |  array_to_string(list_sort(list(c_mktsegment)), ',') AS segs,
        |  CAST(count(DISTINCT c_mktsegment) AS INT) AS n_distinct_segs
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q31_rollup" ->
      """SELECT CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  sum(l_quantity) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY gid, rf, ls""".stripMargin,

    "q32_cube" ->
      s"""SELECT CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
         |  coalesce(o_orderstatus, 'ALL') AS st,
         |  coalesce(o_orderpriority, 'ALL') AS prio,
         |  count(*) AS n,
         |  ${moneySumSql("o_totalprice")} AS rev
         |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
         |ORDER BY gid, st, prio""".stripMargin,

    "q66_pivot" ->
      """SELECT l_returnflag,
        |  coalesce(sum(l_quantity) FILTER (WHERE l_linestatus = 'F'), 0) AS qty_f,
        |  coalesce(sum(l_quantity) FILTER (WHERE l_linestatus = 'O'), 0) AS qty_o
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q33_grouping_sets" ->
      """SELECT CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  sum(l_quantity) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY gid, rf, ls""".stripMargin,

    "q72_unpivot" ->
      """SELECT n_name, 'n_nationkey' AS metric, n_nationkey AS value FROM nation
        |UNION ALL
        |SELECT n_name, 'n_regionkey' AS metric, n_regionkey AS value FROM nation
        |ORDER BY n_name, metric""".stripMargin,

    "q77_percentile_demo_bounded" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS p50,
        |  quantile_cont(l_quantity, 0.9) AS p90
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // Replays the two-pass math natively: window rank → two order
    // statistics per (flag, p) → Spark's exact blend formula, via the
    // shared targets/blend SQL fragments.
    "q103_percentile_2pass" ->
      s"""WITH ranked AS (
         |  SELECT l_returnflag, l_quantity,
         |    row_number() OVER (PARTITION BY l_returnflag
         |      ORDER BY l_quantity, l_orderkey, l_linenumber) AS rn
         |  FROM lineitem),
         |$percentileTargetsSql,
         |hits AS (
         |  SELECT r.l_returnflag, t.p,
         |    min(CASE WHEN r.rn = t.rk_lo THEN r.l_quantity END) AS v_lo,
         |    min(CASE WHEN r.rn = t.rk_hi THEN r.l_quantity END) AS v_hi,
         |    min(t.pos) AS pos
         |  FROM ranked r JOIN targets t
         |    ON r.l_returnflag = t.tf AND (r.rn = t.rk_lo OR r.rn = t.rk_hi)
         |  GROUP BY r.l_returnflag, t.p),
         |$percentileBlendPivotSql""".stripMargin,

    // Replays the count-based math: (group, value) counts → cumulative
    // intervals → bracketing order statistics → the shared targets/blend
    // SQL fragments.
    "q104_percentile_counts" ->
      s"""WITH vc AS (
         |  SELECT l_returnflag, l_quantity, count(*) AS cnt
         |  FROM lineitem GROUP BY l_returnflag, l_quantity),
         |cum AS (
         |  SELECT l_returnflag, l_quantity, cnt,
         |    sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS cum
         |  FROM vc),
         |cum2 AS (SELECT l_returnflag, l_quantity, cum, cum - cnt AS prev FROM cum),
         |$percentileTargetsSql,
         |hits AS (
         |  SELECT c.l_returnflag, t.p,
         |    min(CASE WHEN t.rk_lo > c.prev AND t.rk_lo <= c.cum THEN c.l_quantity END) AS v_lo,
         |    min(CASE WHEN t.rk_hi > c.prev AND t.rk_hi <= c.cum THEN c.l_quantity END) AS v_hi,
         |    min(t.pos) AS pos
         |  FROM cum2 c JOIN targets t ON c.l_returnflag = t.tf
         |    AND ((t.rk_lo > c.prev AND t.rk_lo <= c.cum)
         |      OR (t.rk_hi > c.prev AND t.rk_hi <= c.cum))
         |  GROUP BY c.l_returnflag, t.p),
         |$percentileBlendPivotSql""".stripMargin,

    // Same deterministic tie-break replayed: count DESC, value ASC.
    "q108_mode" ->
      """WITH vc AS (
        |  SELECT l_returnflag, l_quantity, count(*) AS cnt
        |  FROM lineitem GROUP BY l_returnflag, l_quantity),
        |r AS (
        |  SELECT l_returnflag, l_quantity, cnt,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY cnt DESC, l_quantity ASC) AS rn
        |  FROM vc)
        |SELECT l_returnflag, l_quantity AS mode_qty, CAST(cnt AS BIGINT) AS n_mode
        |FROM r WHERE rn = 1 ORDER BY l_returnflag""".stripMargin,

    // q160: DuckDB's interpolating median() on the raw values — the
    // engine's doubled-integer blend must land on the same dyadic
    // doubles.
    "q160_mad" ->
      """WITH med AS (SELECT l_returnflag, median(l_quantity) AS med
        |  FROM lineitem GROUP BY 1),
        |d AS (SELECT l.l_returnflag, abs(l.l_quantity - med.med) AS ad
        |  FROM lineitem l JOIN med ON l.l_returnflag = med.l_returnflag),
        |m2 AS (SELECT l_returnflag, median(ad) AS mad FROM d GROUP BY 1)
        |SELECT med.l_returnflag, med.med AS med, m2.mad AS mad
        |FROM med JOIN m2 USING (l_returnflag)
        |ORDER BY l_returnflag""".stripMargin,

    // q164: the p10/p90 bounds replay the exact Percentile target/blend
    // math (q104's pattern at different p), then both bound and value
    // quantize to 1e-9 BIGINTs before the clamp so the clipped sum is
    // order-independent.
    "q164_winsorized_mean" ->
      """WITH vc AS (
        |  SELECT l_returnflag, l_quantity, count(*) AS cnt
        |  FROM lineitem GROUP BY l_returnflag, l_quantity),
        |cum AS (
        |  SELECT l_returnflag, l_quantity, cnt,
        |    sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS cum
        |  FROM vc),
        |cum2 AS (SELECT l_returnflag, l_quantity, cum, cum - cnt AS prev FROM cum),
        |targets AS (
        |  SELECT l_returnflag AS tf, p,
        |    p * CAST(n - 1 AS DOUBLE) AS pos,
        |    CAST(floor(p * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1 AS rk_lo,
        |    CAST(ceil(p * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1 AS rk_hi
        |  FROM (SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag),
        |       (SELECT unnest([CAST(0.1 AS DOUBLE), CAST(0.9 AS DOUBLE)]) AS p)),
        |hits AS (
        |  SELECT c.l_returnflag, t.p,
        |    min(CASE WHEN t.rk_lo > c.prev AND t.rk_lo <= c.cum THEN c.l_quantity END) AS v_lo,
        |    min(CASE WHEN t.rk_hi > c.prev AND t.rk_hi <= c.cum THEN c.l_quantity END) AS v_hi,
        |    min(t.pos) AS pos
        |  FROM cum2 c JOIN targets t ON c.l_returnflag = t.tf
        |    AND ((t.rk_lo > c.prev AND t.rk_lo <= c.cum)
        |      OR (t.rk_hi > c.prev AND t.rk_hi <= c.cum))
        |  GROUP BY c.l_returnflag, t.p),
        |interp AS (
        |  SELECT l_returnflag, p,
        |    CASE WHEN floor(pos) = ceil(pos) THEN v_lo
        |         ELSE (ceil(pos) - pos) * v_lo + (pos - floor(pos)) * v_hi
        |    END AS pct
        |  FROM hits),
        |bounds AS (
        |  SELECT l_returnflag,
        |    CAST(floor(min(CASE WHEN p = 0.1 THEN pct END)*1e9 + 0.5) AS BIGINT) AS lo9,
        |    CAST(floor(min(CASE WHEN p = 0.9 THEN pct END)*1e9 + 0.5) AS BIGINT) AS hi9
        |  FROM interp GROUP BY l_returnflag)
        |SELECT l.l_returnflag, count(*) AS n,
        |  CAST(sum(greatest(b.lo9, least(b.hi9,
        |    CAST(l.l_quantity*1e9 AS BIGINT)))) AS BIGINT) AS s9,
        |  CAST(sum(greatest(b.lo9, least(b.hi9,
        |    CAST(l.l_quantity*1e9 AS BIGINT)))) AS DOUBLE)/count(*)/1e9 AS wmean
        |FROM lineitem l JOIN bounds b ON l.l_returnflag = b.l_returnflag
        |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin,

    "q83_salted_agg" ->
      s"""SELECT l_returnflag AS key,
         |  ${moneySumSql("l_quantity")} AS sum_qty,
         |  count(*) AS n_rows
         |FROM lineitem GROUP BY l_returnflag ORDER BY key""".stripMargin,
    // q34: no oracle by design (approx sketch) — rows-only driver check.

    "q182_equidepth_bins" ->
      """WITH vc AS (SELECT l_returnflag, l_quantity, count(*) AS cnt
        |  FROM lineitem GROUP BY 1, 2),
        |cum AS (SELECT l_returnflag, l_quantity, cnt,
        |    sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
        |      AS cum
        |  FROM vc),
        |n AS (SELECT l_returnflag, CAST(sum(cnt) AS BIGINT) AS n
        |  FROM vc GROUP BY 1),
        |t AS (SELECT l_returnflag AS tf, k, (k*n + 3)//4 AS rk
        |  FROM n, (VALUES (1),(2),(3)) ks(k)),
        |e AS (SELECT tf, k, min(l_quantity) AS edge
        |  FROM cum JOIN t ON l_returnflag = tf AND cum >= rk GROUP BY 1, 2),
        |ep AS (SELECT tf AS l_returnflag,
        |    min(CASE WHEN k = 1 THEN edge END) AS e1,
        |    min(CASE WHEN k = 2 THEN edge END) AS e2,
        |    min(CASE WHEN k = 3 THEN edge END) AS e3
        |  FROM e GROUP BY 1)
        |SELECT l.l_returnflag,
        |  CAST(CASE WHEN l_quantity <= e1 THEN 0
        |    WHEN l_quantity <= e2 THEN 1
        |    WHEN l_quantity <= e3 THEN 2 ELSE 3 END AS BIGINT) AS bin,
        |  count(*) AS n_rows,
        |  min(l_quantity) AS v_min, max(l_quantity) AS v_max
        |FROM lineitem l JOIN ep USING (l_returnflag)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // q191: open/close replayed with first/last row_number windows
    // over the same (ts, event_id) order.
    "q191_ohlc_bars" ->
      """WITH e AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hr, ts, event_id,
        |    value,
        |    row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
        |      ORDER BY ts, event_id) AS rn_a,
        |    row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
        |      ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events)
        |SELECT event_type, hr,
        |  min(CASE WHEN rn_a = 1 THEN value END) AS open,
        |  max(value) AS high, min(value) AS low,
        |  min(CASE WHEN rn_d = 1 THEN value END) AS close,
        |  count(*) AS volume
        |FROM e GROUP BY event_type, hr
        |ORDER BY event_type, hr""".stripMargin,

    "q193_weighted_median" ->
      s"""WITH vc AS (
         |  SELECT l_returnflag, l_quantity,
         |    CAST(sum(${centsSql("l_extendedprice")}) AS BIGINT) AS w
         |  FROM lineitem GROUP BY 1, 2),
         |cum AS (SELECT l_returnflag, l_quantity, w,
         |    CAST(sum(w) OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
         |      AS BIGINT) AS cum
         |  FROM vc),
         |t AS (SELECT l_returnflag AS tf, CAST(sum(w) AS BIGINT) AS tw,
         |    (sum(w) + 1) // 2 AS half
         |  FROM vc GROUP BY 1)
         |SELECT l_returnflag, min(l_quantity) AS w_median,
         |  CAST(min(tw) AS BIGINT) AS total_weight_cents
         |FROM cum JOIN t ON l_returnflag = tf AND cum >= half
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
