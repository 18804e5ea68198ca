package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Property coverage for aggregates that have no SQL oracle. */
class AggSpec extends SparkSpec {

  test("approx_count_distinct is within its configured rsd of the exact count") {
    val df = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("exact"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx"))
      .collect()
    assert(df.nonEmpty)
    df.foreach { r =>
      val exact = r.getLong(r.fieldIndex("exact")).toDouble
      val approx = r.getLong(r.fieldIndex("approx")).toDouble
      // 0.02 rsd → allow 5 sigma.
      assert(math.abs(approx - exact) / exact <= 0.10,
        s"flag=${r.getString(0)}: approx=$approx exact=$exact")
    }
  }

  test("q242 replayable HLL: estimate within the m=256 error envelope, registers max-mergeable") {
    val r = SparkEntry.queries("q242_hll_replayable")(spark, sfDir)
      .collect().head
    val est = r.getAs[Long]("est9").toDouble / 1e9
    val exact = r.getAs[Long]("n_exact").toDouble
    // σ ≈ 1.04/√256 = 6.5%; allow ~4σ.
    assert(math.abs(est - exact) / exact <= 0.25,
      s"HLL estimate $est vs exact $exact outside envelope")
    // Merge law: registers built on two disjoint halves and MAX-merged
    // must equal the global registers exactly — the property that makes
    // HLL a one-pass mergeable rollup at 100 TB.
    def registers(f: org.apache.spark.sql.Column) = {
      val h = conv(substring(md5(concat(lit("hll:"),
        col("l_partkey").cast("string"))), 1, 15), 16, 10).cast("long")
      Tables.lineitem(spark, sfDir).filter(f)
        .select(h.as("h"))
        .select(pmod(col("h"), lit(256L)).as("bucket"),
          expr("shiftright(h, 8)").as("v"))
        .select(col("bucket"), when(col("v") === 0L, lit(53L))
          .otherwise(lit(53L) - length(bin(col("v")))).as("rho"))
        .groupBy("bucket").agg(max("rho").as("rho"))
    }
    val merged = registers(col("l_orderkey") % 2 === 0)
      .unionByName(registers(col("l_orderkey") % 2 =!= 0))
      .groupBy("bucket").agg(max("rho").as("rho"))
    val global = registers(lit(true))
    assert(merged.except(global).isEmpty && global.except(merged).isEmpty,
      "max-merge of half-corpus registers differs from the global registers")
  }

  test("q261 bloom FPR: disjoint probes, observed rate inside the binomial envelope") {
    val r = SparkEntry.queries("q261_bloom_fpr")(spark, sfDir)
      .collect().head
    val nParts = Tables.part(spark, sfDir).count()
    assert(r.getAs[Long]("n_ins") + r.getAs[Long]("n_probes") == nParts)
    val p = r.getAs[Long]("fpr_theory9").toDouble / 1e9
    val n = r.getAs[Long]("n_probes")
    val obs = r.getAs[Long]("n_false_pos")
    // Binomial(n, p) 5σ envelope around the theoretical rate.
    val sigma = math.sqrt(n * p * (1 - p))
    assert(math.abs(obs - n * p) <= 5 * sigma + 3,
      s"observed $obs false positives vs expected ${n * p} ± $sigma")
  }

  test("q257 KMV intersection: consistent sketch state and a sane estimate") {
    val r = SparkEntry.queries("q257_kmv_intersection")(spark, sfDir)
      .collect().head
    val k = r.getAs[Long]("k"); val hk = r.getAs[Long]("hk")
    val nBoth = r.getAs[Long]("n_both")
    val est = r.getAs[Long]("est_inter")
    val exact = r.getAs[Long]("n_exact_inter")
    assert(k <= 256L && hk > 0L)
    assert(nBoth <= k, "below-θ members cannot exceed the sketch size")
    assert(est >= nBoth, "scaling by 1/θ can only grow the count")
    // RSE ≈ 1/√n_both; allow ~3σ.
    val rse = 1.0 / math.sqrt(math.max(nBoth, 1L).toDouble)
    assert(math.abs(est - exact).toDouble / exact <= 3 * rse + 0.05,
      s"KMV estimate $est vs exact $exact outside 3σ (rse=$rse)")
  }

  test("q244 sliding HLL: every day's estimate within envelope of its exact window") {
    val rows = SparkEntry.queries("q244_hll_sliding_dau")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Long]("est9").toDouble / 1e9
      val exact = r.getAs[Long]("n_exact7").toDouble
      assert(r.getAs[Long]("zeros") <= 256L && r.getAs[Long]("s53") > 0L)
      assert(math.abs(est - exact) / exact <= 0.25,
        s"day ${r.getAs[Int]("day")}: HLL $est vs exact $exact outside envelope")
    }
    // Window growth: once 7 full days accumulate, the windowed count
    // can never be below the busiest single day inside it.
    val daily = Tables.events(spark, sfDir)
      .select(col("ts").cast("date").as("d"), col("user_id")).distinct()
      .groupBy("d").agg(count(lit(1)).as("n")).collect()
      .map(_.getAs[Long]("n"))
    assert(rows.drop(6).forall(_.getAs[Long]("n_exact7") >= daily.min))
  }

  test("count-min: disjoint-corpus sketches merge by cell-wise sum to the global sketch") {
    import graft.ops.{Sketch, Text}
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("token"))
    val a = toks.filter(col("doc_id") % 2 === 0).select("token")
    val b = toks.filter(col("doc_id") % 2 =!= 0).select("token")
    val merged = Sketch.cmSketch(a, "token", 4, 64)
      .unionByName(Sketch.cmSketch(b, "token", 4, 64))
      .groupBy("d", "b").agg(sum("cnt").as("cnt"))
    val global = Sketch.cmSketch(toks.select("token"), "token", 4, 64)
    assert(merged.except(global).isEmpty && global.except(merged).isEmpty,
      "cell-wise sum of partial sketches differs from the global sketch")
  }

  test("count-min: every estimate is >= the true count (overestimate-only)") {
    import graft.ops.{Sketch, Text}
    val toks = Tables.documents(spark, sfDir)
      .select(explode(Text.tokens(col("text"))).as("token"))
    val sketch = Sketch.cmSketch(toks, "token", 4, 64)
    val truth = toks.groupBy("token").agg(count(lit(1)).as("true_cnt"))
    val bad = Sketch.cmEstimate(truth, sketch, "token", 4, 64)
      .filter(col("cm_est") < col("true_cnt"))
    assert(bad.isEmpty, "count-min underestimated a frequency")
  }

  test("HLL sketch union: merged per-group sketches estimate exactly as one global sketch") {
    val orders = Tables.orders(spark, sfDir)
    // Pre-aggregate a sketch per month, union downstream (q96's shape).
    val merged = orders
      .groupBy(date_trunc("month", col("o_orderdate")).as("mon"))
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect()(0).getLong(0)
    val global = orders
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))).as("est"))
      .collect()(0).getLong(0)
    val exact = orders.select(countDistinct(col("o_custkey"))).collect()(0).getLong(0)
    // Register-level union is lossless: merging per-month sketches must
    // give EXACTLY the single-pass sketch's estimate — the property that
    // makes pre-aggregated sketch rollups safe at 100 TB.
    assert(merged === global, s"union-merged $merged != global sketch $global")
    // And the sketch itself must be a sane estimator (default lgk=12
    // → ~1.6% rsd; allow 5%).
    assert(math.abs(merged - exact).toDouble / exact <= 0.05,
      s"estimate $merged vs exact $exact")
  }

  test("approx_percentile lands within one quantity unit of the exact percentile") {
    val df = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.5D)").as("exact50"),
        expr("approx_percentile(l_quantity, 0.5D, 1000)").as("ap50"),
        expr("percentile(l_quantity, 0.9D)").as("exact90"),
        expr("approx_percentile(l_quantity, 0.9D, 1000)").as("ap90"))
      .collect()
    assert(df.nonEmpty)
    df.foreach { r =>
      // quantity is integral 1..50; accuracy=1000 keeps the sketch
      // within a single value step of the exact interpolated percentile.
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) <= 1.0,
        s"p50 ${r.getDouble(2)} vs exact ${r.getDouble(1)}")
      assert(math.abs(r.getDouble(3) - r.getDouble(4)) <= 1.0,
        s"p90 ${r.getDouble(4)} vs exact ${r.getDouble(3)}")
    }
  }

  test("collect_list length equals count per group (algebraic invariant)") {
    val df = Tables.customer(spark, sfDir)
      .groupBy("c_nationkey")
      .agg(size(collect_list(col("c_mktsegment"))).as("len"),
        count(lit(1)).as("n"))
      .filter(col("len") =!= col("n"))
    assert(df.count() === 0)
  }
}
