package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Semantic properties of the round-12 TPC-H shape family (q305–q318)
  * beyond the driver's oracle hash: each test recounts an invariant the
  * bit-compare alone would not localize if it broke — pair-restriction
  * containment, CASE-count conservation, tie retention, threshold
  * completeness, and the q308 envelope-filter equivalence claim.
  */
class TpchShapeSpec extends SparkSpec {

  private def run(q: String) = SparkEntry.queries(q)(spark, sfDir)

  test("q305: every row stays inside the declared nation pair and ship-year range") {
    val rows = run("q305_volume_shipping").collect()
    assert(rows.nonEmpty)
    val pairs = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.subsetOf(Set(("NATION_12", "NATION_19"), ("NATION_19", "NATION_12"))))
    assert(rows.forall(r => r.getInt(2) == 1996 || r.getInt(2) == 1997))
    assert(rows.forall(_.getDouble(3) > 0))
  }

  test("q306: CASE share is conserved (nat <= tot) and share9 re-derives from the cents") {
    val rows = run("q306_market_share").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nat, tot, share9) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nat >= 0 && nat <= tot)
      assert(share9 == math.floor(nat.toDouble / tot * 1e9 + 0.5).toLong)
    }
  }

  test("q307: grouped profit mills sum to the ungrouped total (no rows lost to grouping)") {
    val grouped = run("q307_product_profit")
      .agg(sum("sum_profit_mills")).head().getLong(0)
    val total = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir).filter(col("p_name").like("%red%")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .select((round(col("l_extendedprice") * (lit(1) - col("l_discount"))
        * lit(1000), 0).cast("long")
        - col("l_quantity").cast("long")
          * round(col("p_retailprice") * lit(100), 0).cast("long")).as("m"))
      .agg(sum("m")).head().getLong(0)
    assert(grouped === total)
  }

  test("q308: the explicit envelope filters are semantics-preserving vs the bare OR") {
    // The engine adds per-side pushable envelopes above the scans; this
    // recount drops them and runs the textbook bare disjunction — the
    // in-engine mirror of what the DuckDB oracle proves cross-engine.
    val engine = run("q308_disjunctive_join").head()
    val bare = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 5)
          && col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 10)
          && col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 15)
          && col("l_quantity").between(20, 30)))
      .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
        * lit(100), 0).cast("long")).as("cents"), count(lit(1)).as("n"))
      .head()
    assert(engine.getLong(1) === bare.getLong(1))
    assert(math.round(engine.getDouble(0) * 100) === bare.getLong(0))
  }

  test("q312: high + low line counts conserve the joined row count per group") {
    val rows = run("q312_priority_classes").collect()
    assert(rows.nonEmpty)
    val joined = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate").between(
        lit("1996-01-01").cast("timestamp"),
        lit("1996-12-31").cast("timestamp")))
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) === joined(r.getString(0)))
    }
  }

  test("q314: the winner set is exactly the suppliers achieving the global max (ties kept)") {
    val winners = run("q314_top_supplier").collect()
      .map(_.getLong(0)).toSet
    val rev = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate").between(
        lit("1996-01-01").cast("timestamp"),
        lit("1996-03-31").cast("timestamp")))
      .groupBy("l_suppkey")
      .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
        * lit(100), 0).cast("long")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mx = rev.values.max
    assert(winners === rev.filter(_._2 == mx).keySet)
  }

  test("q315: no blocklisted supplier contributes to any group count") {
    // The blocklist is empty at sf0.001 (10 suppliers, none negative)
    // and bites from sf0.01 up (6 negatives there) — the recount below
    // is exact either way, and the driver's sf0.01 oracle covers the
    // biting case.
    val bad = Tables.supplier(spark, sfDir).filter(col("s_acctbal") < 0)
      .collect().map(_.getLong(0)).toSet
    val contributing = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey").distinct()
      .join(Tables.part(spark, sfDir)
        .filter(col("p_brand") =!= "Brand#1" && !col("p_type").like("PROMO%")
          && col("p_size").isin(1, 5, 10, 15, 20, 25)),
        col("l_partkey") === col("p_partkey"))
      .select("l_suppkey").distinct().collect().map(_.getLong(0)).toSet
    // The query's anti join must remove exactly the blocklist overlap:
    // recount one group's distinct suppliers excluding the blocklist.
    val rows = run("q315_supplier_counts").collect()
    assert(rows.nonEmpty)
    val totalFromQuery = rows.map(_.getLong(3)).sum
    val pairs = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey").distinct()
      .join(Tables.part(spark, sfDir)
        .filter(col("p_brand") =!= "Brand#1" && !col("p_type").like("PROMO%")
          && col("p_size").isin(1, 5, 10, 15, 20, 25)),
        col("l_partkey") === col("p_partkey"))
      .filter(if (bad.isEmpty) lit(true) else !col("l_suppkey").isInCollection(bad))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct("l_suppkey").as("c"))
      .agg(sum("c")).head().getLong(0)
    assert(totalFromQuery === pairs)
    assert((contributing -- bad).nonEmpty)
  }

  test("q316: kept parts are exactly those above 2x the mean share (complete and sound)") {
    val kept = run("q316_important_stock").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perPart = Tables.lineitem(spark, sfDir)
      .join(Tables.supplier(spark, sfDir)
        .join(Tables.nation(spark, sfDir).filter(col("n_name") === "NATION_12"),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey").agg(sum(col("l_quantity").cast("long")).as("qty"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tot = perPart.values.sum
    val n = perPart.size.toLong
    val expect = perPart.filter { case (_, q) => q * n > 2 * tot }
    assert(kept === expect)
    assert(kept.nonEmpty)
  }

  test("q317: every counted order has at least one >60-day-late line; totals bounded") {
    val rows = run("q317_late_order_priority").collect()
    assert(rows.nonEmpty)
    val counted = rows.map(_.getLong(1)).sum
    val recount = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate").between(
        lit("1996-01-01").cast("timestamp"),
        lit("1996-06-30").cast("timestamp")))
      .join(Tables.lineitem(spark, sfDir),
        col("l_orderkey") === col("o_orderkey")
          && col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"),
        "left_semi")
      .count()
    assert(counted === recount)
  }

  test("q318: both branches produce the identical pair count (plan choice is value-invariant)") {
    import graft.ops.SketchPlanner
    val li = Tables.lineitem(spark, sfDir)
    val fl = li.groupBy(col("l_suppkey").as("k"))
      .agg(count(lit(1)).as("f")).localCheckpoint(false)
    // Force-evaluate both strategies on the same (skewed) input.
    val direct = li.select(col("l_suppkey").as("__pk"))
      .join(li.select(col("l_suppkey").as("__bk")), col("__pk") === col("__bk"))
      .count()
    val preagg = fl.select(col("k").as("ka"),
        col("f").cast("decimal(38,0)").as("f_a"))
      .join(fl.select(col("k").as("kb"), col("f").cast("decimal(38,0)").as("f_b")),
        col("ka") === col("kb"))
      .agg(sum(col("f_a") * col("f_b")).cast("long")).head().getLong(0)
    assert(direct === preagg)
    // And the registered query's emitted counts agree with the recount.
    val out = run("q318_sketch_planned_join").collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(out("skewed") === preagg)
  }

  test("SketchPlanner: an empty side estimates 0 and plans an empty direct join") {
    import graft.ops.SketchPlanner
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
    val empty = li.filter(lit(false))
    val fEmpty = empty.groupBy(col("l_suppkey").as("k"))
      .agg(count(lit(1)).as("f"))
    val fFull = li.groupBy(col("l_suppkey").as("k"))
      .agg(count(lit(1)).as("f"))
    assert(SketchPlanner.estimateJoinSize(fEmpty, fFull, "jp:")
      .compareTo(java.math.BigDecimal.ZERO) == 0)
    val (pairs, chosen, est, nProbe) = SketchPlanner.plannedPairCount(
      empty, "l_suppkey", li, "l_suppkey", fEmpty, fFull, "jp:")
    assert(chosen === "direct" && nProbe === 0L
      && est.compareTo(java.math.BigDecimal.ZERO) == 0)
    assert(pairs.head().getLong(0) === 0L)
  }
}
