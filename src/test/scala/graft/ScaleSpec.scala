package graft

import org.apache.spark.sql.functions._
import graft.ops.Skew
import graft.sources.Tables

/** Scale-technique specs: bucketed co-located joins (no Exchange) and
  * salted aggregation — the two shuffle-avoidance tools the 100 TB
  * design rules call for beyond what AQE does automatically.
  */
class ScaleSpec extends SparkSpec {

  test("bucketed tables join without any shuffle exchange") {
    val wh = new java.io.File("spark-warehouse").getAbsolutePath
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(spark, sfDir)
        .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("orders_b")
      Tables.customer(spark, sfDir)
        .write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable("customer_b")
      val j = spark.table("orders_b")
        .join(spark.table("customer_b"),
          col("o_custkey") === col("c_custkey"))
      val plan = j.queryExecution.executedPlan.toString
      // Both sides pre-bucketed on the join key → SortMergeJoin with
      // ZERO ShuffleExchange (the co-located join the reference's
      // broadcast-everything physical plan could never express).
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"expected exchange-free bucketed join:\n$plan")
      assert(j.count() === Tables.orders(spark, sfDir).count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("salted aggregation equals direct aggregation (hot-key spread)") {
    val li = Tables.lineitem(spark, sfDir)
    val direct = li.groupBy(col("l_returnflag").as("key"))
      .agg(sum("l_quantity").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
    val salted = Skew.saltedAggregate(
        li, col("l_returnflag"), salts = 16,
        partial = Seq(sum("l_quantity").as("ps"), count(lit(1)).as("pn")),
        finalAgg = Seq(sum("ps").as("s"), sum("pn").as("n")))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(salted.keySet === direct.keySet)
    for ((k, (s, n)) <- direct) {
      assert(math.abs(salted(k)._1 - s) < 1e-6, s"sum mismatch for $k")
      assert(salted(k)._2 === n, s"count mismatch for $k")
    }
  }

  test("AQE splits a manufactured skewed join (OptimizeSkewedJoin fires)") {
    // The 100 TB skew story (Dedup/Matrix scale notes) leans on AQE's
    // runtime skew-split; this manufactures the pathology — one key
    // owning 50% of the rows — with thresholds scaled down to test
    // size, and asserts the FINAL adaptive plan actually split the
    // skewed partitions (skew=true on the SortMergeJoin).
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val pad = "x" * 64
      // 50% of the left rows share key 0; the rest spread over 100 keys.
      val left = spark.range(50000).select(
        when(col("id") % 2 === 0, lit(0L))
          .otherwise(pmod(col("id"), lit(100L)) + 1).as("k"),
        concat(lit(pad), col("id")).as("payload"))
      val right = spark.range(101).select(col("id").as("k"), col("id").as("rv"))
      val j = left.join(right, "k")
      // collect() runs j's own QueryExecution, so the adaptive plan
      // below is the FINAL one (post-execution re-planning included).
      assert(j.collect().length === 50000)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected OptimizeSkewedJoin to mark the SMJ skew=true:\n$plan")
    } finally {
      saved.foreach { case (k, vOpt) =>
        vOpt.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
    }
  }

  test("salted aggregation is invariant in the salt count (incl. degenerate salts=1)") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    // Hot-key distribution: 80% of rows share one key.
    val rows = (0 until 2000).map { i =>
      (i.toLong, if (rng.nextInt(5) < 4) "hot" else s"k${rng.nextInt(10)}", rng.nextInt(100).toLong)
    }.toDF("id", "key", "v")
    def run(salts: Int) = graft.ops.Skew.saltedAggregate(
        rows, col("key"), salts,
        partial = Seq(sum("v").as("pv"), count(lit(1)).as("pn")),
        finalAgg = Seq(sum("pv").as("s"), sum("pn").as("n")),
        saltOn = Some(col("id")))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    val r1 = run(1); val r4 = run(4); val r32 = run(32)
    assert(r1 === r4 && r4 === r32)
  }

  test("salted join equals plain join on a hot-key input and shuffles on (key, salt)") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    // 70% of fact rows share one dim key — the single-dominant-key
    // pathology saltedJoin exists for.
    val fact = (0 until 5000).map { i =>
      (i.toLong, if (rng.nextInt(10) < 7) 0L else rng.nextInt(50).toLong + 1, rng.nextInt(100).toLong)
    }.toDF("id", "k", "v")
    val dim = (0L to 50L).map(k => (k, s"d$k")).toDF("dk", "name")
    val plain = fact.join(dim, col("k") === col("dk"))
      .groupBy("name").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    val salted = Skew.saltedJoin(fact, "k", dim.hint("merge"), "dk",
        salts = 8, saltOn = col("id"))
      .groupBy("name").agg(sum("v").as("s"), count(lit(1)).as("n"))
    val got = salted.collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got === plain)
    // The merge hint must survive the rewrite, and the join key must
    // carry the salt — that (key, salt) composite IS the spread.
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ under merge hint:\n$plan")
    assert(plan.contains("__fsalt") && plan.contains("__dsalt"),
      s"expected the salt in the join keys:\n$plan")
  }

  test("q292 grid NN: one row per customer, via consistent with the g2 bound") {
    val rows = SparkEntry.queries("q292_grid_nn_join")(spark, sfDir).collect()
    val nCust = graft.sources.Tables.customer(spark, sfDir).count()
    assert(rows.length.toLong == nCust, "must resolve every customer exactly once")
    assert(rows.map(_.getAs[Long]("ck")).distinct.length == rows.length)
    val g2 = 100000L * 100000L
    rows.foreach { r =>
      val d2 = r.getAs[Long]("d2")
      assert(d2 >= 0L)
      // ring-resolved iff the global minimum clears the cell-width bound
      assert((r.getAs[String]("via") == "ring") == (d2 <= g2),
        s"ck=${r.getAs[Long]("ck")} via=${r.getAs[String]("via")} d2=$d2")
    }
  }
}
