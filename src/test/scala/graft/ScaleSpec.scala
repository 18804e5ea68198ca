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
}
