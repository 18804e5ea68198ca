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

  test("collect_list length equals count per group (algebraic invariant)") {
    val df = Tables.customer(spark, sfDir)
      .groupBy("c_nationkey")
      .agg(size(collect_list(col("c_mktsegment"))).as("len"),
        count(lit(1)).as("n"))
      .filter(col("len") =!= col("n"))
    assert(df.count() === 0)
  }
}
