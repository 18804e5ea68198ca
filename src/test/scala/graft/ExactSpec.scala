package graft

import org.apache.spark.sql.functions._
import graft.functions.Exact

/** Null/edge semantics of the cents-quantized money aggregates. */
class ExactSpec extends SparkSpec {

  test("moneySum is exact and order-independent for 2-decimal inputs") {
    import spark.implicits._
    val vals = Seq(0.01, 0.02, 0.03, 1000000.10, -0.06)
    val df = vals.toDF("x").repartition(4) // scramble order across partitions
    val got = df.agg(Exact.moneySum(col("x")).as("s")).collect()(0).getDouble(0)
    assert(got === 1000000.10)
  }

  test("moneyAvg divides by the non-null count (SQL AVG semantics)") {
    import spark.implicits._
    val df = Seq(Some(2.0), None, Some(4.0)).toDF("x")
    val got = df.agg(Exact.moneyAvg(col("x")).as("a")).collect()(0).getDouble(0)
    assert(got === 3.0) // (2+4)/2, not /3
  }

  test("moneySum of all-null group is null, matching SQL SUM") {
    import spark.implicits._
    val df = Seq[Option[Double]](None, None).toDF("x")
    assert(df.agg(Exact.moneySum(col("x"))).collect()(0).isNullAt(0))
  }
}
