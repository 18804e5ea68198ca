package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-headroom data generator (round-6 verdict "What's missing #1").
  *
  * The driver testdata tops out at sf0.1 (~600 k lineitem rows) in a
  * 128 GiB sandbox that can absorb any memory-shape mistake; this main
  * replicates an sf dir `copies`× into a new directory so the bench can
  * be run one scale notch up and single-task-sort / per-group-buffer
  * defects (the q21/q77 class) surface empirically rather than by plan
  * inspection.
  *
  * Replication preserves JOIN SEMANTICS, not statistical realism:
  *  - dimension tables (region/nation/customer/supplier/part) copy
  *    unchanged, so fact→dim joins keep their natural fan-out;
  *  - fact keys shift by copy × stride (orders.o_orderkey and
  *    lineitem.l_orderkey shift TOGETHER, preserving the orders⋈lineitem
  *    multiplicity; events.user_id shifts so user cardinality grows with
  *    data — per-user windows stay bounded, as they would in reality);
  *  - documents get a per-copy suffix token so the corpus does not
  *    become 90% exact duplicates (which would collapse in dedup and
  *    explode LSH buckets with Jaccard-1 pairs — a different workload);
  *  - embeddings replicate as-is (ANN cost depends on counts, not
  *    values; cos ties across copies break deterministically by id).
  *
  * Not oracle-checked — sf1 exists for TIMING; correctness is the
  * driver's three-SF gate. Usage:
  *   runMain graft.HeadroomGen /root/testdata/sf0.1 /tmp/sf1 10
  */
object HeadroomGen {
  private val Stride = 1000000000L

  private def copies(spark: SparkSession, df: DataFrame, n: Int): DataFrame = {
    import spark.implicits._
    df.crossJoin(broadcast((0 until n).toDF("__copy")))
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 3 && args(2).forall(_.isDigit),
      "usage: runMain graft.HeadroomGen <srcSfDir> <dstDir> <copies>")
    val Array(src, dst, nStr) = args.take(3)
    val n = nStr.toInt
    val spark = Engine.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)

    def write(df: DataFrame, table: String): Unit =
      df.write.mode("overwrite").parquet(s"$dst/$table.parquet")

    for (dim <- Seq("region", "nation", "customer", "supplier", "part"))
      write(spark.read.parquet(s"$src/$dim.parquet"), dim)

    val shift = col("__copy").cast("long") * Stride
    write(
      copies(spark, spark.read.parquet(s"$src/orders.parquet"), n)
        .withColumn("o_orderkey", col("o_orderkey") + shift).drop("__copy"),
      "orders")
    write(
      copies(spark, spark.read.parquet(s"$src/lineitem.parquet"), n)
        .withColumn("l_orderkey", col("l_orderkey") + shift).drop("__copy"),
      "lineitem")
    // events.ts is TIMESTAMP(NANOS) read as raw long (Engine config);
    // the copy writes it back as plain BIGINT, which Tables.events
    // converts identically.
    write(
      copies(spark, spark.read.parquet(s"$src/events.parquet"), n)
        .withColumn("event_id", col("event_id") + shift)
        .withColumn("user_id", col("user_id") + col("__copy").cast("long") * 1000000L)
        .drop("__copy"),
      "events")
    write(
      copies(spark, spark.read.parquet(s"$src/documents.parquet"), n)
        .withColumn("doc_id", col("doc_id") + shift)
        .withColumn("text",
          when(col("__copy") === 0, col("text"))
            .otherwise(concat(col("text"), lit(" copy"), col("__copy"))))
        .drop("__copy"),
      "documents")
    write(
      copies(spark, spark.read.parquet(s"$src/embeddings.parquet"), n)
        .withColumn("vec_id", col("vec_id") + shift).drop("__copy"),
      "embeddings")

    println(s"""{"headroom_dir":"$dst","copies":$n}""")
    spark.stop()
  }
}
