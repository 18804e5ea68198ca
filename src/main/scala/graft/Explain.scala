package graft

/** Plan inspector: `runMain graft.Explain q01_pricing_summary ...`
  * prints each named query's formatted physical plan (all registered
  * queries when none named). The dev loop for the 100 TB contract:
  * check pushdown reached the scan, dims broadcast, aggregates sit
  * below joins, no surprise exchanges — before trusting a bench number.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Engine.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt)
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    // Fail fast on typos BEFORE building anything: sink/collect queries
    // run real jobs while constructing their DataFrame.
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty,
      s"unknown queries: ${unknown.mkString(", ")}; valid names: " +
        SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
    names.foreach { name =>
      println(s"\n========== $name ==========")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
