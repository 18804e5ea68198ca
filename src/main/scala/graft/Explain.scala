package graft

/** Dev tool: print a registered query's formatted physical plan.
  *
  *   sbt -batch "runMain graft.Explain q329_ann_nsw_beam /root/testdata/sf0.01"
  *
  * The plan-audit loop (SURVEY §5.2 "explain-and-iterate") otherwise
  * needs a throwaway main per inspection; PlanSpec gates assert plan
  * PROPERTIES but don't print the tree a human reads to find the next
  * property worth gating.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: runMain graft.Explain <queryKey> <sfDir>")
    val spark = Engine.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    SparkEntry.queries(args(0))(spark, args(1)).explain("formatted")
    spark.stop()
  }
}
