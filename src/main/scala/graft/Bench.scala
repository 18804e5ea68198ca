package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: times every registered query at SPARK_GRAFT_SF_DIR.
  *
  * Methodology (fixes per round-1 verdict):
  *  - each query executes via the `noop` sink, which fully evaluates every
  *    column and row (unlike `.count()`, under which Catalyst prunes
  *    projections and computed columns away);
  *  - one discarded warmup query pays the JVM/codegen/session start cost
  *    so q01 is not billed for it;
  *  - failures are recorded in the JSON (`-1` timing + `failures` list),
  *    never swallowed into a fast fake pass;
  *  - the session comes from [[Engine.builder]] so the documented AQE /
  *    shuffle-partition config is what actually runs;
  *  - the JSON line is printed to stdout AND written to BENCH_LOCAL.json
  *    so it stays machine-readable even under sbt log noise.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Engine.session(cpus)

    def runNoop(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // Warmup (not timed): flagship join+agg touches scan/join/agg/codegen.
    try runNoop("q03_join_agg") catch { case _: Throwable => () }

    val failures = scala.collection.mutable.ListBuffer[String]()
    val results = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val t0 = System.nanoTime()
      val t =
        try { runNoop(name); (System.nanoTime() - t0) / 1e9 }
        catch {
          case e: Throwable =>
            failures += s"$name: ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}"
            -1.0
        }
      name -> t
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // Full control-char escaping (JsonOut): Spark error messages are
    // multi-line, and a raw newline would invalidate the whole file.
    val fstr = failures.map(JsonOut.q).mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failures":$fstr,"sf":${JsonOut.q(sfDir)}}"""
    Files.writeString(Paths.get("BENCH_LOCAL.json"), line)

    // The driver keeps only the LAST ~2000 chars of stdout and json-parses the
    // final line; the full-name full-precision line above exceeds that with
    // 90+ queries, so the printed line uses the bare `qNN` prefix as key and
    // 3-decimal seconds. Full detail stays in BENCH_LOCAL.json.
    def r3(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qsShort = results
      .map { case (k, v) => "\"" + k.takeWhile(_ != '_') + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val fShort = failures.map(f => JsonOut.q(f.take(60))).mkString("[", ",", "]")
    val shortLine =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","n_queries":${results.size},"queries":$qsShort,"failures":$fShort,"sf":${JsonOut.q(sfDir)}}"""
    println(shortLine)
    spark.stop()
  }
}
