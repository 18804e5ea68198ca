package graft.sources

/** Staging area under /tmp/graft_io for sink outputs, decoded binary
  * drops, and stream-source symlink dirs — keyed by a sanitized slug of
  * the data dir so runs against different sf dirs never collide. The
  * single home for the idiom (was copy-pasted across SourceQueries /
  * MatrixQueries / streaming.Events — round-7 review).
  */
object Staging {
  def dir(dataDir: String, name: String): String =
    s"/tmp/graft_io/${dataDir.replaceAll("[^A-Za-z0-9]", "_")}/$name"

  /** Drops a managed catalog table AND its warehouse directory. A
    * fresh session's in-memory catalog doesn't know about table
    * directories left in the warehouse by a previous run, and CTAS
    * refuses a non-empty location — so both layers must go. Shared by
    * every lazily-materialized table surface (q89's bucketed join,
    * the persisted IVF index).
    */
  def dropManagedTable(s: org.apache.spark.sql.SparkSession, t: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $t")
    val wh = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val p = java.nio.file.Paths.get(wh, t)
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val st = java.nio.file.Files.walk(p)
      try st.iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally st.close()
    }
  }
}
