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

  /** Per-application name for a persisted managed table: the base name
    * suffixed with the sanitized Spark applicationId. The fixed-name
    * versions were a cross-JVM foot-gun (round-13 verdict, wrong #2):
    * two concurrent JVMs on the same repo dir share spark-warehouse/,
    * and one's drop-and-rewrite of `graft_nsw_vecs` made the other's
    * mid-suite reads fail FILE_NOT_EXIST. The appId is stable within a
    * JVM (memoized ensure*Index states stay valid) and unique across
    * JVMs (writers can no longer collide). Single-writer within one
    * application is still assumed — that writer is the ensure*
    * memoization itself. Old applications' table dirs linger in the
    * (gitignored) warehouse until a manual clean; that is the price of
    * not racing a concurrent JVM's live tables with a startup sweep.
    */
  def appTable(s: org.apache.spark.sql.SparkSession, base: String): String =
    base + "_" + s.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "_")

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
