package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries live in [[graft.queries.QueryPack]]s, one pack per operator
  * family from SURVEY.md §2; this object is the flat registry the driver
  * consumes. Each query key has a matching DuckDB oracle SQL entry unless
  * the operator is not SQL-expressible (approx sketches, LSH, streaming
  * internals) — those get the driver's rows-only check and ScalaTest
  * property coverage instead.
  */
object SparkEntry {
  private def packs: Seq[QueryPack] = Seq(
    RelationalQueries
  )

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q03_join_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap
}
