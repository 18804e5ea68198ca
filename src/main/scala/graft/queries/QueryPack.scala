package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named set of driver-checkable queries.
  *
  * Every query is a function (session, sfDir) => DataFrame whose result is
  * dumped to parquet by [[graft.Verify]] and hash-compared against the
  * DuckDB result of the matching [[oracles]] SQL. Contract (see the
  * builder prompt):
  *   - output column names must match the oracle SQL aliases exactly;
  *   - results carry a deterministic total ORDER BY on a unique key;
  *   - floating-point aggregates use the cents-quantization pattern in
  *     [[graft.functions.Exact]] so both engines produce identical bits.
  *
  * Queries with no oracle entry (approx / LSH / streaming-only) get a
  * rows-only check from the driver and are property-tested in ScalaTest.
  */
trait QueryPack {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracles: Map[String, String]
}
