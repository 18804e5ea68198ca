package org.apache.spark.sql.graftshim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** One-method bridge for [[graft.plans.GraftMergeCommand]]: Spark's
  * public API has no LogicalPlan → DataFrame constructor (the
  * `Dataset.ofRows` factory is `private[sql]`), but a SQL-front rule
  * that intercepts a parsed MERGE statement holds exactly a
  * LogicalPlan for the USING source and must hand it to the library
  * merge API as a DataFrame. This shim lives in an
  * `org.apache.spark.sql` subpackage solely to cross that visibility
  * boundary — the standard extension-project recipe — and contains no
  * logic of its own.
  */
object GraftSqlBridge {
  def ofRows(s: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      s.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
