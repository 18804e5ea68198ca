package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to each left row the most recent right row with
  * `rightTs <= leftTs` within the same partition keys (SURVEY.md §2.2
  * "as-of join", EXT — no reference counterpart).
  *
  * Spark has no native as-of operator; the scalable composition is
  * union + ordered window (SURVEY.md §4.3): tag both inputs, union
  * them, and run `last(<right value>, ignoreNulls)` over a window
  * ordered by (ts, tag) with right rows sorted before left rows at
  * equal timestamps (so the match is `<=`, not `<`).
  *
  * Scale: ONE shuffle on the partition keys + a per-partition sort —
  * same cost envelope as any window function, and strictly cheaper
  * than the range-join + row_number alternative (which shuffles the
  * candidate pair blow-up). No driver materialization, no state beyond
  * the sort. Skew bounds at the largest single partition key, as for
  * any window.
  *
  * Requirement: at most one right row per (keys, ts) — pre-aggregate
  * the right side otherwise (ambiguous ties would make the "the" match
  * nondeterministic; DuckDB's ASOF JOIN has the same caveat).
  */
object AsOf {

  /** Left rows + `valueCol` from the latest right row at or before the
    * left timestamp (null when none precedes). `leftCols` are carried
    * through; both inputs must share `keys` and `tsCol` column names.
    */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
           valueCol: String, leftCols: Seq[String]): DataFrame = {
    val keyCols: Seq[Column] = keys.map(col)
    val l = left.select(
      keyCols ++ Seq(col(tsCol), lit(0).as("is_right"), lit(null).cast(
        right.schema(valueCol).dataType).as(valueCol)) ++ leftCols.map(col): _*)
    val r = right.select(
      keyCols ++ Seq(col(tsCol), lit(1).as("is_right"), col(valueCol)) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    // Right rows sort BEFORE left rows at equal ts → `<=` match semantics.
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col(tsCol).asc, col("is_right").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("asof_" + valueCol, last(col(valueCol), ignoreNulls = true).over(w))
      .filter(col("is_right") === 0)
      .select(keyCols ++ Seq(col(tsCol)) ++ leftCols.map(col) :+
        col("asof_" + valueCol): _*)
  }
}
