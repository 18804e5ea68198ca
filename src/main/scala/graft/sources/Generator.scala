package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seeded deterministic synthetic source — the engine's analog of the
  * reference's test-data generator (`filecreation.c:7-17`, `rand()%10`
  * dense int matrix), made reproducible (the reference seeds with
  * `time(0)`, so even its own oracle compares against fresh random data;
  * SURVEY.md §3.3).
  *
  * Cell values come from a pure-arithmetic pseudo-random formula
  * `v(id) = ((id*73 + 17 + seed) % 97) % 10` rather than `rand(seed)`:
  * identical BIGINT arithmetic is computable bit-exactly by any SQL
  * engine (the DuckDB oracle included), whereas `rand(seed)`'s stream is
  * engine- and partitioning-specific.
  *
  * Scale: `spark.range` is a parallel, splittable source (one narrow
  * task per range chunk, no driver materialization) — generating a
  * 10^12-cell matrix is embarrassingly parallel.
  */
object Generator {

  /** `rows×cols` dense matrix in COO form `(i INT, j INT, v INT)`,
    * cells in [0,9]. */
  def cooMatrix(s: SparkSession, rows: Int, cols: Int, seed: Int,
                iName: String = "i", jName: String = "j"): DataFrame =
    s.range(rows.toLong * cols)
      .select(
        floor(col("id") / cols).cast("int").as(iName),
        (col("id") % cols).cast("int").as(jName),
        cellValue(col("id"), seed).as("v"))

  /** The deterministic cell formula, shared with [[cooMatrixSql]]. */
  def cellValue(id: org.apache.spark.sql.Column, seed: Int) =
    (((id * 73 + 17 + seed) % 97) % 10).cast("int")

  /** DuckDB-SQL text of the same matrix (oracle side). Column casts and
    * floor() keep integer-division semantics identical: DuckDB `/` on
    * BIGINT is float division and its CAST rounds-to-nearest, so both
    * sides use explicit floor. */
  def cooMatrixSql(rows: Int, cols: Int, seed: Int,
                   iName: String = "i", jName: String = "j"): String =
    s"""SELECT CAST(floor(id/$cols) AS INT) AS $iName,
       |       CAST(id%$cols AS INT) AS $jName,
       |       CAST(((id*73+${17 + seed})%97)%10 AS INT) AS v
       |FROM range(${rows.toLong * cols}) t(id)""".stripMargin
}
