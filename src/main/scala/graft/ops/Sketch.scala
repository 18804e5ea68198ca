package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min frequency sketch (SURVEY §2.2 sketch family, next to the
  * HLL distinct and percentile sketches): d hash rows × w buckets of
  * counts; estimate(x) = min over the d cells x hashes to —
  * an overestimate by construction, within εN with probability 1-δ for
  * w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
  *
  * The cell hash is md5-NIBBLE arithmetic — `instr` of the first two
  * hex chars over the hex alphabet — instead of an engine-private
  * hash: DuckDB and Spark md5 identically, so the whole sketch (not
  * just its estimates) replays bit-exactly in the SQL oracle.
  *
  * Scale: [[sketch]] is a groupBy over (d, bucket) — partial
  * aggregation bounds every map task's state at d·w cells no matter
  * the token volume, and two sketches over disjoint corpora merge by
  * cell-wise sum (count additivity; property-tested in AggSpec).
  */
object Sketch {

  /** Cell coordinate of `token` for hash row `d` (bucket in [0, w)). */
  def cmBucket(token: Column, d: Int, w: Int): Column = {
    val hexes = lit("0123456789abcdef")
    val h = md5(concat(lit(s"cm$d:"), token))
    ((call_function("instr", hexes, substring(h, 1, 1)) - 1) * 16 +
      (call_function("instr", hexes, substring(h, 2, 1)) - 1)) % w
  }

  /** `df` + one (d, b) cell row per hash function — the increment
    * stream feeding [[sketch]], also used to locate probe cells. */
  def cmCells(df: DataFrame, tokenCol: String, d: Int, w: Int): DataFrame =
    df.select(
        col("*"),
        explode(array((0 until d).map(i =>
          struct(lit(i).as("d"), cmBucket(col(tokenCol), i, w).as("b"))): _*)).as("c"))
      .withColumn("d", col("c.d")).withColumn("b", col("c.b")).drop("c")

  /** The d×w sketch of a token stream: (d, b, cnt). */
  def cmSketch(tokens: DataFrame, tokenCol: String, d: Int, w: Int): DataFrame =
    cmCells(tokens, tokenCol, d, w).groupBy("d", "b").agg(count(lit(1)).as("cnt"))

  /** Point estimates for `probes` (must carry `tokenCol`): min over
    * the d cells. Returns probes' columns + `cm_est`. */
  def cmEstimate(probes: DataFrame, sketch: DataFrame, tokenCol: String,
                 d: Int, w: Int): DataFrame = {
    val probeCols = probes.columns.toSeq
    cmCells(probes, tokenCol, d, w)
      .join(sketch, Seq("d", "b"))
      .groupBy(probeCols.map(col): _*)
      .agg(min("cnt").as("cm_est"))
  }
}
