package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation building blocks (SURVEY.md §2.2 / the 100 TB
  * brief's "salting for skew" path). AQE's skew-join splitting handles
  * join skew at runtime; aggregation hot keys are the case that still
  * needs an explicit rewrite, which [[saltedAggregate]] provides.
  */
object Skew {

  /** Two-phase salted aggregation: rows are spread over `salts`
    * sub-keys (deterministic spread — a stable hash of the whole row's
    * key+payload via `xxhash64`, not `rand()`, so results are
    * reproducible), partially aggregated per (key, salt), then finally
    * combined per key. For a hot key this turns one giant reduce
    * partition into `salts` balanced ones at the cost of a second
    * (tiny — |keys|×salts rows) shuffle.
    *
    * `aggs` must be algebraic (decomposable into partial+final):
    * provide the partial aggregate and the matching final combiner,
    * e.g. partial `sum(x) as s` + final `sum(s)`.
    */
  def saltedAggregate(df: DataFrame, key: Column, salts: Int,
                      partial: Seq[Column], finalAgg: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)), lit(salts)))
    salted
      .groupBy(key.as("__key"), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col("__key"))
      .agg(finalAgg.head, finalAgg.tail: _*)
      .withColumnRenamed("__key", "key")
  }
}
