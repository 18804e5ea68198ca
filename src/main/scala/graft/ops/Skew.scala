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
    * sub-keys, partially aggregated per (key, salt), then finally
    * combined per key. For a hot key this turns one giant reduce
    * partition into `salts` balanced ones at the cost of a second
    * (tiny — |keys|×salts rows) shuffle.
    *
    * The salt hashes the row's content PLUS a per-row ordinal
    * (`monotonically_increasing_id`): content alone would send every
    * duplicate of a hot key's repeated payload to the same salt,
    * silently collapsing the spread right where it matters most
    * (duplicate-heavy hot keys). The ordinal depends on physical
    * partitioning, so salt ASSIGNMENT varies across runs — the
    * aggregation RESULT does not (the final combine merges all salts;
    * as with any Spark shuffle, non-associative float effects are
    * bounded to ulps).
    *
    * `aggs` must be algebraic (decomposable into partial+final):
    * provide the partial aggregate and the matching final combiner,
    * e.g. partial `sum(x) as s` + final `sum(s)`.
    */
  def saltedAggregate(df: DataFrame, key: Column, salts: Int,
                      partial: Seq[Column], finalAgg: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*),
        monotonically_increasing_id()), lit(salts)))
    salted
      .groupBy(key.as("__key"), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col("__key"))
      .agg(finalAgg.head, finalAgg.tail: _*)
      .withColumnRenamed("__key", "key")
  }
}
