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
    * The salt MUST be a deterministic function of row content — a
    * physical-position salt (`monotonically_increasing_id`, `rand`)
    * makes the shuffle key unstable under partial stage recomputation
    * (a fetch-failure rerun re-salts rows into different reducers
    * while surviving reducer outputs are kept → silent double-count /
    * loss). Default salt: hash of the full row. Caveat: identical
    * duplicate rows then share a salt, so a hot key whose rows are
    * byte-identical does not spread — pass `saltOn = Some(uniqueCol)`
    * (an id column, or a pre-assigned batch ordinal) when the data has
    * one; that keeps determinism AND spreads duplicates.
    *
    * `aggs` must be algebraic (decomposable into partial+final):
    * provide the partial aggregate and the matching final combiner,
    * e.g. partial `sum(x) as s` + final `sum(s)`.
    */
  def saltedAggregate(df: DataFrame, key: Column, salts: Int,
                      partial: Seq[Column], finalAgg: Seq[Column],
                      saltOn: Option[Column] = None): DataFrame = {
    val saltSrc = saltOn.getOrElse(struct(df.columns.map(col).toIndexedSeq: _*))
    val salted = df.withColumn("__salt", pmod(xxhash64(saltSrc), lit(salts)))
    salted
      .groupBy(key.as("__key"), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col("__key"))
      .agg(finalAgg.head, finalAgg.tail: _*)
      .withColumnRenamed("__key", "key")
  }

  /** Salted shuffle JOIN for a skewed fact key: the fact side spreads
    * each key over `salts` sub-keys (deterministic content hash — same
    * recompute-stability argument as [[saltedAggregate]]; `saltOn`
    * should be a unique column so byte-identical hot rows still
    * spread), the dim side replicates each row `salts` times, and the
    * equi-join runs on (key, salt) — a hot key's rows now land in
    * `salts` reducers instead of one.
    *
    * When to reach for it: AQE's skew-join split handles most cases by
    * splitting oversized partitions AFTER the shuffle files exist; the
    * explicit salt is for the residual class where a SINGLE KEY
    * dominates so hard that even one key's sort run breaks a task
    * (AQE cannot split one key's rows across joins with different
    * semantics) and the dim is too large to broadcast outright but
    * fine to replicate ×salts. Inner/left-outer on the fact side only:
    * dim-side outer semantics would see each dim row `salts` times.
    */
  def saltedJoin(fact: DataFrame, factKey: String, dim: DataFrame,
                 dimKey: String, salts: Int, saltOn: Column): DataFrame = {
    val fs = fact.withColumn("__fsalt", pmod(xxhash64(saltOn), lit(salts.toLong)))
    val ds = dim.withColumn("__dsalt",
      explode(sequence(lit(0L), lit(salts.toLong - 1L))))
    fs.join(ds, fs(factKey) === ds(dimKey) && col("__fsalt") === col("__dsalt"))
      .drop("__fsalt", "__dsalt")
  }
}
