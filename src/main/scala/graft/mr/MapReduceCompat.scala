package graft.mr

import org.apache.spark.sql.{Dataset, Encoder}

/** Typed MapReduce-compat facade — the reference's phase vocabulary
  * (map → shuffle → group-by-key → reduce, `program.c:479-514`) exposed
  * as a first-class API over Datasets, per SURVEY.md §7.1.
  *
  * A user of the reference writes a mapper that emits KV pairs
  * (`mapperFunction`, `program.c:184-222`) and a reducer that folds each
  * key's value list (`reducerFunction`, `program.c:415-445`). [[mapReduce]]
  * is that exact contract: `map: I => pairs`, `reduce: (K, Iterator[V]) => O`.
  * The shuffle between them is Spark's hash-partitioned exchange — each
  * group moves to exactly one reducer partition, vs the reference's
  * gather-all-to-rank-0 + rebroadcast-all (`program.c:224-296`).
  *
  * Unlike the reference, reducers must not rely on value arrival order
  * (its positional A/B pairing, `program.c:427-435`, is exactly the
  * fragility SURVEY.md §2.1 flags): the Iterator order is
  * non-deterministic, as in real Hadoop.
  *
  * This facade trades whole-stage codegen for API fidelity (mapGroups is
  * an opaque lambda to Catalyst). It is the compat layer, not the engine
  * hot path — equivalent queries should use the declarative operators.
  * [[reduceByKey]] is the efficient variant: a commutative/associative
  * combiner that aggregates map-side before the shuffle, which is what
  * the reference's "combiner" (`program.c:298-311`) was named for but
  * never did (it runs post-shuffle on rank 0 only).
  */
object MapReduceCompat {

  /** Full Hadoop-shaped mapReduce: flatMap → groupByKey → mapGroups. */
  def mapReduce[I, K, V, O](ds: Dataset[I])(map: I => IterableOnce[(K, V)])(
      reduce: (K, Iterator[V]) => O)(implicit
      kv: Encoder[(K, V)], k: Encoder[K], o: Encoder[O]): Dataset[O] =
    ds.flatMap(map)(kv)
      .groupByKey(_._1)(k)
      .mapGroups((key, pairs) => reduce(key, pairs.map(_._2)))(o)

  /** Combiner-enabled variant: map-side partial aggregation (Spark's
    * `reduceGroups` plans a partial+final aggregate), for
    * commutative/associative folds. */
  def reduceByKey[I, K, V](ds: Dataset[I])(map: I => IterableOnce[(K, V)])(
      combine: (V, V) => V)(implicit
      kv: Encoder[(K, V)], k: Encoder[K], v: Encoder[V]): Dataset[(K, V)] =
    ds.flatMap(map)(kv)
      .groupByKey(_._1)(k)
      .mapValues(_._2)(v)
      .reduceGroups(combine)
}
