package graft

import graft.mr.MapReduceCompat

/** The MapReduce facade must reproduce the reference's contract (map
  * emits KV pairs → group → per-key fold, `program.c:184-445`) without
  * its value-order fragility (SURVEY.md §2.1 bug list).
  */
class MapReduceCompatSpec extends SparkSpec {

  test("reduceByKey word count matches a local fold") {
    import spark.implicits._
    val ds = spark.createDataset(Seq("a b a", "b c", "", "a"))
    val got = MapReduceCompat
      .reduceByKey(ds)(l => l.split(' ').iterator.filter(_.nonEmpty).map(_ -> 1L))(_ + _)
      .collect().toMap
    assert(got === Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("mapReduce reduce sees every value for its key exactly once") {
    import spark.implicits._
    val ds = spark.createDataset(1 to 100)
    // key = parity; reducer sums — order-independent by construction.
    val got = MapReduceCompat
      .mapReduce(ds)(n => Iterator((n % 2).toString -> n.toLong)) {
        (k, vs) => (k, vs.sum)
      }
      .collect().toMap
    assert(got === Map("0" -> (2 to 100 by 2).sum.toLong, "1" -> (1 to 99 by 2).sum.toLong))
  }

  test("empty input produces empty output (no phantom keys)") {
    import spark.implicits._
    val ds = spark.createDataset(Seq.empty[String])
    val got = MapReduceCompat
      .reduceByKey(ds)(l => l.split(' ').iterator.map(_ -> 1L))(_ + _)
      .collect()
    assert(got.isEmpty)
  }
}
