package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.{AsOf, Dedup, Matrix, Similarity, Text}

/** Null-semantics and empty-relation edges (SURVEY.md §5.2.2): the
  * cases the DuckDB differential can't isolate because the harness
  * tables contain neither nulls nor empty inputs.
  */
class EdgeSpec extends SparkSpec {

  private def df(schema: StructType, rows: Row*) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 2), schema)

  private val kv = StructType(Seq(
    StructField("k", IntegerType, nullable = true),
    StructField("v", IntegerType, nullable = true)))

  test("null join keys never match (SQL semantics), including self-join") {
    val l = df(kv, Row(1, 10), Row(null, 20))
    val r = df(kv, Row(1, 100), Row(null, 200))
    assert(l.join(r, l("k") === r("k")).count() === 1)
    assert(l.join(r, l("k") === r("k"), "left").count() === 2) // null row kept, unmatched
  }

  test("aggregates skip nulls; count(*) does not; all-null group sums to null") {
    val d = df(kv, Row(1, null), Row(1, null), Row(2, 5))
    val out = d.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"), count(col("v")).as("nv"),
        collect_list(col("v")).as("l"))
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(out(1).isNullAt(1) && out(1).getLong(2) === 2 && out(1).getLong(3) === 0)
    assert(out(1).getSeq[Int](4).isEmpty) // collect_list drops nulls
    assert(out(2).getLong(1) === 5L) // sum(int) widens to long
  }

  test("empty relation flows through join, window, and aggregation with correct schemas") {
    val e = df(kv) // zero rows
    val joined = e.join(df(kv, Row(1, 1)), Seq("k"))
    assert(joined.count() === 0)
    val w = Window.partitionBy("k").orderBy("v")
    assert(e.withColumn("rn", row_number().over(w)).count() === 0)
    val agg = e.groupBy("k").agg(sum("v")).collect()
    assert(agg.isEmpty) // grouped agg of empty input has no rows (vs global agg: one row)
    assert(e.agg(count(lit(1))).collect()(0).getLong(0) === 0)
  }

  test("as-of join with no matching right rows yields nulls, not dropped rows") {
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType),
      StructField("event_id", LongType)))
    val l = df(schema,
      Row(1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L))
    val rSchema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType),
      StructField("pv", DoubleType)))
    val r = df(rSchema) // empty right side
    val out = AsOf.join(l, r, Seq("user_id"), "ts", "pv", Seq("event_id")).collect()
    assert(out.length === 1)
    assert(out(0).isNullAt(out(0).fieldIndex("asof_pv")))
  }

  test("matmul with disjoint inner dimensions is empty (join semantics)") {
    val a = df(StructType(Seq(StructField("i", IntegerType),
      StructField("j", IntegerType), StructField("v", IntegerType))), Row(0, 0, 1))
    val b = df(StructType(Seq(StructField("j", IntegerType),
      StructField("k", IntegerType), StructField("v", IntegerType))), Row(5, 0, 1))
    assert(Matrix.matmul(a, b).count() === 0)
  }

  test("matmulBlocked rejects sparse input with the dense-contract error, not corrupt output") {
    // A-tile inferred as 1 col (only j=0 present), B-tile as 2 rows
    // (j=0 and j=1): mismatched tile extents must fail loudly.
    val a = df(StructType(Seq(StructField("i", IntegerType),
      StructField("j", IntegerType), StructField("v", IntegerType))),
      Row(0, 0, 1))
    val b = df(StructType(Seq(StructField("j", IntegerType),
      StructField("k", IntegerType), StructField("v", IntegerType))),
      Row(0, 0, 1), Row(1, 0, 1))
    val e = intercept[org.apache.spark.SparkException] {
      Matrix.matmulBlocked(a, b, t = 4).collect()
    }
    assert(e.getMessage.contains("matmulBlocked requires dense input")
      || Option(e.getCause).exists(_.getMessage.contains("matmulBlocked requires dense input")),
      s"unexpected failure: ${e.getMessage}")
  }

  test("minhash of an empty shingle set is the sentinel signature and never collides with content") {
    import spark.implicits._
    val d = Seq((1L, Array.empty[String]), (2L, Array("real shingle")))
      .toDF("id", "sh")
      .select(col("id"), Dedup.minHashSignature(col("sh"), 8).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(d(1L).forall(_ === 2147483647L))
    assert(d(1L) !== d(2L))
  }

  test("letBound preserves null and empty-array semantics of the inlined form") {
    import spark.implicits._
    // shingles routes through Text.letBound; null text → null tokens →
    // null shingles (not a crash, not an empty array), empty/short
    // token arrays → empty shingle array. Same results as the pre-
    // letBound inlined expression.
    val d = Seq((1L, null: String), (2L, ""), (3L, "a b"), (4L, "a b c d"))
      .toDF("id", "text")
      .select(col("id"), Text.shingles(Text.tokens(col("text")), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[String](1))).toMap
    assert(d(1L) === null)
    assert(d(2L) === Seq.empty)
    assert(d(3L) === Seq.empty)
    assert(d(4L) === Seq("a b c", "b c d"))
  }

  test("cosine of a zero-norm vector is 0, not an ANSI divide-by-zero crash") {
    // A bare division here crashed with DIVIDE_BY_ZERO before the
    // guard (found by this test) — and NaN would rank first in
    // descending top-k, so 0 is the contract.
    import spark.implicits._
    val d = Seq((1L, Array(0.0f, 0.0f), Array(1.0f, 2.0f)))
      .toDF("id", "a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("c"))
      .collect()
    assert(d(0).getDouble(0) === 0.0)
  }

  test("two-phase rank and running sum over an EMPTY relation are empty, schema intact") {
    import spark.implicits._
    val empty = Seq.empty[(String, Int, Int)].toDF("k", "id", "t")
    val (ranked, stats) = graft.ops.ScalableRank.rowNumbered(
      empty.select("k", "id"), Seq("k"), Seq(col("id").asc), buckets = 4)
    assert(ranked.count() === 0 && stats.count() === 0)
    assert(ranked.columns.contains("rn"))
    val summed = graft.ops.ScalableRank.runningSummed(
      empty, Seq("k"), Seq(col("id").asc), "t", buckets = 4, run = "cum")
    assert(summed.count() === 0 && summed.columns.contains("cum"))
    val maxed = graft.ops.ScalableRank.runningMaxed(
      empty, Seq("k"), Seq(col("id").asc), "t", buckets = 4)
    assert(maxed.count() === 0 && maxed.columns.contains("runmax"))
  }

  test("running max on a single row is NULL (exclusive frame has no predecessor)") {
    import spark.implicits._
    val one = Seq(("k", 1, 42)).toDF("k", "id", "t")
    val out = graft.ops.ScalableRank.runningMaxed(
      one, Seq("k"), Seq(col("id").asc), "t", buckets = 4).collect()
    assert(out.length === 1 && out.head.isNullAt(out.head.fieldIndex("runmax")))
  }

  test("salted join with an empty side is empty, not an error") {
    import spark.implicits._
    val fact = Seq((1L, 10L)).toDF("k", "v")
    val emptyDim = Seq.empty[(Long, String)].toDF("dk", "name")
    assert(graft.ops.Skew.saltedJoin(fact, "k", emptyDim, "dk", 4,
      saltOn = col("v")).count() === 0)
    val emptyFact = Seq.empty[(Long, Long)].toDF("k", "v")
    val dim = Seq((1L, "d")).toDF("dk", "name")
    assert(graft.ops.Skew.saltedJoin(emptyFact, "k", dim, "dk", 4,
      saltOn = col("v")).count() === 0)
  }

  test("delta-dedup cross candidates with an empty batch are empty, not an error") {
    import spark.implicits._
    val mk = (ids: Seq[Long]) => ids.toDF("doc_id")
      .withColumn("sh", array(concat(lit("t"), col("doc_id"))))
      .withColumn("sig", Dedup.minHashSignature(col("sh"), 8))
    val corpusIdx = Dedup.lshBands(mk(Seq(1L, 2L)), "doc_id", "sig", bands = 2, rows = 4)
    val emptyIdx = Dedup.lshBands(mk(Seq.empty), "doc_id", "sig", bands = 2, rows = 4)
    assert(Dedup.crossCandidates(emptyIdx, corpusIdx, "doc_id").count() === 0)
    assert(Dedup.crossCandidates(corpusIdx, emptyIdx, "doc_id").count() === 0)
  }

  test("count-min sketch of an empty token stream is empty; estimates then find no cells") {
    import spark.implicits._
    val empty = Seq.empty[String].toDF("token")
    val sk = graft.ops.Sketch.cmSketch(empty, "token", 4, 64)
    assert(sk.count() === 0)
    val probes = Seq("x").toDF("token")
    // min over zero matching cells → no row (inner join): an absent
    // token in an empty sketch has no estimate, it is not zero-counted.
    assert(graft.ops.Sketch.cmEstimate(probes, sk, "token", 4, 64).count() === 0)
  }

  test("native shingles of an all-null token array still produce space-joined grams") {
    // concat_ws semantics: nulls are SKIPPED, so a 3-shingle of
    // (null, null, null) is the empty string — same as the HOF form.
    import spark.implicits._
    val d = Seq(Seq[String](null, null, null, null)).toDF("tk")
    val got = d.select(Text.shingles(col("tk"), 3).as("a"),
        Text.shinglesHof(col("tk"), 3).as("b")).collect()(0)
    assert(got.getSeq[String](0) == Seq("", ""))
    assert(got.getSeq[String](0) == got.getSeq[String](1))
  }

  test("session gap boundary: exactly 30 minutes does NOT split; 30m+1s does") {
    // The contract is `ts > prev + 30 min` — an event landing exactly
    // on the boundary continues the session. Single-event users yield
    // a one-event interval with s_start = s_end.
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def at(sec: Long) = new java.sql.Timestamp(t0.getTime + sec * 1000)
    val ev = Seq(
      (1L, 1L, at(0)), (1L, 2L, at(1800)),   // exactly 30m later: same
      (1L, 3L, at(3601)),                     // 30m+1s after #2: split
      (2L, 4L, at(0))                         // singleton user
    ).toDF("user_id", "event_id", "ts")
    val got = graft.queries.AnalyticsQueries.sessionIntervals(ev)
      .orderBy("user_id", "session_idx")
      .collect()
    assert(got.length == 3, s"expected 3 sessions, got ${got.toSeq}")
    val u1 = got.filter(_.getLong(0) == 1L)
    assert(u1(0).getAs[Long]("n_events") == 2L,
      "the exactly-30-minute event must stay in session 1")
    assert(u1(1).getAs[Long]("n_events") == 1L)
    val u2 = got.filter(_.getLong(0) == 2L).head
    assert(u2.getAs[java.sql.Timestamp]("s_start") ==
      u2.getAs[java.sql.Timestamp]("s_end"))
  }

  test("window gate rejects a global window over an unbounded-key aggregate") {
    // Round-12 verdict #2: the old gate exempted any window whose input
    // was an Aggregate — sound for domain-bounded group keys, but a
    // per-user aggregate feeding a GLOBAL window is one row per user:
    // exactly as unbounded as the raw table at 100 TB, and the gate
    // could not prove a future addition wouldn't do it. This pins the
    // rejection (and the acceptance of the two legitimate shapes).
    val ev = graft.sources.Tables.events(spark, sfDir)
    // Defect shape: per-user counts -> global rank over ALL users.
    val bad = ev.groupBy("user_id").agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(Window.orderBy(col("n").desc)))
    assert(WindowCardGate.violations(bad.queryExecution.optimizedPlan).nonEmpty,
      "a global window over a per-user aggregate must violate the gate")
    // Legit shape 1: the same aggregate under a rank FILTER plans a
    // WindowGroupLimit (map-side top-k cap) and passes.
    val limited = bad.filter(col("rk") <= 10)
    assert(WindowCardGate.violations(limited.queryExecution.optimizedPlan).isEmpty,
      "a rank-limited global window must pass via WindowGroupLimit")
    // Legit shape 2: a global window over a BOUNDED-domain aggregate
    // (per-event-type counts: fixed label set) passes.
    val boundedAgg = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(Window.orderBy(col("n").desc)))
    assert(WindowCardGate.violations(boundedAgg.queryExecution.optimizedPlan).isEmpty,
      "a global window over a bounded-domain aggregate must pass")
  }
}
