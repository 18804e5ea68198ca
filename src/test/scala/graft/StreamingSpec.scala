package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.streaming.Events

/** Top-level so Spark can derive an Encoder (inner classes can't be
  * instantiated without the enclosing test's scope).
  */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double)

/** Streaming semantics: batch-equivalence on MemoryStream (SURVEY.md
  * §5.2.4), watermark late-data drop, stateful dedup, arbitrary state.
  * DuckDB can't run watermarks — these properties are the oracle for
  * the streaming-only behaviors.
  */
class StreamingSpec extends SparkSpec {

  private def ev(id: Long, minute: Int, user: Long = 1L,
                 typ: String = "click", v: Double = 1.0) =
    Ev(id, Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00"), user, typ, v)

  test("tumbling window agg: streaming (complete mode) equals batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(ev(1, 1), ev(2, 3), ev(3, 12), ev(4, 14, typ = "view"), ev(5, 25))

    val stream = MemoryStream[Ev]
    val q = Events.tumbling(stream.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("t_tumb")
      .outputMode(OutputMode.Complete()).start()
    stream.addData(rows.take(2))
    q.processAllAvailable()
    stream.addData(rows.drop(2)) // second micro-batch updates open windows
    q.processAllAvailable()
    val streamed = spark.table("t_tumb")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    q.stop()

    val batch = Events.tumbling(rows.toDF(), "10 minutes")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed === batch)
  }

  test("watermark drops events later than the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val agg = stream.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("t_wm")
      .outputMode(OutputMode.Append()).start()

    stream.addData(ev(1, 5)); q.processAllAvailable()
    // Advance event time far ahead → watermark passes the first window.
    stream.addData(ev(2, 50)); q.processAllAvailable()
    // Late arrival INTO the closed first window: must be dropped.
    stream.addData(ev(3, 7)); q.processAllAvailable()
    stream.addData(ev(4, 59)); q.processAllAvailable()
    q.stop()
    val n0 = spark.table("t_wm")
      .filter(col("window.start") === Timestamp.valueOf("2024-01-01 10:00:00"))
      .select("n").collect().map(_.getLong(0))
    // The 10:00 window emitted once with only the on-time event.
    assert(n0.toSeq === Seq(1L))
  }

  test("streaming dedup within watermark equals batch distinct") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(ev(1, 1), ev(1, 1), ev(2, 3), ev(2, 4), ev(3, 5))
    val stream = MemoryStream[Ev]
    val q = Events.dedupWithinWatermark(stream.toDF(), "30 minutes")
      .writeStream.format("memory").queryName("t_dedup")
      .outputMode(OutputMode.Append()).start()
    stream.addData(rows); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("t_dedup").select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(streamed === Seq(1L, 2L, 3L))
  }

  test("arbitrary state: running per-user event count via flatMapGroupsWithState") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val counted = stream.toDS()
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, evs: Iterator[Ev], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + evs.size
          state.update(total)
          Iterator((user, total))
      }
    val q = counted.toDF("user_id", "n")
      .writeStream.format("memory").queryName("t_state")
      .outputMode(OutputMode.Update()).start()
    stream.addData(ev(1, 1, user = 7), ev(2, 2, user = 7), ev(3, 3, user = 9))
    q.processAllAvailable()
    stream.addData(ev(4, 4, user = 7))
    q.processAllAvailable()
    q.stop()
    val last = spark.table("t_state")
      .groupBy("user_id").agg(max("n").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(last === Map(7L -> 3L, 9L -> 1L))
  }

  test("foreachBatch with AvailableNow drains everything then stops, batches union to the batch result") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(ev(1, 1), ev(2, 3), ev(3, 12), ev(4, 25))
    val stream = MemoryStream[Ev]
    stream.addData(rows)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    // foreachBatch: the operational sink (per-batch writes to external
    // systems). AvailableNow processes the backlog then terminates —
    // the batch-job-over-streaming-source deployment mode.
    val q = stream.toDF()
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        batch.collect().foreach(r => seen.add((id, r.getLong(0))))
      }
      .start()
    q.awaitTermination(60000)
    assert(!q.isActive, "AvailableNow query should self-terminate")
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.map(_._2).toSet === rows.map(_.event_id).toSet)
  }

  test("interval join with an empty right stream yields no rows but a valid schema") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ls = MemoryStream[Ev]; val rs = MemoryStream[Ev]
    val joined = Events.intervalJoin(ls.toDF(), rs.toDF(), "20 minutes", "10 minutes")
    assert(joined.columns.toSeq === Seq("l_id", "r_id", "l_user"))
    val q = joined.writeStream.format("memory").queryName("t_ssj_empty")
      .outputMode(OutputMode.Append()).start()
    ls.addData(ev(1, 1), ev(2, 2))
    q.processAllAvailable()
    q.stop()
    assert(spark.table("t_ssj_empty").count() === 0)
    // Batch leg agrees: empty right side → empty inner join.
    assert(Events.intervalJoin(Seq(ev(1, 1)).toDF(),
      Seq.empty[Ev].toDF(), "20 minutes", "10 minutes").count() === 0)
  }

  test("intervalJoin validates its interval strings: compound/fractional pass, signed/prefixed fail") {
    import spark.implicits._
    def build(h: String, w: String) =
      Events.intervalJoin(Seq(ev(1, 1)).toDF(), Seq(ev(2, 2)).toDF(), h, w)
    // Forms Spark accepts must pass the guard (the old regex wrongly
    // rejected compound and fractional strings).
    build("1 minute 30 seconds", "0.5 seconds")
    build("2 hours", "90 seconds")
    // A negative window would silently produce an always-empty join
    // range; an 'interval' prefix would break the INTERVAL splice.
    intercept[IllegalArgumentException](build("20 minutes", "-10 minutes"))
    intercept[IllegalArgumentException](build("interval 20 minutes", "10 minutes"))
    intercept[IllegalArgumentException](build("0 seconds", "10 minutes"))
    intercept[IllegalArgumentException](build("garbage", "10 minutes"))
  }

  test("stream-static anti-join drops indexed keys statelessly; equals the batch anti join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Static "corpus fingerprint index": even event ids are known.
    val index = (0L to 10L by 2).toDF("event_id")
    val rows = (1L to 9L).map(i => ev(i, i.toInt))

    val stream = MemoryStream[Ev]
    val q = Events.antiJoinStatic(stream.toDF(), index, "event_id")
      .writeStream.format("memory").queryName("t_anti")
      .outputMode(OutputMode.Append()).start()
    stream.addData(rows.take(4)); q.processAllAvailable()
    stream.addData(rows.drop(4)); q.processAllAvailable()
    val streamed = spark.table("t_anti").select("event_id")
      .collect().map(_.getLong(0)).toSet
    // The plan must be STATELESS: no streaming state operator at all.
    assert(!q.lastProgress.toString.contains("stateOperators\" : [ {"),
      "anti join against a static side must not create streaming state")
    q.stop()

    val batch = Events.antiJoinStatic(rows.toDF(), index, "event_id")
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(streamed === Set(1L, 3L, 5L, 7L, 9L))
    assert(streamed === batch)
  }

  test("stream-static enrichment join tags rows from the static dim; equals batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "free")).toDF("user_id", "tier")
    val rows = Seq(ev(1, 1, user = 1L), ev(2, 2, user = 2L), ev(3, 3, user = 9L))

    val stream = MemoryStream[Ev]
    val q = Events.enrichFromStatic(stream.toDF(), dim, "user_id")
      .writeStream.format("memory").queryName("t_enrich")
      .outputMode(OutputMode.Append()).start()
    stream.addData(rows); q.processAllAvailable()
    val streamed = spark.table("t_enrich").select("event_id", "tier")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    q.stop()

    val batch = Events.enrichFromStatic(rows.toDF(), dim, "user_id")
      .select("event_id", "tier")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(streamed === Set((1L, Some("gold")), (2L, Some("free")), (3L, None)))
    assert(streamed === batch)
  }

  test("stream-stream interval join equals the batch interval join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = Seq(ev(1, 1), ev(2, 10), ev(3, 30), ev(4, 5, user = 2L))
    val buys = Seq(ev(101, 4, typ = "purchase"), ev(102, 18, typ = "purchase"),
      ev(103, 6, user = 2L, typ = "purchase"), ev(104, 35, typ = "purchase"))

    val ls = MemoryStream[Ev]; val rs = MemoryStream[Ev]
    val q = Events.intervalJoin(ls.toDF(), rs.toDF(), "20 minutes", "10 minutes")
      .writeStream.format("memory").queryName("t_ssj")
      .outputMode(OutputMode.Append()).start()
    // Interleave across micro-batches: pairs must form across batch
    // boundaries from buffered join state, not within one batch only.
    ls.addData(views.take(2)); rs.addData(buys.take(1)); q.processAllAvailable()
    rs.addData(buys.drop(1)); ls.addData(views.drop(2)); q.processAllAvailable()
    val streamed = spark.table("t_ssj")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()

    val batch = Events.intervalJoin(views.toDF(), buys.toDF(), "20 minutes", "10 minutes")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === batch)
    // Sanity on the expected pairs themselves (window = [view, view+10']):
    // user-1 views :01→:04 buy, :10→:18 buy, :30→:35 buy; user-2 :05→:06.
    // The (2,102) pair spans micro-batches: view 2 arrived in batch 1,
    // purchase 102 in batch 2 — it can only come from buffered state.
    assert(batch === Set((1L, 101L), (2L, 102L), (3L, 104L), (4L, 103L)))
  }

  test("stream-stream LEFT OUTER interval join: unmatched lefts emit on watermark expiry; equals batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // view 1 (:01) matches buy 101 (:04); view 2 (:10) has NO buy in
    // [:10, :20] — its NULL-padded row may only emit once the right
    // watermark passes :20, which the flush events force. view 99
    // (:50, the left flush) is excluded from the comparison: its own
    // window never expires.
    val views = Seq(ev(1, 1), ev(2, 10))
    val buys = Seq(ev(101, 4, typ = "purchase"))
    val flushL = ev(99, 50)
    val flushR = ev(199, 55, typ = "purchase")

    val ls = MemoryStream[Ev]; val rs = MemoryStream[Ev]
    val q = Events.intervalJoin(ls.toDF(), rs.toDF(),
        "5 minutes", "10 minutes", "left_outer")
      .writeStream.format("memory").queryName("t_ssj_lo")
      .outputMode(OutputMode.Append()).start()
    ls.addData(views); rs.addData(buys); q.processAllAvailable()
    // Before any watermark movement past :20, the unmatched view 2 must
    // NOT have emitted a NULL row (a partner could still arrive).
    val early = spark.table("t_ssj_lo")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(!early.contains((2L, -1L)),
      "unmatched left emitted before its window could be closed by the watermark")
    ls.addData(flushL); rs.addData(flushR); q.processAllAvailable()
    val streamed = spark.table("t_ssj_lo")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet.filter(_._1 != 99L)
    q.stop()

    val batch = Events.intervalJoin(views.toDF(), buys.toDF(),
        "5 minutes", "10 minutes", "left_outer")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet
    assert(streamed === batch)
    assert(batch === Set((1L, 101L), (2L, -1L)))
  }

  test("stream-static join: streaming events enrich against a static dim") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val stream = MemoryStream[Ev]
    val q = stream.toDF()
      .join(dim, Seq("user_id"), "left")
      .select(col("event_id"), coalesce(col("tier"), lit("none")).as("tier"))
      .writeStream.format("memory").queryName("t_ssj")
      .outputMode(OutputMode.Append()).start()
    stream.addData(ev(1, 1, user = 1), ev(2, 2, user = 2), ev(3, 3, user = 99))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("t_ssj")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "gold", 2L -> "silver", 3L -> "none"))
  }

  test("transformWithState: running max value per user (new Spark 4 state API)") {
    import org.apache.spark.sql.streaming.{StatefulProcessor, TimeMode, TimerValues, TTLConfig}
    import org.apache.spark.sql.streaming.ValueState
    import org.apache.spark.sql.{Encoder, Encoders}
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    class MaxProcessor extends StatefulProcessor[Long, Ev, (Long, Double)] {
      @transient private var maxState: ValueState[Double] = _
      override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
                        timeMode: TimeMode): Unit =
        maxState = getHandle.getValueState[Double]("mx", Encoders.scalaDouble, TTLConfig.NONE)
      override def handleInputRows(key: Long, rows: Iterator[Ev],
                                   timerValues: TimerValues): Iterator[(Long, Double)] = {
        val prev = if (maxState.exists()) maxState.get() else Double.MinValue
        val mx = rows.foldLeft(prev)((acc, e) => math.max(acc, e.value))
        maxState.update(mx)
        Iterator((key, mx))
      }
    }

    // transformWithState requires the RocksDB state store provider.
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[Ev]
      val out = stream.toDS()
        .groupByKey(_.user_id)
        .transformWithState(new MaxProcessor, TimeMode.None(), OutputMode.Update(),
          implicitly[Encoder[(Long, Double)]])
      val q = out.toDF("user_id", "mx")
        .writeStream.format("memory").queryName("t_tws")
        .outputMode(OutputMode.Update()).start()
      stream.addData(ev(1, 1, user = 7, v = 2.0), ev(2, 2, user = 7, v = 5.0))
      q.processAllAvailable()
      stream.addData(ev(3, 3, user = 7, v = 3.0)) // below running max → max stays 5
      q.processAllAvailable()
      q.stop()
      val last = spark.table("t_tws")
        .groupBy("user_id").agg(max("mx").as("mx"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(last === Map(7L -> 5.0))
      // Second batch must still see 5.0 (state survived the batch boundary).
      assert(spark.table("t_tws").count() >= 2)
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("session windows: streaming equals batch on out-of-order input") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(ev(1, 1), ev(3, 45), ev(2, 10), ev(4, 50, user = 2))
    val stream = MemoryStream[Ev]
    val q = Events.sessions(stream.toDF(), "30 minutes")
      .writeStream.format("memory").queryName("t_sess")
      .outputMode(OutputMode.Complete()).start()
    stream.addData(rows); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("t_sess")
      .collect().map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2), r.getLong(3))).toSet
    val batch = Events.sessions(rows.toDF(), "30 minutes")
      .collect().map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("checkpoint recovery: windowed state survives stop/restart; file sink exactly-once vs batch") {
    // The recovery contract a 100 TB operator actually relies on
    // (round-11 verdict #6): a checkpointed stateful query is STOPPED
    // mid-stream — offsets, watermark, and open-window state now live
    // only in the checkpoint — and a NEW query instance on the same
    // checkpoint must (a) resume from the committed offset (no source
    // replay into the sink), (b) restore the open windows' partial
    // counts, and (c) keep the fault-tolerant file sink exactly-once.
    // The load-bearing assertion is the 10:10 window: one event arrives
    // BEFORE the restart and one AFTER, so its count of 2 can only
    // exist if the state store round-tripped through the checkpoint.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_").toString
    val out = java.nio.file.Files.createTempDirectory("graft_rec_sink_").toString
    val stream = MemoryStream[Ev]
    def start() =
      Events.tumbling(stream.toDF().withWatermark("ts", "10 minutes"), "10 minutes")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append()).start()

    val preRestart = Seq(ev(1, 1), ev(2, 3), ev(3, 12))
    val postRestart = Seq(ev(4, 14), ev(5, 55))
    val q1 = start()
    stream.addData(preRestart)
    q1.processAllAvailable()
    q1.stop() // simulated failure after commit

    val q2 = start() // new instance, same checkpoint
    stream.addData(postRestart)
    q2.processAllAvailable()
    // Flush event: advances the watermark past every real window so
    // append mode finalizes them; its own window never closes and is
    // excluded from the oracle below.
    stream.addData(Ev(99L, Timestamp.valueOf("2024-01-01 11:30:00"),
      1L, "click", 1.0))
    q2.processAllAvailable()
    q2.stop()

    val sink = spark.read.parquet(out)
      .collect().map(r => (r.getTimestamp(0), r.getString(1),
        r.getLong(2), r.getDouble(3))).toSet
    val batch = Events.tumbling((preRestart ++ postRestart).toDF(), "10 minutes")
      .collect().map(r => (r.getTimestamp(0), r.getString(1),
        r.getLong(2), r.getDouble(3))).toSet
    assert(sink === batch,
      s"recovered streaming output diverged from the batch oracle: $sink vs $batch")
    assert(sink.exists { case (w, _, n, _) =>
      w == Timestamp.valueOf("2024-01-01 10:10:00") && n == 2L },
      "the restart-spanning 10:10 window must combine pre- and post-restart events")
  }

  test("file-directory source (AvailableNow): dedup+watermark+window pipeline equals batch") {
    // The ingestion shape a real deployment runs (round-12 verdict #5):
    // `readStream` over a parquet DIRECTORY on disk — not MemoryStream —
    // through the stateful dedup-within-watermark THEN tumbling-window
    // chain, drained with Trigger.AvailableNow. The bench drives
    // Events.parquetStream for throughput; this pins its SEMANTICS with
    // the same batch-equivalence contract as the MemoryStream legs.
    //
    // Append mode emits a window only once the watermark passes its
    // end, and the watermark-vs-end boundary comparison is an internal
    // detail we don't pin — so the oracle brackets: every emitted row
    // must equal its batch-computed window exactly, and every window
    // STRICTLY closed by the final watermark (end < max ts − horizon)
    // must have been emitted.
    import org.apache.spark.sql.streaming.Trigger
    val ckpt = java.nio.file.Files.createTempDirectory("graft_filesrc_").toString
    val piped = Events.tumbling(
      Events.dedupWithinWatermark(Events.parquetStream(spark, sfDir), "1 hour"),
      "10 minutes")
    val q = piped.writeStream.format("memory").queryName("t_filesrc")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("t_filesrc")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    val ev = graft.sources.Tables.events(spark, sfDir)
    val batchAll = Events.tumbling(
        Events.dedupWithinWatermark(ev, "1 hour"), "10 minutes")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val wmMs = ev.agg(max("ts")).collect()(0).getTimestamp(0).getTime -
      3600L * 1000
    val strictlyClosed = batchAll.filter { case (w, _, _) =>
      w.getTime + 10 * 60 * 1000 < wmMs }
    assert(streamed.nonEmpty, "file-source stream produced no windows")
    assert(streamed.subsetOf(batchAll),
      s"streamed rows diverge from batch: ${streamed -- batchAll}")
    assert(strictlyClosed.subsetOf(streamed),
      s"watermark-closed windows missing from the stream: ${strictlyClosed -- streamed}")
  }

  test("exactly-once TxTable sink: batch replay is idempotent, restart appends once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.TxTable
    val root = graft.sources.Staging.dir(sfDir, "txsink_stream")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_txsink_").toString
    // v1: a static base the stream appends onto.
    TxTable.create(
      spark.range(0, 100).select(col("id").as("k"), lit("A").as("st"),
        (col("id") * 2).as("c")),
      root, nBuckets = 4)
    def asKsc(df: org.apache.spark.sql.DataFrame) =
      df.select(col("event_id").as("k"), col("event_type").as("st"),
        (col("value") * 100).cast("long").as("c"))
    // Drain batch 0 through the exactly-once sink.
    val s1 = MemoryStream[Ev]
    s1.addData(Seq(ev(9001, 1), ev(9002, 3, typ = "view")))
    val q1 = Events.startTxSink(asKsc(s1.toDF()), root, "sink1", ckpt)
    q1.awaitTermination(60000)
    assert(!q1.isActive)
    val afterB0 = TxTable.snapshot(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(afterB0.size === 102, "base 100 + batch-0's 2 rows")
    assert(afterB0.contains((9001L, "click", 100L)))
    // Simulated failure replay: foreachBatch re-delivers (sink1, 0)
    // (the at-least-once window). The commit log already carries it →
    // no-op, table state unchanged — the exactly-once contract.
    val replay = Seq((9001L, "click", 100L), (9002L, "view", 100L))
      .toDF("k", "st", "c")
    assert(TxTable.appendBatch(spark, root, "sink1", batchId = 0L, replay) === false)
    assert(TxTable.snapshot(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      === afterB0, "replayed batch must not change the table")
    // A second, DIFFERENT sink (its own appId + checkpoint — the
    // contract: appId is 1:1 with the checkpoint) starts at its own
    // batch 0 and must land exactly once, NOT collide with sink1's
    // batch 0 in the log.
    val s2 = MemoryStream[Ev]
    s2.addData(Seq(ev(9003, 7)))
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft_txsink2_").toString
    val q2 = Events.startTxSink(asKsc(s2.toDF()), root, "sink2", ckpt2)
    q2.awaitTermination(60000)
    val finalSet = TxTable.snapshot(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(finalSet === afterB0 + ((9003L, "click", 100L)),
      "second sink must append its batch exactly once")
    // Batch-equivalence: the final table equals the batch-computed
    // union of base and all streamed rows.
    val batchEquiv = (spark.range(0, 100).select(col("id").as("k"),
        lit("A").as("st"), (col("id") * 2).as("c"))
      unionAll Seq((9001L, "click", 100L), (9002L, "view", 100L),
        (9003L, "click", 100L)).toDF("k", "st", "c"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(finalSet === batchEquiv)
  }

  /** Drain the graft-txtable streaming source with AvailableNow into a
    * driver buffer; returns (k, st, c, commit_version) tuples.
    */
  private def drainTxSource(root: String, ckpt: String,
                            options: Map[String, String] = Map.empty)
      : Seq[(Long, String, Long, Long)] = {
    import org.apache.spark.sql.streaming.Trigger
    val buf = scala.collection.mutable.ArrayBuffer[(Long, String, Long, Long)]()
    val reader = spark.readStream.format("graft-txtable").option("root", root)
    options.foreach { case (k, v) => reader.option(k, v) }
    reader.load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = b.collect().map(r =>
          (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        buf.synchronized { buf ++= rows; () }
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
      .awaitTermination(120000)
    buf.toSeq
  }

  test("txtable streaming source: delivery equals snapshot, resume is exactly-once") {
    import graft.sources.TxTable
    val root = graft.sources.Staging.dir(sfDir, "txsrc_stream")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_txsrc_").toString
    TxTable.create(
      spark.range(0, 60).select(col("id").as("k"), lit("A").as("st"),
        (col("id") * 3).as("c")),
      root, nBuckets = 4)
    TxTable.appendBatch(spark, root, "src", 1L,
      spark.range(100, 110).select(col("id").as("k"), lit("B").as("st"),
        col("id").as("c")))
    val run1 = drainTxSource(root, ckpt)
    // Batch-equivalence: the drain delivers exactly the snapshot.
    val snap = TxTable.snapshot(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(run1.map(t => (t._1, t._2, t._3)).toSet === snap)
    assert(run1.map(_._4).distinct.sorted === Seq(1L, 2L),
      "commit_version must label each row with its commit")
    // Post-drain append → the resumed run delivers ONLY the new commit.
    TxTable.appendBatch(spark, root, "src", 2L,
      spark.range(200, 205).select(col("id").as("k"), lit("C").as("st"),
        col("id").as("c")))
    val run2 = drainTxSource(root, ckpt)
    assert(run2.map(t => (t._1, t._4)).toSet ===
      (200L to 204L).map(k => (k, 3L)).toSet,
      "resume must deliver exactly the post-drain commit, once")
  }

  test("txtable streaming source: snapshot bootstrap by default; explicit " +
       "tailing fails on change commits, skips with the option") {
    import spark.implicits._
    import graft.sources.TxTable
    val root = graft.sources.Staging.dir(sfDir, "txsrc_change")
    TxTable.create(
      spark.range(0, 40).select(col("id").as("k"), lit("A").as("st"),
        (col("id") * 2).as("c")),
      root, nBuckets = 4)
    TxTable.merge(spark, root,
      Seq((5L, "X", 0L)).toDF("k", "st", "c")) // v2: a CHANGE commit
    TxTable.appendBatch(spark, root, "chg", 1L,
      Seq((900L, "N", 1L)).toDF("k", "st", "c")) // v3: a plain append
    // DEFAULT = SNAPSHOT BOOTSTRAP (the Delta initial-snapshot
    // semantics, round-14 ADVICE): a history containing a change
    // commit streams fine — the first batch serves the CURRENT live
    // snapshot (merge applied, nothing double-delivered), then tails.
    val ckptBoot = java.nio.file.Files.createTempDirectory("graft_txsrcb_").toString
    val boot = drainTxSource(root, ckptBoot)
    val snapNow = TxTable.snapshot(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(boot.map(t => (t._1, t._2, t._3)).toSet === snapNow,
      "snapshot bootstrap must deliver exactly the live snapshot")
    assert(boot.exists(t => t._1 == 5L && t._2 == "X"),
      "the merged row must carry its POST-merge payload")
    // EXPLICIT TAILING from v1: the change commit poisons the stream —
    // fail, loudly (replaying it as inserts would double-deliver).
    val ckptFail = java.nio.file.Files.createTempDirectory("graft_txsrcf_").toString
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drainTxSource(root, ckptFail, Map("startingVersion" -> "1"))
    }
    assert(e.getCause.getMessage.contains("CHANGE commit"),
      s"unexpected failure: ${e.getCause}")
    // skipChangeCommits=true: v2 is skipped, v1 and v3 still deliver.
    val ckptSkip = java.nio.file.Files.createTempDirectory("graft_txsrcs_").toString
    val got = drainTxSource(root, ckptSkip,
      Map("startingVersion" -> "1", "skipChangeCommits" -> "true"))
    assert(got.map(_._4).distinct.sorted === Seq(1L, 3L),
      "version 2 (the merge) must be skipped, not delivered")
    assert(got.map(_._1).toSet === (0L until 40L).toSet + 900L)
    // startingVersion: begin AFTER the initial snapshot and the merge.
    val ckptSv = java.nio.file.Files.createTempDirectory("graft_txsrcv_").toString
    val tail = drainTxSource(root, ckptSv,
      Map("startingVersion" -> "3"))
    assert(tail.map(t => (t._1, t._4)).toSet === Set((900L, 3L)))
  }

  test("txtable streaming source: maxFilesPerTrigger drains a backlog " +
       "across batches, exactly-once") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    import graft.sources.TxTable
    val root = graft.sources.Staging.dir(sfDir, "txsrc_admission")
    TxTable.create(
      spark.range(0, 20).select(col("id").as("k"), lit("A").as("st"),
        (col("id") * 2).as("c")),
      root, nBuckets = 2)
    // A 4-commit backlog of single-file appends on top of the create.
    (1 to 4).foreach { i =>
      TxTable.appendBatch(spark, root, "adm", i.toLong,
        Seq((1000L + i, "B", i.toLong)).toDF("k", "st", "c"))
    }
    val ckpt = java.nio.file.Files.createTempDirectory("graft_txadm_").toString
    val buf = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    var nBatches = 0
    spark.readStream.format("graft-txtable").option("root", root)
      .option("startingVersion", "2") // tail the 4 appends only
      .option("maxFilesPerTrigger", "1")
      .load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = b.select("k", "commit_version").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        buf.synchronized { buf ++= rows; if (rows.nonEmpty) nBatches += 1; () }
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
      .awaitTermination(120000)
    // Each append added ONE file, so the 1-file budget admits one
    // commit per batch: the backlog must drain across 4 batches —
    // and still deliver every row exactly once.
    assert(nBatches === 4,
      s"a 4-commit backlog at maxFilesPerTrigger=1 must take 4 batches, took $nBatches")
    assert(buf.toSet === (1 to 4).map(i => (1000L + i, (i + 1).toLong)).toSet,
      "admission control must not lose or duplicate rows")
  }

  /** Drain the CHANGE FEED stream (readChangeFeed mode): rows are
    * (change_type, key, st, c, commit_version).
    */
  private def drainTxCdf(root: String, ckpt: String,
                         options: Map[String, String] = Map.empty)
      : Seq[(String, Long, String, Long, Long)] = {
    import org.apache.spark.sql.streaming.Trigger
    val buf = scala.collection.mutable.ArrayBuffer[(String, Long, String, Long, Long)]()
    val reader = spark.readStream.format("graft-txtable").option("root", root)
      .option("readChangeFeed", "true")
    options.foreach { case (k, v) => reader.option(k, v) }
    reader.load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = b.select("_change_type", "k", "st", "c", "commit_version")
          .collect().map(r =>
            (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3),
              r.getLong(4)))
        buf.synchronized { buf ++= rows; () }
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
      .awaitTermination(120000)
    buf.toSeq
  }

  test("txtable streaming CDF source: per-commit images equal the batch " +
       "changeFeed, layout commits skipped, appends stream as inserts") {
    import spark.implicits._
    import graft.sources.TxTable
    val root = graft.sources.Staging.dir(sfDir, "txsrc_cdf")
    TxTable.create(
      spark.range(0, 40).select(col("id").as("k"), lit("A").as("st"),
        (col("id") * 2).as("c")),
      root, nBuckets = 4, changeFeed = true)
    TxTable.merge(spark, root,
      Seq((5L, "X", 999L), (900L, "N", 42L)).toDF("k", "st", "c")) // v2
    TxTable.delete(spark, root, Seq(7L).toDF("k"))                 // v3
    TxTable.appendBatch(spark, root, "cdf", 1L,
      Seq((901L, "P", 1L)).toDF("k", "st", "c"))                   // v4
    TxTable.deleteMor(spark, root, Seq(10L).toDF("k"))             // v5
    TxTable.optimize(spark, root, targetRows = 1000000L)           // v6: layout only
    // Tail the whole change history from v2 on.
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cdf_").toString
    val got = drainTxCdf(root, ckpt, Map("startingVersion" -> "2"))
    // BATCH-EQUIVALENCE: the streamed images equal the batch feed over
    // the same window (1 -> 5; v6 is layout-only and must not appear).
    val batch = TxTable.changeFeed(spark, root, 1, 5)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    assert(got.map(t => (t._1, t._2, t._3, t._4)).toSet === batch,
      "streamed CDF images must equal the batch changeFeed")
    assert(!got.exists(_._5 == 6L), "layout-only commits must be skipped")
    // Per-commit labels: the update pair on v2, the delete on v3, the
    // derived insert on v4, the MOR delete pre-image on v5.
    val byVersion = got.groupBy(_._5)
    assert(byVersion(2L).map(_._1).sorted ===
      Seq("insert", "update_pre", "update_post").sorted)
    assert(byVersion(3L).map(t => (t._1, t._2)) === Seq(("delete", 7L)))
    assert(byVersion(4L).map(t => (t._1, t._2)) === Seq(("insert", 901L)))
    assert(byVersion(5L).map(t => (t._1, t._2)) === Seq(("delete", 10L)))
    // Pre/post payloads: what lets a downstream aggregate retract.
    val v2imgs = got.filter(t => t._5 == 2L && t._2 == 5L)
      .map(t => t._1 -> ((t._3, t._4))).toMap
    assert(v2imgs("update_pre") === (("A", 10L)))
    assert(v2imgs("update_post") === (("X", 999L)))
    // Resume: nothing new -> nothing delivered; a fresh change commit
    // streams its own images only.
    assert(drainTxCdf(root, ckpt).isEmpty)
    TxTable.delete(spark, root, Seq(11L).toDF("k")) // v7
    val resumed = drainTxCdf(root, ckpt)
    assert(resumed.map(t => (t._1, t._2, t._5)) === Seq(("delete", 11L, 7L)))
    // BOOTSTRAP mode (no startingVersion): initial snapshot as inserts.
    val ckptB = java.nio.file.Files.createTempDirectory("graft_cdfb_").toString
    val boot = drainTxCdf(root, ckptB)
    val snap = TxTable.snapshot(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(boot.forall(_._1 == "insert"))
    assert(boot.map(t => (t._2, t._3, t._4)).toSet === snap,
      "CDF bootstrap must serve the live snapshot as inserts")
    // A change commit on a table WITHOUT the feed enabled fails loudly.
    val root2 = graft.sources.Staging.dir(sfDir, "txsrc_cdf_off")
    TxTable.create(
      spark.range(0, 10).select(col("id").as("k"), lit("A").as("st"),
        col("id").as("c")),
      root2, nBuckets = 2)
    TxTable.delete(spark, root2, Seq(3L).toDF("k"))
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft_cdfo_").toString
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drainTxCdf(root2, ckpt2, Map("startingVersion" -> "2"))
    }
    assert(e.getCause.getMessage.contains("no recorded change data"),
      s"unexpected failure: ${e.getCause}")
  }

  test("txtable streaming CDF source: a restore commit streams its inverted images") {
    import spark.implicits._
    import graft.sources.TxTable
    val root = graft.sources.Staging.dir(sfDir, "txsrc_cdf_restore")
    TxTable.create(
      spark.range(0, 30).select(col("id").as("k"), lit("A").as("st"),
        (col("id") * 2).as("c")),
      root, nBuckets = 2, changeFeed = true)
    TxTable.merge(spark, root,
      Seq((5L, "X", 999L), (900L, "N", 42L)).toDF("k", "st", "c")) // v2
    TxTable.deleteMor(spark, root, Seq(7L).toDF("k"))              // v3
    TxTable.restore(spark, root, 1)                                // v4
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cdfr_").toString
    val got = drainTxCdf(root, ckpt, Map("startingVersion" -> "4"))
    // The restore's images are the INVERSE of the v1->v3 feed: the v2
    // insert becomes a delete, the v2 update pair swaps pre/post, the
    // v3 MOR delete becomes an insert.
    assert(got.map(t => (t._1, t._2)).toSet === Set(
      ("delete", 900L), ("update_pre", 5L), ("update_post", 5L),
      ("insert", 7L)))
    val imgs = got.filter(_._2 == 5L).map(t => t._1 -> ((t._3, t._4))).toMap
    assert(imgs("update_pre") === (("X", 999L)),
      "the restore's pre-image is the pre-restore (merged) payload")
    assert(imgs("update_post") === (("A", 10L)),
      "the restore's post-image is the restored (original) payload")
    // And a maintained aggregate folded over the WHOLE feed from v2
    // returns exactly to the v1 state: the restore retracts everything.
    val all = drainTxCdf(root,
      java.nio.file.Files.createTempDirectory("graft_cdfr2_").toString,
      Map("startingVersion" -> "2"))
    val deltaSum = all.map {
      case ("insert", _, _, c, _) => c
      case ("update_post", _, _, c, _) => c
      case ("update_pre", _, _, c, _) => -c
      case ("delete", _, _, c, _) => -c
    }.sum
    assert(deltaSum === 0L, s"the net feed across merge+restore must cancel, got $deltaSum")
  }
}
