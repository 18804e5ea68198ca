package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.streaming.Events

/** Streaming window expressions run in batch mode over `events` — the
  * DuckDB-checkable half of the streaming surface (SURVEY.md §5.2.4:
  * batch-equivalence is the oracle strategy; StreamingSpec runs the
  * same transforms under MemoryStream).
  */
object StreamingQueries extends QueryPack {

  override val queries: Map[String, Q] = Map(
    // Tumbling 10-minute windows per event type.
    "q58_tumbling" -> ((s, dir) =>
      Events.tumbling(Tables.events(s, dir), "10 minutes")
        .orderBy("w_start", "event_type")),

    // Sliding 10-minute windows every 5 minutes.
    "q59_sliding" -> ((s, dir) =>
      Events.sliding(Tables.events(s, dir), "10 minutes", "5 minutes")
        .orderBy("w_start")),

    // 30-minute-gap session windows per user.
    "q60_session" -> ((s, dir) =>
      Events.sessions(Tables.events(s, dir), "30 minutes")
        .orderBy("user_id", "s_start"))
  )

  override val oracles: Map[String, String] = Map(
    "q58_tumbling" ->
      """SELECT time_bucket(INTERVAL '10 minutes', ts) AS w_start,
        |  event_type, count(*) AS n, sum(value) AS sum_v
        |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,

    // A width-10 slide-5 window set = the union of 5-minute buckets and
    // the same buckets shifted back one slide: event t belongs to
    // windows starting at bucket5(t) and bucket5(t) - 5 min.
    "q59_sliding" ->
      """SELECT w_start, count(*) AS n FROM (
        |  SELECT time_bucket(INTERVAL '5 minutes', ts) AS w_start FROM events
        |  UNION ALL
        |  SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes' FROM events)
        |GROUP BY w_start ORDER BY w_start""".stripMargin,

    // Sessions as gaps-and-islands: a new session starts when the gap
    // from the previous event of the same user EXCEEDS 30 minutes
    // (strict >: verified empirically on Spark 4.1.2 — session_window
    // MERGES an event arriving exactly gap after the previous one, so
    // [start, last+gap) is closed at the exact-gap boundary for merge
    // purposes); session end = last ts + gap.
    "q60_session" ->
      """WITH marked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              > INTERVAL '30 minutes'
        |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |         THEN 1 ELSE 0 END AS boundary
        |  FROM events),
        |islands AS (
        |  SELECT user_id, ts,
        |    sum(boundary) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked)
        |SELECT min(ts) AS s_start,
        |  max(ts) + INTERVAL '30 minutes' AS s_end,
        |  user_id, count(*) AS n_events
        |FROM islands GROUP BY user_id, sid
        |ORDER BY user_id, s_start""".stripMargin
  )
}
