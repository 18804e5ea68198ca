package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Text
import graft.sources.Tables

/** Retrieval and event-analytics composites (round 8): BM25 scoring,
  * substring-level duplication audit, funnel / cohort-retention /
  * sessionization / SCD-2 over the event log, and corpus-drift KL
  * divergence — the operations a production corpus sits next to
  * (search quality, product analytics, warehouse dimensioning) that
  * the engine should express with the same scale discipline as the
  * core relational surface.
  *
  * Scale notes (the 100 TB contract):
  *   - every shuffle here keys on an unbounded-cardinality column
  *     (doc_id, user_id, token, shingle) — no low-card window
  *     partitions, no driver loops;
  *   - corpus-level scalars (N, avgdl, vocab size) ride as 1-row
  *     broadcast aggregates inside the plan (the q54/q98 pattern), so
  *     no query pays a second scan or a driver sync for a count;
  *   - float aggregation that must hash-match DuckDB uses the
  *     engine-portable 9-dp half-up quantization (floor(x·10⁹+0.5),
  *     summed as BIGINT — order-independent), per q101/q95.
  */
object AnalyticsQueries extends QueryPack {

  /** BM25 hyperparameters (the Robertson/Walker defaults). */
  private val K1 = 1.2
  private val B  = 0.75

  /** Session-scoped memo key for the persisted postings index (same
    * contract as LlmQueries' IVF index state): (session identity, sf
    * dir) of the last build, so repeated probes skip the build but a
    * new session or data dir rebuilds. */
  private val postingsState =
    new java.util.concurrent.atomic.AtomicReference[(String, String)](null)

  /** Bench hook: force the next ensurePostings to rebuild (cold-rep
    * policy — see Bench.resetMemoizedState). */
  def resetPostingsState(): Unit = postingsState.set(null)

  /** Build-once inverted index for the BM25 surface: `graft_postings`
    * (token, doc_id, tf, dl) BUCKETED ON token — the classic
    * search-engine posting with the length norm denormalized into the
    * row, so a probe needs NO join back to the corpus — plus the 1-row
    * `graft_bm25_stats` (N, avgdl). At 100 TB this is the layout job
    * you run once per corpus snapshot; bucket pruning turns a probe's
    * token-IN filter into a read of only the buckets holding the query
    * terms.
    */
  private def ensurePostings(s: org.apache.spark.sql.SparkSession, dir: String): Unit =
    postingsState.synchronized {
      val key = (s.sparkContext.applicationId + "/" + System.identityHashCode(s), dir)
      val cached = postingsState.get == key &&
        s.catalog.tableExists(graft.sources.Staging.appTable(s, "graft_postings")) &&
        s.catalog.tableExists(graft.sources.Staging.appTable(s, "graft_bm25_stats"))
      if (!cached) {
        Seq(graft.sources.Staging.appTable(s, "graft_postings"), graft.sources.Staging.appTable(s, "graft_bm25_stats"))
          .foreach(graft.sources.Staging.dropManagedTable(s, _))
        val docs = Tables.documents(s, dir)
        val toks = docs.select(col("doc_id"),
          explode(Text.tokens(col("text"))).as("token"))
        val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
        val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
        tf.join(dl, "doc_id")
          .select("token", "doc_id", "tf", "dl")
          .write.mode("overwrite")
          .bucketBy(8, "token").sortBy("token")
          .saveAsTable(graft.sources.Staging.appTable(s, "graft_postings"))
        dl.agg(count(lit(1)).as("n"),
            (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
          .write.mode("overwrite").saveAsTable(graft.sources.Staging.appTable(s, "graft_bm25_stats"))
        postingsState.set(key)
      }
    }

  /** The standing query for the BM25 surface: three mid-frequency
    * corpus terms. A real system would parameterize; the registry
    * needs a deterministic instance. */
  private val Bm25Terms = Seq("join", "hash", "vector")

  /** floor(x·10⁹ + 0.5) as BIGINT — the portable half-up quantizer
    * (round() rounds half-to-even in some engines; floor does not). */
  private def q9(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(c * lit(1e9) + lit(0.5)).cast("long")

  /** The 30-minute-gap session contract, ONCE: per (user_id,
    * session_idx), [s_start, s_end] = first/last event ts (inclusive
    * end). Shared by q130 (the operator surface), q177 (concurrency
    * sweep), and q190 (interval join) so the session definition cannot
    * drift between the queries that SURVEY documents as running on the
    * same intervals — AnalyticsSpec's q177 test derives its expected
    * peak from q130's output and silently depends on this. No lineage
    * cut here: single-consumer callers (q130, q190) shouldn't pay a
    * materialization; q177 cuts at its own fan-out point. */
  private[graft] def sessionIntervals(
      ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev.withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull ||
          col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum("is_new").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_idx")
      .agg(min("ts").as("s_start"), max("ts").as("s_end"),
        count(lit(1)).as("n_events"))
  }

  /** Oracle-side twin of [[sessionIntervals]] (the AggQueries
    * shared-fragment pattern): CTEs `flagged`/`sess`/`intervals`
    * producing (user_id, session_idx, s_start, s_end, n_events). */
  private[queries] val SessionIntervalsSql: String =
    """flagged AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |      OR ts > lag(ts) OVER w + INTERVAL '30 minutes'
      |    THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT user_id,
      |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx, ts
      |  FROM flagged),
      |intervals AS (
      |  SELECT user_id, session_idx, min(ts) AS s_start, max(ts) AS s_end,
      |    count(*) AS n_events
      |  FROM sess GROUP BY user_id, session_idx)""".stripMargin

  /** Per-(doc, term) BM25 contribution over columns tf/df/dl/n/avgdl,
    * 9-dp quantized: shared by the scan-side q126 and the index-side
    * q134 so the two surfaces are score-identical by construction. */
  private def bm25C9: org.apache.spark.sql.Column = {
    val idf9 = floor(log(lit(1.0) +
      (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) * lit(1e9) +
      lit(0.5)) / lit(1e9)
    val tfPart = col("tf").cast("double") * lit(K1 + 1.0) /
      (col("tf").cast("double") +
        lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl")))
    q9(idf9 * tfPart)
  }

  /** 8-bit × 8-bit Morton (Z-order) interleave as portable SQL
    * arithmetic — bit i of `x` lands on z-bit 2i, bit i of `y` on
    * z-bit 2i+1, via floor-divide/mod only (no engine-specific bit
    * operators), so the SAME generated string runs under Spark's
    * expr() and the DuckDB oracle. */
  private def zInterleaveSql(x: String, y: String): String =
    (0 until 8).map { i =>
      val p = 1L << i
      s"((CAST(floor($x/$p) AS BIGINT)%2)*${1L << (2 * i)}" +
        s" + (CAST(floor($y/$p) AS BIGINT)%2)*${1L << (2 * i + 1)})"
    }.mkString(" + ")

  /** Scored (doc_id, c9) rows → the top-20 result contract shared by
    * q126 and q134. */
  private def bm25TopK(scored: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    scored.groupBy("doc_id").agg(sum("c9").as("score9"))
      .select(col("doc_id"), col("score9"),
        (col("score9") / lit(1e9)).as("score"))
      .orderBy(col("score9").desc, col("doc_id"))
      .limit(20)

  /** q253's ten NDCG position weights 1/log2(i+1), half-up 1e-9
    * quantized ONCE Scala-side and embedded as the same integer
    * literals in both engines. */
  private val NdcgW9: Seq[Long] = (1 to 10)
    .map(i => math.floor(1e9 / (math.log(i + 1.0) / math.log(2.0)) + 0.5).toLong)

  override val queries: Map[String, Q] = Map(

    // q280: APPROXIMATE FUNCTIONAL-DEPENDENCY DISCOVERY — the
    // data-profiling operator (Metanome/Deequ class) behind schema
    // inference and key detection: for each declared candidate X → Y,
    // the g3 error = n − Σ_x max_y count(x, y) (the minimum number of
    // rows to delete for the FD to hold exactly). ONE pass per pair:
    // a column-pruned (x, y) count aggregate, a per-x max+sum, and a
    // 1-row rollup — keep AND n come from the same aggregate chain so
    // the ratio can't desync. All-integer until the final quantized
    // error ratio; `holds` is an exact violations = 0 test. Candidate
    // pairs span a trivially-exact key FD (doc_id → source), a
    // near-FD (source → lang, 56% violated at sf0.01), and two
    // clearly-violated fact-table pairs. Per-pair branches union (the
    // q252 lesson: one pruned scan per column pair beats a single
    // multi-distinct expand).
    "q280_fd_discovery" -> ((s, dir) => {
      def g3(tab: org.apache.spark.sql.DataFrame, xc: String, yc: String,
             label: String) = {
        val c = tab.select(col(xc).as("x"), col(yc).as("y"))
          .groupBy("x", "y").agg(count(lit(1)).as("c"))
        c.groupBy("x").agg(max("c").as("mc"), sum("c").as("nx"))
          .agg(sum("mc").as("keep"), sum("nx").as("n"),
            count(lit(1)).as("n_x"))
          .select(lit(label).as("fd"), col("n"), col("n_x"),
            (col("n") - col("keep")).as("violations"),
            floor((col("n") - col("keep")).cast("double") /
              col("n").cast("double") * 1e9 + 0.5).cast("long")
              .as("g3_err9"),
            (col("n") === col("keep")).cast("int").as("holds"))
      }
      val d = Tables.documents(s, dir)
      val li = Tables.lineitem(s, dir)
      g3(d, "doc_id", "source", "doc_id->source")
        .unionAll(g3(d, "source", "lang", "source->lang"))
        .unionAll(g3(d, "lang", "source", "lang->source"))
        .unionAll(g3(li, "l_orderkey", "l_linestatus", "l_orderkey->l_linestatus"))
        .unionAll(g3(li, "l_suppkey", "l_returnflag", "l_suppkey->l_returnflag"))
        .orderBy("fd")
    }),

    // q253: NDCG@10 OF THE BM25 RANKING — the retrieval-eval closer
    // for the q126/q134/q137/q180/q210 family: graded relevance =
    // number of distinct query terms a document contains (0–3, derived
    // from the data, no side labels), DCG@10 of q126's ranking vs the
    // ideal ordering, with gains 2^rel − 1 and the ten 1/log2(i+1)
    // position weights as shared 1e-9 integer literals — dcg/idcg are
    // exact BIGINTs, NDCG one double division. Ranks are assigned by a
    // 10×10 self-join peer count on the LIMITED tables (window-free:
    // a global rank window here would be the q21 class; the limit
    // makes the join constant-size). Corpus work is q126's scoring
    // shape; both rank joins and the gain lattice are constant-size.
    "q253_ndcg" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val toks = docs.select(col("doc_id"),
        explode(Text.tokens(col("text"))).as("token"))
      val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val stats = broadcast(dl.agg(count(lit(1)).as("n"),
        (sum("dl").cast("double") / count(lit(1))).as("avgdl")))
      val qtoks = toks.filter(col("token").isin(Bm25Terms: _*))
      val df = broadcast(qtoks.select("doc_id", "token").distinct()
        .groupBy("token").agg(count(lit(1)).as("df")))
      val tf = qtoks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      val scored = tf.join(df, "token").join(dl, "doc_id").crossJoin(stats)
        .select(col("doc_id"), bm25C9.as("c9"))
        .groupBy("doc_id").agg(sum("c9").as("score9"))
      val rel = qtoks.select("doc_id", "token").distinct()
        .groupBy("doc_id").agg(count(lit(1)).as("rel"))
      def rank10(t: org.apache.spark.sql.DataFrame, ord: String)
          : org.apache.spark.sql.DataFrame = {
        val top = t.orderBy(col(ord).desc, col("doc_id")).limit(10)
          .localCheckpoint(false) // 10 rows, feeds both rank-join legs
        top.as("a").join(top.as("b"),
            col("b." + ord) > col("a." + ord) ||
              (col("b." + ord) === col("a." + ord) &&
                col("b.doc_id") <= col("a.doc_id")))
          .groupBy(col("a.doc_id").as("doc_id"))
          .agg(count(lit(1)).as("rk"))
      }
      val gain = expr("shiftleft(1L, cast(rel as int)) - 1")
      val w = element_at(typedLit(NdcgW9), col("rk").cast("int"))
      val dcg = rank10(scored, "score9").join(rel, "doc_id")
        .agg(sum(gain * w).as("dcg9"))
      val idcg = rank10(rel, "rel").join(rel, "doc_id")
        .agg(sum(gain * w).as("idcg9"))
      dcg.crossJoin(broadcast(idcg))
        .select(col("dcg9"), col("idcg9"),
          (col("dcg9").cast("double") / col("idcg9").cast("double"))
            .as("ndcg"))
    }),

    // q252: COLUMN PROFILE (ANALYZE TABLE report) — the per-column
    // statistics sweep a warehouse runs before planning/migrations:
    // null count, EXACT distinct count, min/max per column, one
    // column-pruned branch per column (on columnar storage each
    // branch reads exactly its one column — same bytes as a single
    // pass, and each exact-distinct aggregate shuffles only that
    // narrow column; the single-aggregate multi-distinct alternative
    // expands every row ×|columns| and measured 10× slower at sf1).
    // Every min/max renders through a deterministic type (integers,
    // strings, DATE, cents BIGINT for the double column) so the
    // stringified report hash-matches cross-engine. Output is the
    // |columns|-row report.
    "q252_column_profile" -> ((s, dir) => {
      val cols: Seq[(String, org.apache.spark.sql.Column)] = Seq(
        ("o_orderkey", col("o_orderkey")),
        ("o_custkey", col("o_custkey")),
        ("o_orderstatus", col("o_orderstatus")),
        ("o_totalprice_cents",
          floor(col("o_totalprice") * 100 + 0.5).cast("long")),
        ("o_orderdate", col("o_orderdate").cast("date")),
        ("o_orderpriority", col("o_orderpriority")))
      val o = Tables.orders(s, dir)
      cols.map { case (n, c) =>
        o.select(c.as("c")).agg(
          count(lit(1)).as("n_rows"),
          sum(col("c").isNull.cast("long")).as("n_nulls"),
          countDistinct(col("c")).as("n_distinct"),
          min(col("c")).cast("string").as("min_str"),
          max(col("c")).cast("string").as("max_str"))
          .select(lit(n).as("column_name"), col("n_rows"), col("n_nulls"),
            col("n_distinct"), col("min_str"), col("max_str"))
      }.reduce(_ unionAll _)
        .orderBy("column_name")
    }),

    // q247: KAPLAN-MEIER SURVIVAL — time from signup to first
    // subsequent purchase with right-censoring at the observation
    // horizon: the estimator behind every retention/conversion curve
    // that can't just drop non-converters. Per-day factors
    // (1 − d_i/n_i) are kept in LOG space: each day's
    // ln((n_risk − d)/n_risk) is ONE exact-integer ratio → division →
    // ln → half-up 1e-9 quantization (q101 class), and the survival
    // curve is the BIGINT cumulative sum of those terms — no ordered
    // product of doubles anywhere. Scale: two user_id-keyed aggregates
    // (signup, first post-signup purchase) collapse the corpus; the
    // risk-set arithmetic and cumulative window run on the
    // calendar-bounded day table. The d = n_risk "curve hits zero"
    // edge gets a documented −50e9 sentinel term (ln 0 is −∞),
    // mirrored in the oracle — and genuinely reached at sf0.001,
    // where every signed-up user converts by the horizon.
    "q247_kaplan_meier" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val su = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts").as("s0"))
      val conv = ev.filter(col("event_type") === "purchase")
        .select("user_id", "ts")
        .join(su, "user_id").filter(col("ts") >= col("s0"))
        .groupBy("user_id").agg(min("ts").as("p0"))
      val maxD = broadcast(ev.agg(max(col("ts").cast("date")).as("dmax")))
      val subjects = su.join(conv, Seq("user_id"), "left").crossJoin(maxD)
        .select(
          when(col("p0").isNotNull,
            datediff(col("p0").cast("date"), col("s0").cast("date")))
            .otherwise(datediff(col("dmax"), col("s0").cast("date")))
            .cast("long").as("t"),
          col("p0").isNotNull.cast("long").as("ev"))
      val byT = subjects.groupBy("t").agg(sum("ev").as("d"),
        sum(lit(1L) - col("ev")).as("c"))
      val nTot = broadcast(byT.agg(sum(col("d") + col("c")).as("n")))
      val w = Window.orderBy("t")
      byT.crossJoin(nTot)
        .withColumn("n_risk",
          col("n") - (sum(col("d") + col("c")).over(w) - (col("d") + col("c"))))
        .withColumn("term9",
          when(col("d") === 0L, lit(0L))
            .when(col("d") < col("n_risk"),
              floor(log((col("n_risk") - col("d")).cast("double") /
                col("n_risk").cast("double")) * 1e9 + 0.5).cast("long"))
            .otherwise(lit(-50000000000L)))
        .withColumn("log_s9", sum("term9").over(w))
        .select(col("t"), col("n_risk"), col("d"), col("c"), col("log_s9"))
        .orderBy("t")
    }),

    // q268: WEEK-OVER-WEEK GROWTH — the BI staple: weekly revenue per
    // event type with lag-1 growth, the zero-denominator case
    // null-guarded (nullif — ANSI faults a bare division). One
    // (type, week) aggregate; the lag runs per type over the
    // calendar-bounded weekly table (aggregated input). Growth is one
    // double division per cell.
    "q268_wow_growth" -> ((s, dir) => {
      val weekly = Tables.events(s, dir)
        .groupBy(col("event_type").as("t"),
          date_trunc("week", col("ts")).cast("date").as("wk"))
        .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents"))
      val w = Window.partitionBy("t").orderBy("wk")
      weekly.withColumn("prev", lag("cents", 1).over(w))
        .select(col("t").as("event_type"), col("wk"), col("cents"),
          col("prev"),
          ((col("cents") - col("prev")).cast("double") /
            nullif(col("prev"), lit(0L)).cast("double")).as("wow_growth"))
        .orderBy("event_type", "wk")
    }),

    // q269: FRESHNESS / STALENESS AUDIT — pipeline observability: per
    // fact table, the watermark (max event time), its lag behind the
    // corpus-wide horizon in whole seconds, and the row count inside
    // the trailing 24 h — the dashboard every ingestion pipeline
    // watches. One aggregate per table plus a filtered count; the
    // horizon is a 1-row broadcast.
    "q269_freshness_audit" -> ((s, dir) => {
      def leg(name: String, df: org.apache.spark.sql.DataFrame,
              tsCol: String) = {
        val ag = df.agg(max(col(tsCol)).as("watermark"),
          count(lit(1)).as("n_rows"))
        val recent = df.select(col(tsCol).as("ts2")).crossJoin(ag)
          .filter(col("ts2").cast("long") >= col("watermark").cast("long") - 86400L)
          .agg(count(lit(1)).as("n_last_24h"))
        ag.crossJoin(recent)
          .select(lit(name).as("table_name"), col("watermark"),
            col("n_rows"), col("n_last_24h"))
      }
      leg("events", Tables.events(s, dir), "ts")
        .unionAll(leg("orders", Tables.orders(s, dir), "o_orderdate"))
        .unionAll(leg("lineitem", Tables.lineitem(s, dir), "l_shipdate"))
        .orderBy("table_name")
    }),

    // q270: JAIN'S FAIRNESS INDEX — the load-balance metric for the
    // q195/q241 placement family: J = (Σx)²/(n·Σx²) over the HRW node
    // loads (1 = perfectly even, 1/n = one hot node). Loads are the
    // 16-node HRW assignment (q241's PRE-expansion fleet — q241 itself
    // measures the move set when a 17th node joins) recomputed
    // in-plan; the index is one double
    // dag over three exact BIGINTs (Σx, Σx², n — x² ≤ (keys/node)²,
    // DECIMAL(38,0) for headroom). Constant-size after the per-key
    // arg-max aggregate.
    "q270_jain_fairness" -> ((s, dir) => {
      val nodes = s.range(0, 16).select(col("id").as("node"))
      val loads = Tables.customer(s, dir).select(col("c_custkey").as("k"))
        .join(broadcast(nodes), lit(true))
        .select(col("k"), col("node"),
          conv(substring(md5(concat(lit("hrw:"), col("node"), lit(":"),
            col("k"))), 1, 15), 16, 10).cast("long").as("score"))
        .groupBy("k")
        .agg(max(struct(col("score"), col("node"))).as("m"))
        .groupBy(col("m.node").as("node")).agg(count(lit(1)).as("x"))
      val xD = col("x").cast("decimal(38,0)")
      loads.agg(count(lit(1)).as("n"), sum("x").as("sx"),
          sum(xD * xD).as("sxx"))
        .select(col("n"), col("sx"), col("sxx").cast("long").as("sxx"),
          (col("sx").cast("double") * col("sx").cast("double") /
            (col("n").cast("double") * col("sxx").cast("double")))
            .as("jain"))
    }),

    // q271: ACTIVITY STREAKS — longest run of consecutive active days
    // per user (gaps-and-islands at day granularity — the engagement
    // metric sessionization's minute-scale gaps don't give): island id
    // = day − dense day-rank per user (constant within a run), max run
    // length per user, then the corpus-wide streak distribution. Both
    // windows key on user_id (unbounded); output is bounded by the
    // calendar span.
    "q271_activity_streaks" -> ((s, dir) => {
      val days = Tables.events(s, dir)
        .select(col("user_id"),
          datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
            .cast("long").as("d"))
        .distinct()
      val w = Window.partitionBy("user_id").orderBy("d")
      val streaks = days
        .withColumn("island", col("d") - row_number().over(w))
        .groupBy("user_id", "island").agg(count(lit(1)).as("len"))
        .groupBy("user_id").agg(max("len").as("best_streak"))
      streaks.groupBy("best_streak").agg(count(lit(1)).as("n_users"))
        .orderBy("best_streak")
    }),

    // q266: KWIC SNIPPET EXTRACTION — the retrieval-UX operator the
    // BM25 stack needs after ranking: a keyword-in-context window
    // around the first hit of the query term, entirely in codegen'd
    // string built-ins (instr is 1-based and 0-on-miss on BOTH
    // engines; the left clamp keeps the window in range). Narrow
    // per-row work, TakeOrderedAndProject; snippet boundaries are
    // deterministic character arithmetic, so the strings hash-match.
    "q266_kwic_snippets" -> ((s, dir) => {
      val pos = instr(col("text"), "vector")
      Tables.documents(s, dir)
        .select(col("doc_id"), pos.as("pos"), col("text"))
        .filter(col("pos") > 0)
        .select(col("doc_id"), col("pos"),
          substring(col("text"),
            greatest(col("pos") - 20, lit(1)).cast("int"), lit(50))
            .as("snippet"))
        .orderBy("doc_id")
        .limit(25)
    }),

    // q263: FREQUENT EVENT TRIGRAMS — the order-3 sequential-pattern
    // rollup q143's Markov transitions (order 1) don't capture: each
    // user's time-ordered event stream yields consecutive type
    // triples via two lags over the user_id-keyed window (unbounded
    // partition key, two rows of state), counted globally and
    // top-20'd with support share. The share divides two exact
    // BIGINTs once per output row. No per-user buffering, no
    // low-card windows; TakeOrderedAndProject for the top-k.
    "q263_event_trigrams" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val tri = Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("e3"))
        .withColumn("e2", lag("e3", 1).over(w))
        .withColumn("e1", lag("e3", 2).over(w))
        .filter(col("e1").isNotNull)
        .groupBy("e1", "e2", "e3").agg(count(lit(1)).as("support"))
        .localCheckpoint(false) // feeds total + top-k
      val tot = broadcast(tri.agg(sum("support").as("n_tri")))
      tri.crossJoin(tot)
        .select(concat_ws(">", col("e1"), col("e2"), col("e3"))
            .as("pattern"),
          col("support"),
          (col("support").cast("double") / col("n_tri").cast("double"))
            .as("share"))
        .orderBy(col("support").desc, col("pattern"))
        .limit(20)
    }),

    // q264: MAD ROBUST OUTLIERS — median absolute deviation, the
    // robust scale the z-score family (q144) lacks: med and
    // MAD = median(|x − med|) both computed EXACTLY on the
    // cents-DOMAIN-bounded value-count table (the q219 shape — two
    // bounded cumulative windows, no sort of the corpus), and the
    // outlier rule |x − med|·10000 > 3·1.4826·10⁴·MAD compares
    // CROSS-MULTIPLIED integers (44478 = ⌊3·1.4826·10⁴⌋ — no double
    // anywhere in the flag). Output: med, mad, outlier count and
    // rate.
    "q264_mad_outliers" -> ((s, dir) => {
      val cents = Tables.orders(s, dir)
        .select(floor(col("o_totalprice") * 100 + 0.5).cast("long").as("v"))
      def medianOf(vc: org.apache.spark.sql.DataFrame)
          : org.apache.spark.sql.DataFrame = {
        // Lower median: smallest v with cum·2 ≥ n.
        val tot = broadcast(vc.agg(sum("cnt").as("n")))
        vc.withColumn("cum", sum("cnt").over(Window.orderBy("v")))
          .crossJoin(tot)
          .filter(col("cum") * 2 >= col("n"))
          .agg(min("v").as("med"))
      }
      // No checkpoint: both consumers re-aggregate the scan (a
      // checkpoint here would hide the aggregate lineage from the
      // window gate — the q239 class).
      val vc = cents.groupBy("v").agg(count(lit(1)).as("cnt"))
      val med = broadcast(medianOf(vc))
      val dev = vc.crossJoin(med)
        .select(abs(col("v") - col("med")).as("v"), col("cnt"))
        .groupBy("v").agg(sum("cnt").as("cnt"))
      val mad = broadcast(medianOf(dev).withColumnRenamed("med", "mad"))
      cents.crossJoin(med).crossJoin(mad)
        .select(col("med"), col("mad"),
          (abs(col("v") - col("med")) * 10000L >
            lit(44478L) * col("mad")).cast("long").as("is_out"))
        .agg(min("med").as("med"), min("mad").as("mad"),
          count(lit(1)).as("n_rows"), sum("is_out").as("n_outliers"))
        .select(col("med"), col("mad"), col("n_rows"), col("n_outliers"),
          (col("n_outliers").cast("double") / col("n_rows").cast("double"))
            .as("outlier_rate"))
    }),

    // q265: COHORT LTV CURVE — cumulative revenue per signup cohort
    // over weeks-since-signup: the monetized half of q129's retention
    // matrix. Users keyed by signup week, their purchase values
    // rolled into (cohort, week-offset) cents cells, then ONE
    // cumulative window per cohort over the CALENDAR-bounded cohort ×
    // offset grid. Per-user-normalized LTV divides two exact BIGINTs
    // once per cell. Corpus work: one user aggregate + one
    // (cohort, offset) aggregate.
    "q265_cohort_ltv" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val cohort = ev.filter(col("event_type") === "signup")
        .groupBy("user_id")
        .agg(date_trunc("week", min("ts")).cast("date").as("cw"))
      val sizes = cohort.groupBy("cw").agg(count(lit(1)).as("n_users"))
      val cells = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        .join(cohort, "user_id")
        .filter(col("ts") >= col("cw"))
        .groupBy(col("cw"),
          floor(datediff(col("ts").cast("date"), col("cw")) / 7)
            .cast("long").as("wk"))
        .agg(sum("cents").as("rev"))
      cells
        .withColumn("cum_rev",
          sum("rev").over(Window.partitionBy("cw").orderBy("wk")))
        .join(broadcast(sizes), "cw")
        .select(col("cw").as("cohort_week"), col("wk"), col("rev"),
          col("cum_rev"),
          (col("cum_rev").cast("double") / col("n_users").cast("double"))
            .as("ltv_per_user"))
        .orderBy("cohort_week", "wk")
    }),

    // q258: WINBACK / RESURRECTION ANALYSIS — the retention-team
    // question q129's cohort matrix doesn't answer: who went SILENT
    // for ≥ 48 h and then came back, counted by return day. One lag
    // over the user_id-keyed event stream (unbounded partition key,
    // per-user state bounded by activity), gap tested in exact epoch
    // seconds, then a day-keyed aggregate of resurrection events and
    // distinct resurrected users. No windows over low-card keys, no
    // per-user buffering beyond the single lag row.
    "q258_winback" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("prev", lag("ts", 1).over(w))
        .filter(col("prev").isNotNull &&
          col("ts").cast("long") - col("prev").cast("long") >= 172800L)
        .groupBy(col("ts").cast("date").as("return_day"))
        .agg(count(lit(1)).as("n_winbacks"),
          countDistinct("user_id").as("n_users"))
        .orderBy("return_day")
    }),

    // q259: K-ANONYMITY AUDIT — the privacy/governance screen run
    // before sharing a table: group sizes over the quasi-identifier
    // pair (nation, market segment), reporting how many equivalence
    // classes and how many ROWS fall below k = 5 (the re-identifiable
    // population a suppression pass would have to handle). One hash
    // aggregate on the quasi-identifier key, then a constant-size
    // summary — the group table is bounded by the QI domain, not the
    // corpus.
    "q259_k_anonymity" -> ((s, dir) => {
      Tables.customer(s, dir)
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("sz"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("sz") < 5, 1L).otherwise(0L)).as("n_violating_groups"),
          sum(when(col("sz") < 5, col("sz")).otherwise(0L)).as("n_risk_rows"),
          min("sz").as("min_group_size"),
          sum("sz").as("n_rows"))
        .select(lit(5L).as("k"), col("n_groups"), col("n_violating_groups"),
          col("n_risk_rows"), col("min_group_size"), col("n_rows"))
    }),

    // q246: REFERENTIAL-INTEGRITY AUDIT — the warehouse data-quality
    // sweep: orphan counts across the schema's foreign keys
    // (lineitem→orders, lineitem→supplier, orders→customer) plus the
    // reverse childless-orders check, each as ONE left-anti join
    // shuffling on the key (the scale-correct orphan scan — no
    // collect, no broadcast of the fact side; dims broadcast when
    // small, AQE decides). The harness data is referentially clean,
    // so nonzero totals + zero orphans is the meaningful invariant
    // the spec pins; the operator exists for the feeds that aren't.
    "q246_fk_integrity" -> ((s, dir) => {
      // One pass per fact table: both of lineitem's FK edges check in
      // a single scan (left joins to unique-keyed dims + null counts),
      // orders' customer edge and the reverse childless-orders check
      // in another — 3 fact-side passes total instead of a
      // scan-plus-anti-join per relation (the naive 8-pass shape
      // measured 2.7× slower at sf1).
      val li = Tables.lineitem(s, dir)
      val ord = Tables.orders(s, dir)
      val liAudit = li.select("l_orderkey", "l_suppkey")
        .join(ord.select(col("o_orderkey").as("l_orderkey"),
          lit(1).as("has_o")), Seq("l_orderkey"), "left")
        .join(Tables.supplier(s, dir).select(col("s_suppkey")
          .as("l_suppkey"), lit(1).as("has_s")), Seq("l_suppkey"), "left")
        .agg(count(lit(1)).as("n_li"),
          sum(when(col("has_o").isNull, 1L).otherwise(0L)).as("orph_o"),
          sum(when(col("has_s").isNull, 1L).otherwise(0L)).as("orph_s"))
      val ordAudit = ord.select("o_orderkey", "o_custkey")
        .join(Tables.customer(s, dir).select(col("c_custkey")
          .as("o_custkey"), lit(1).as("has_c")), Seq("o_custkey"), "left")
        .join(li.groupBy(col("l_orderkey").as("o_orderkey"))
          .agg(lit(1).as("has_li")), Seq("o_orderkey"), "left")
        .agg(count(lit(1)).as("n_ord"),
          sum(when(col("has_c").isNull, 1L).otherwise(0L)).as("orph_c"),
          sum(when(col("has_li").isNull, 1L).otherwise(0L)).as("orph_li"))
      // 1-row result, fanned into 4 output rows — cut so the audit
      // joins execute once, not once per unioned branch.
      val both = liAudit.crossJoin(ordAudit).localCheckpoint(false)
      both.select(lit("lineitem->orders").as("relation"),
          col("n_li").as("n_rows"), col("orph_o").as("n_orphans"))
        .unionAll(both.select(lit("lineitem->supplier").as("relation"),
          col("n_li").as("n_rows"), col("orph_s").as("n_orphans")))
        .unionAll(both.select(lit("orders->customer").as("relation"),
          col("n_ord").as("n_rows"), col("orph_c").as("n_orphans")))
        .unionAll(both.select(lit("orders-without-lineitem").as("relation"),
          col("n_ord").as("n_rows"), col("orph_li").as("n_orphans")))
        .orderBy("relation")
    }),

    // q240: COMPACTION BIN-PACKING PLANNER — the small-files
    // maintenance pass every parquet warehouse runs: given per-file
    // metadata (here one "file" per ship-date day, bytes ∝ rows),
    // assign date-ordered files to output groups by CUMULATIVE-SUM
    // START OFFSET div target (a pure deterministic rule — no greedy
    // driver loop, no order-dependent state), so each output group is
    // a contiguous date range totalling ≈ the 256 KiB target (bounded
    // by target + one file). Scale: the corpus collapses in one
    // (day)-keyed aggregate; the planning window runs over the
    // CALENDAR-bounded file-metadata table, which is the actual shape
    // of a table-maintenance planner (file manifests, not data, flow
    // through it).
    "q240_compaction_plan" -> ((s, dir) => {
      val files = Tables.lineitem(s, dir)
        .groupBy(col("l_shipdate").cast("date").as("day"))
        .agg(count(lit(1)).as("nrows"))
        .withColumn("bytes", col("nrows") * 100L)
      files
        .withColumn("cum", sum("bytes").over(Window.orderBy("day")))
        .withColumn("grp", expr("(cum - bytes) div 262144"))
        .groupBy("grp")
        .agg(count(lit(1)).as("n_files"), sum("bytes").as("total_bytes"),
          sum("nrows").as("total_rows"),
          min("day").as("first_day"), max("day").as("last_day"))
        .orderBy("grp")
    }),

    // q241: RENDEZVOUS (HRW) HASHING REBALANCE AUDIT — the sibling of
    // q195's consistent-hash ring: every key goes to the node with the
    // highest md5(node:key) score, and adding node 16 to a 16-node
    // fleet must move ONLY the keys whose new top score is node 16
    // (moved_in = 0 for every old node — the minimal-disruption
    // contract, proven exactly over the whole key population, not
    // sampled). Scale: the 17-node grid fans each key ×17 map-side
    // (bounded constant), one shuffle on the key for the two arg-max
    // aggregates, then node-level summaries over the 17-row frame;
    // the per-key assignment table is cut once and feeds the three
    // load/movement aggregates.
    "q241_rendezvous_hash" -> ((s, dir) => {
      val nodes = s.range(0, 17).select(col("id").as("node"))
      val assign = Tables.customer(s, dir).select(col("c_custkey").as("k"))
        .join(broadcast(nodes), lit(true))
        .select(col("k"), col("node"),
          conv(substring(md5(concat(lit("hrw:"), col("node"), lit(":"),
            col("k"))), 1, 15), 16, 10).cast("long").as("score"))
        .groupBy("k")
        .agg(
          max(when(col("node") < 16, struct(col("score"), col("node"))))
            .as("m16"),
          max(struct(col("score"), col("node"))).as("m17"))
        .select(col("k"), col("m16.node").as("a16"), col("m17.node").as("a17"))
        .localCheckpoint(false) // feeds the three node summaries
      val l16 = assign.groupBy(col("a16").as("node"))
        .agg(count(lit(1)).as("load16"))
      val l17 = assign.groupBy(col("a17").as("node"))
        .agg(count(lit(1)).as("load17"))
      val mv = assign.filter(col("a16") =!= col("a17"))
        .groupBy(col("a17").as("node")).agg(count(lit(1)).as("moved_in"))
      broadcast(nodes)
        .join(l16, Seq("node"), "left")
        .join(l17, Seq("node"), "left")
        .join(mv, Seq("node"), "left")
        .select(col("node"), coalesce(col("load16"), lit(0L)).as("load16"),
          coalesce(col("load17"), lit(0L)).as("load17"),
          coalesce(col("moved_in"), lit(0L)).as("moved_in"))
        .orderBy("node")
    }),

    // q235: TWO-PROPORTION Z-TEST — the A/B-experiment readout:
    // deterministic arm assignment (user_id parity — rerun-stable, no
    // RNG state), unit of analysis = USER-DAY with conversion = any
    // purchase that day (per-user lifetime conversion saturates to
    // p̂ = 1 on an active event log, and ANSI mode correctly faults
    // the z dag's se = 0), pooled-variance z over the four exact
    // BIGINT counts. The z-score is ONE fixed dag of IEEE double ops
    // mirrored operand-for-operand in the oracle (each op exactly
    // rounded → bit-identical). Scale: one (user_id, day)-keyed
    // aggregate over the corpus (unbounded key, map-side combinable
    // max), then conditional sums fold the 2-arm table into a single
    // row — no windows, no broadcast at all.
    "q235_ab_ztest" -> ((s, dir) => {
      val perUser = Tables.events(s, dir)
        .select(col("user_id"), col("ts").cast("date").as("day"),
          (col("event_type") === "purchase").cast("long").as("pc"))
        .groupBy("user_id", "day")
        .agg(max("pc").as("converted"))
        .select(pmod(col("user_id"), lit(2)).as("arm"), col("converted"))
      val ag = perUser.agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 0, col("converted")).otherwise(0L)).as("c_a"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("arm") === 1, col("converted")).otherwise(0L)).as("c_b"))
      val pA = col("c_a").cast("double") / col("n_a").cast("double")
      val pB = col("c_b").cast("double") / col("n_b").cast("double")
      val pP = (col("c_a") + col("c_b")).cast("double") /
        (col("n_a") + col("n_b")).cast("double")
      val se = sqrt(pP * (lit(1.0) - pP) *
        (lit(1.0) / col("n_a").cast("double") +
          lit(1.0) / col("n_b").cast("double")))
      ag.select(col("n_a"), col("c_a"), col("n_b"), col("c_b"),
        ((pA - pB) / se).as("z"))
    }),

    // q236: LOG-BUCKETED HISTOGRAM QUANTILES (HdrHistogram shape) —
    // the latency/price-percentile operator that scales where an exact
    // percentile can't: each cents value is truncated to its top 5
    // significant bits (v >> max(bitlen−5, 0) << same), giving ≤ 16
    // sub-buckets per octave with ≤ 3.2 % relative bound — and unlike
    // a sketch, the bucketing is a pure deterministic function, so the
    // whole histogram is oracle-replayable (the q88 approx-percentile
    // family upgraded to an exact-contract check). Bit length comes
    // from the BINARY STRING length (no float log2 — ln-ratio log2 is
    // off-by-ulp at exact powers of two). Scale: one map-side-
    // combinable aggregate on the value-DOMAIN-bounded bucket key
    // (≤ 16·64 buckets regardless of corpus size), a cumulative window
    // over that bounded table, and a 4-row quantile grid joined
    // against it.
    "q236_hdr_histogram" -> ((s, dir) => {
      val v = floor(col("o_totalprice") * 100 + 0.5).cast("long")
      val buckets = Tables.orders(s, dir)
        .select(v.as("v"))
        .select(expr("shiftleft(shiftright(v, int(greatest(length(bin(v)) - 5, 0))), " +
          "int(greatest(length(bin(v)) - 5, 0)))").as("lb"),
          expr("shiftleft(1L, int(greatest(length(bin(v)) - 5, 0)))").as("w"))
        .groupBy("lb", "w").agg(count(lit(1)).as("cnt"))
      val tot = broadcast(buckets.agg(sum("cnt").as("n")))
      val cum = buckets
        .withColumn("cum", sum("cnt").over(Window.orderBy("lb")))
        .crossJoin(tot)
      val qs = s.range(0, 4).select(
        element_at(typedLit(Seq(50L, 90L, 95L, 99L)), (col("id") + 1).cast("int"))
          .as("pct"))
      broadcast(qs).join(cum,
          col("cum") * lit(100L) >= col("pct") * col("n"))
        .groupBy("pct")
        .agg(min(struct(col("lb"), col("w"), col("cum"), col("n"))).as("m"))
        .select(col("pct"), col("m.lb").as("lo_bound"),
          (col("m.lb") + col("m.w") - 1L).as("hi_bound"),
          col("m.cum").as("cum_count"), col("m.n").as("n"))
        .orderBy("pct")
    }),

    // ---------------------------------------------------------------
    // q126: BM25 retrieval — score every document against a term set,
    // return the top 20. idf = ln(1 + (N − df + ½)/(df + ½)) (the
    // Lucene formulation: always positive), tf saturation k1=1.2,
    // length normalization b=0.75. Plan shape: the token stream is
    // filtered to the query terms BEFORE any aggregation (the scan
    // emits ~|Q| matches per doc, not the whole posting universe);
    // df (|Q| rows) and the corpus stats (1 row) broadcast; the only
    // shuffles key on doc_id. Per-term contributions are 9-dp
    // quantized and summed as BIGINT so the score is bit-stable
    // across engines and summation orders.
    "q126_bm25" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val toks = docs.select(col("doc_id"),
        explode(Text.tokens(col("text"))).as("token"))
      val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val stats = broadcast(dl.agg(
        count(lit(1)).as("n"),
        (sum("dl").cast("double") / count(lit(1))).as("avgdl")))
      val qtoks = toks.filter(col("token").isin(Bm25Terms: _*))
      val df = broadcast(qtoks.select("doc_id", "token").distinct()
        .groupBy("token").agg(count(lit(1)).as("df")))
      val tf = qtoks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      bm25TopK(tf.join(df, "token")
        .join(dl, "doc_id")
        .crossJoin(stats)
        .select(col("doc_id"), bm25C9.as("c9")))
    }),

    // ---------------------------------------------------------------
    // q133: inverted-index BUILD — materialize the postings table
    // (token, doc_id, tf, dl) bucketed on token plus the 1-row corpus
    // stats, then emit the per-term manifest (df, total occurrences).
    // The build pays the corpus tokenization and two doc_id-keyed
    // shuffles ONCE; every q134 probe after it reads only the buckets
    // its query terms hash to. The q109/q110 IVF pattern applied to
    // lexical retrieval.
    "q133_postings_build" -> ((s, dir) => {
      ensurePostings(s, dir)
      s.table(graft.sources.Staging.appTable(s, "graft_postings"))
        .groupBy("token")
        .agg(count(lit(1)).as("df"), sum("tf").as("total_tf"))
        .orderBy("token")
    }),

    // ---------------------------------------------------------------
    // q211: postings DELTA-ENCODING audit — the storage half of the
    // inverted-index story: per token, gap-encode the sorted doc_id
    // postings inside fixed 4096-id blocks (block-local deltas with a
    // raw block head — the layout real indexes use so a block decodes
    // without its predecessors and skip pointers work) and account the
    // encoded bit width against raw 64-bit ids. bit width of v is
    // length(bin(v)) — identical on both engines including bin(0) =
    // "0" (1 bit) for a doc_id-0 block head. Scale: the gap window
    // partitions on (token, bucket) with ≤ 4096 rows per partition BY
    // CONSTRUCTION (bucket = doc_id div 4096) — a bare per-token
    // window would be a single-task sort of a stopword's corpus-sized
    // posting list; the block id caps it, which is the same reason the
    // on-disk format blocks. Output bounded to the 20 highest-df
    // tokens (TakeOrderedAndProject).
    "q211_postings_delta" -> ((s, dir) => {
      val posts = Tables.documents(s, dir)
        .select(col("doc_id"), explode(Text.tokens(col("text"))).as("token"))
        .distinct()
        .withColumn("bucket", expr("doc_id div 4096"))
      val w = Window.partitionBy("token", "bucket").orderBy("doc_id")
      val gaps = posts.withColumn("gap",
        coalesce(col("doc_id") - lag("doc_id", 1).over(w), col("doc_id")))
      gaps.groupBy("token")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct("bucket").as("n_blocks"),
          sum(length(bin(col("gap"))).cast("long")).as("delta_bits"))
        .withColumn("raw_bits", col("n_docs") * 64)
        .withColumn("pct_saved",
          expr("((raw_bits - delta_bits) * 100) div raw_bits").cast("int"))
        .orderBy(col("n_docs").desc, col("token"))
        .limit(20)
    }),

    // ---------------------------------------------------------------
    // q217: CDC CHANGELOG FOLD — apply an insert/update/delete event
    // stream to produce final table state: per key, the highest
    // (ts, event_id) change wins, a trailing delete tombstones the
    // key. The op class is a deterministic md5 tag per event (1/8 D,
    // 5/16 I, rest U). This is the warehouse "apply the CDC feed"
    // half that q192's two-snapshot MERGE doesn't cover: ordered
    // replay semantics, not symmetric reconciliation. Output is the
    // state summary plus an ORDER-INDEPENDENT bit_xor digest of
    // surviving (key, value) pairs — pure integer arithmetic
    // (user_id·1e8 + cents < 2⁶³), identical on both engines, so the
    // whole folded state is hash-checked without materializing it.
    // Scale: one ranking window keyed on the unbounded user_id with a
    // WindowGroupLimit rank-1 filter, then a 1-row aggregate.
    "q217_cdc_fold" -> ((s, dir) => {
      val opHex = substring(md5(concat(lit("op:"),
        col("event_id").cast("string"))), 1, 1)
      val log = Tables.events(s, dir).select(
        col("user_id"), col("ts"), col("event_id"),
        when(opHex < "2", "D").when(opHex < "7", "I").otherwise("U").as("op"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      val last = log.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      last.agg(
        count(lit(1)).as("n_keys"),
        sum(when(col("op") =!= "D", 1L).otherwise(0L)).as("n_alive"),
        sum(when(col("op") === "D", 1L).otherwise(0L)).as("n_tombstoned"),
        sum(when(col("op") =!= "D", col("cents")).otherwise(0L)).as("alive_cents"),
        expr("bit_xor(CASE WHEN op <> 'D' " +
          "THEN user_id * 100000000 + cents ELSE 0 END)").as("state_digest"))
    }),

    // q224: INCREMENTAL AGGREGATE MAINTENANCE — the warehouse pattern
    // that makes 100 TB dashboards affordable: a materialized per-key
    // aggregate STATE (orders before the watermark date) is folded
    // with the DELTA's aggregate instead of recomputing from scratch.
    // Everything kept is algebraic/mergeable (count, cents-sum, max),
    // so state ⊕ delta is a full-outer equi-join on the key with
    // coalesce/greatest combine — cost ∝ |delta| + |state|, never
    // ∝ |history|. The oracle RECOMPUTES from the full table in one
    // pass — different machinery proving the merge law exact. Scale:
    // two aggregates + one key-partitioned join; at 100 TB only the
    // delta is scanned (the base state is the previously-written
    // aggregate — materialized here from the same table only because
    // the fixture has a single orders snapshot).
    "q224_incremental_agg" -> ((s, dir) => {
      val cents = floor(col("o_totalprice") * 100 + 0.5).cast("long")
      val o = Tables.orders(s, dir)
        .select(col("o_custkey"), cents.as("cents"),
          (col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
            .as("is_base"))
      def st(df: org.apache.spark.sql.DataFrame) = df
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n"), sum("cents").as("tot"), max("cents").as("mx"))
      val base = st(o.filter(col("is_base")))
        .select(col("o_custkey"), col("n").as("bn"), col("tot").as("bt"),
          col("mx").as("bm"))
      val delta = st(o.filter(!col("is_base")))
        .select(col("o_custkey"), col("n").as("dn"), col("tot").as("dt"),
          col("mx").as("dm"))
      base.join(delta, Seq("o_custkey"), "full_outer")
        .select(col("o_custkey"),
          (coalesce(col("bn"), lit(0L)) + coalesce(col("dn"), lit(0L)))
            .as("n_orders"),
          (coalesce(col("bt"), lit(0L)) + coalesce(col("dt"), lit(0L)))
            .as("total_cents"),
          greatest(coalesce(col("bm"), lit(Long.MinValue)),
            coalesce(col("dm"), lit(Long.MinValue))).as("max_cents"),
          col("dn").isNotNull.cast("int").as("touched_by_delta"))
        .orderBy("o_custkey")
    }),

    // q225: Z-ORDER PRUNING AUDIT — the comparative half of q136's
    // layout manifest: given the same 64×64 (customer bucket, day
    // bucket) grid, pack rows into 64 equal-row files under (a) the
    // Morton-interleaved order and (b) plain (x, y) linear order,
    // then replay an 8×8 box predicate against each file's min/max
    // envelope — the decision artifact behind OPTIMIZE ZORDER:
    // files-scanned and rows-pulled per layout for identical matching
    // rows. The bit spread is the closed-form shift/mask ladder
    // (identical integer ops in both engines); the file cut is a
    // prefix sum OVER THE AGGREGATED GRID (constant size at any
    // volume) scaled to a FIXED 64-file budget, so the audit geometry
    // is SF-invariant — the aligned box occupies one contiguous z
    // block (~1 file) but stripes across 8 linear files, and
    // AnalyticsSpec pins that dominance. Scale: one scan into the
    // constant-size grid; everything else is grid-local.
    "q225_zorder_audit" -> ((s, dir) => {
      def spread(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
        val b1 = c.bitwiseOR(shiftleft(c, 4)).bitwiseAND(lit(0x0F0FL))
        val b2 = b1.bitwiseOR(shiftleft(b1, 2)).bitwiseAND(lit(0x3333L))
        b2.bitwiseOR(shiftleft(b2, 1)).bitwiseAND(lit(0x5555L))
      }
      val keyed = Tables.orders(s, dir).select(
        (col("o_custkey") % 64).cast("long").as("x"),
        (unix_date(col("o_orderdate").cast("date")) % 64).cast("long").as("y"))
      val cells = keyed.groupBy("x", "y").agg(count(lit(1)).as("cnt"))
        .withColumn("zv", spread(col("x"))
          .bitwiseOR(shiftleft(spread(col("y")), 1)))
      val total = broadcast(cells.agg(sum("cnt").as("total")))
      def audit(ord: Seq[org.apache.spark.sql.Column], layout: String) = {
        val w = Window.orderBy(ord: _*)
        cells
          .withColumn("cum0", sum("cnt").over(w) - col("cnt"))
          .crossJoin(total)
          .withColumn("file_id", expr("least(cum0 * 64 div total, 63L)"))
          .groupBy("file_id")
          .agg(min("x").as("min_x"), max("x").as("max_x"),
            min("y").as("min_y"), max("y").as("max_y"),
            sum("cnt").as("rows_in_file"),
            sum(when(col("x").between(8, 15) && col("y").between(8, 15),
              col("cnt")).otherwise(0L)).as("rows_matching"))
          .withColumn("scanned",
            (col("min_x") <= 15 && col("max_x") >= 8 &&
              col("min_y") <= 15 && col("max_y") >= 8).cast("long"))
          .agg(count(lit(1)).as("n_files"),
            sum("scanned").as("files_scanned"),
            sum(col("scanned") * col("rows_in_file")).as("rows_scanned"),
            sum("rows_matching").as("rows_matching"))
          .select(lit(layout).as("layout"), col("n_files"),
            col("files_scanned"), col("rows_scanned"), col("rows_matching"))
      }
      audit(Seq(col("zv"), col("x"), col("y")), "zorder")
        .unionAll(audit(Seq(col("x"), col("y")), "linear"))
        .orderBy("layout")
    }),

    // q231: POPULATION STABILITY INDEX — the ML-monitoring drift
    // metric between a baseline and a current window of the event
    // stream: PSI = Σ_bins (p_i − q_i)·ln(p_i/q_i). Bins are FIXED
    // equal-width cents buckets (domain-derived, not quantile-fit, so
    // the binning is rerun- and engine-stable), counts are exact
    // integers with +1 Laplace smoothing making empty bins
    // well-defined, and each bin's term is ONE division → ln → product
    // dag quantized half-up to 1e-9 BEFORE the sum (the q153/q227
    // per-cell pattern — the 10-row double sum would be
    // engine-order-dependent; the ln quantization is the q101
    // 3-SF-sweep-proven class). Scale: one hash aggregate on the
    // (bin, period) key with map-side combine; the PSI table is
    // constant-size.
    "q231_psi_drift" -> ((s, dir) => {
      val cell = Tables.events(s, dir)
        .select(expr("least(cast(floor(value * 100 + 0.5) as bigint) div 5000, 9L)")
            .as("bin"),
          (col("ts") >= lit("2024-01-16").cast("timestamp")).cast("int")
            .as("is_curr"))
        .groupBy("bin")
        .agg(sum(lit(1) - col("is_curr")).as("cb"),
          sum("is_curr").as("cc"))
      val tot = broadcast(cell.agg(sum("cb").as("nb"), sum("cc").as("nc")))
      val bins = s.range(0, 10).select(col("id").as("bin"))
      val g = broadcast(bins).join(cell, Seq("bin"), "left")
        .select(col("bin"), coalesce(col("cb"), lit(0L)).as("cb"),
          coalesce(col("cc"), lit(0L)).as("cc"))
        .crossJoin(tot)
      val p = (col("cb") + 1L).cast("double") / (col("nb") + 10L).cast("double")
      val q = (col("cc") + 1L).cast("double") / (col("nc") + 10L).cast("double")
      val ratio = ((col("cb") + 1L) * (col("nc") + 10L)).cast("double") /
        ((col("cc") + 1L) * (col("nb") + 10L)).cast("double")
      g.select(col("bin"), col("cb").as("c_base"), col("cc").as("c_curr"),
          floor((p - q) * log(ratio) * lit(1.0e9) + lit(0.5)).cast("long")
            .as("term9"))
        .orderBy("bin")
    }),

    // q227: BENFORD LEADING-DIGIT AUDIT — the forensic data-quality
    // screen (fabricated or re-scaled monetary columns drift from the
    // log10(1+1/d) law): observed leading-digit counts of the order
    // totals vs Benford expectation, with a χ² statistic. Everything
    // is integer-exact: leading digit as the first character
    // of the BIGINT cents rendered as a string (no float log10),
    // Benford probabilities as nine hard-coded 1e-9-unit constants,
    // expected mass e9 = n·p9 as BIGINT, and each digit's χ² term is
    // one double dag quantized half-up to 1e-9 before anything sums
    // it (the q153 chi-square pattern — a 9-row double sum would be
    // engine-order dependent). Scale: one hash aggregate on the
    // 9-value digit key with map-side combine; the audit table is
    // constant-size.
    "q227_benford_audit" -> ((s, dir) => {
      val cents = floor(col("o_totalprice") * 100 + 0.5).cast("long")
      val obs = Tables.orders(s, dir)
        .select(substring(cents.cast("string"), 1, 1).cast("long").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("observed"))
      val benford = Seq(
        (1L, 301029996L), (2L, 176091259L), (3L, 124938737L),
        (4L, 96910013L), (5L, 79181246L), (6L, 66946790L),
        (7L, 57991947L), (8L, 51152522L), (9L, 45757491L))
      val probs = s.createDataFrame(benford).toDF("digit", "p9")
      val n = broadcast(obs.agg(sum("observed").as("n")))
      val t1 = col("diff9").cast("double") / lit(1.0e9)
      broadcast(probs).join(obs, Seq("digit"), "left")
        .select(col("digit"), coalesce(col("observed"), lit(0L)).as("observed"),
          col("p9"))
        .crossJoin(n)
        .withColumn("e9", col("n") * col("p9"))
        .withColumn("diff9", col("observed") * lit(1000000000L) - col("e9"))
        .withColumn("term9",
          floor(t1 * t1 / (col("e9").cast("double") / lit(1.0e9)) * lit(1.0e9) +
            lit(0.5)).cast("long"))
        .select(col("digit"), col("observed"), col("e9"), col("term9"))
        .orderBy("digit")
    }),

    // ---------------------------------------------------------------
    // q134: BM25 probe against the persisted postings index —
    // score-identical to q126 (shared contribution/top-k helpers,
    // same oracle) but physically: NO corpus scan, NO tokenization,
    // no dl join (the posting carries its norm); the token-IN filter
    // prunes buckets, df comes from the fetched postings themselves,
    // and the only shuffle keys on doc_id over the matched postings.
    "q134_bm25_indexed" -> ((s, dir) => {
      ensurePostings(s, dir)
      val post = s.table(graft.sources.Staging.appTable(s, "graft_postings"))
        .filter(col("token").isin(Bm25Terms: _*))
      val df = broadcast(post.groupBy("token").agg(count(lit(1)).as("df")))
      val stats = broadcast(s.table(graft.sources.Staging.appTable(s, "graft_bm25_stats")))
      bm25TopK(post.join(df, "token")
        .crossJoin(stats)
        .select(col("doc_id"), bm25C9.as("c9")))
    }),

    // ---------------------------------------------------------------
    // q137: BATCH retrieval — a table of queries scored against the
    // persisted postings index in ONE pass, top-5 docs per query. The
    // (query_id, term) table broadcasts onto the bucket-pruned
    // postings fetch, scores aggregate per (query_id, doc_id), and the
    // per-query cut is a rank FILTER — which Spark turns into a
    // map-side WindowGroupLimit, so the low-cardinality query_id
    // partition never sees more than k rows per task. The multi-tenant
    // serving shape: cost ∝ matched postings, not queries × corpus.
    "q137_bm25_batch" -> ((s, dir) => {
      ensurePostings(s, dir)
      import s.implicits._
      val terms = Seq(
        (1L, "join"), (1L, "hash"),
        (2L, "vector"), (2L, "column"), (2L, "scan"),
        (3L, "merge"))
      val queryTerms = terms.toDF("query_id", "token")
      val post = s.table(graft.sources.Staging.appTable(s, "graft_postings"))
        .filter(col("token").isin(terms.map(_._2).distinct: _*))
      val df = broadcast(post.groupBy("token").agg(count(lit(1)).as("df")))
      val stats = broadcast(s.table(graft.sources.Staging.appTable(s, "graft_bm25_stats")))
      val scored = post.join(broadcast(queryTerms), "token")
        .join(df, "token")
        .crossJoin(stats)
        .select(col("query_id"), col("doc_id"), bm25C9.as("c9"))
        .groupBy("query_id", "doc_id").agg(sum("c9").as("score9"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("score9").desc, col("doc_id"))
      scored.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select(col("query_id"), col("rnk"), col("doc_id"), col("score9"),
          (col("score9") / lit(1e9)).as("score"))
        .orderBy("query_id", "rnk")
    }),

    // ---------------------------------------------------------------
    // q138: rolling 7-day distinct actives (the DAU/WAU family) —
    // sliding-window COUNT DISTINCT, which no built-in window frame
    // can do scalably (RANGE frames re-buffer each day's user set).
    // Shape: distinct (user, day) → explode each activity day onto
    // the 7 report days it covers (narrow ×7) → distinct (user,
    // report day) → count per day. Every shuffle keys on the
    // high-cardinality (user_id, day) pair; no per-day user-set
    // buffering anywhere.
    "q138_rolling_dau" -> ((s, dir) => {
      val act = Tables.events(s, dir)
        .select(col("user_id"), col("ts").cast("date").as("day")).distinct()
      val maxDay = broadcast(act.agg(max("day").as("max_day")))
      act
        .select(col("user_id"), explode(
          sequence(col("day"), date_add(col("day"), 6),
            expr("INTERVAL 1 DAY"))).as("day"))
        .distinct()
        .crossJoin(maxDay)
        .filter(col("day") <= col("max_day"))
        .groupBy("day").agg(count(lit(1)).as("dau7"))
        .orderBy("day")
    }),

    // ---------------------------------------------------------------
    // q136: Z-order (Morton-curve) layout — the multi-dimensional
    // clustering step behind Delta/Iceberg OPTIMIZE ZORDER: interleave
    // the bits of two scan-predicate columns so range buckets of the
    // combined key bound BOTH dimensions, letting min/max file stats
    // prune scans on either column. Output is the per-bucket manifest
    // (count + per-dimension min/max); with 64 buckets over a 16-bit
    // z, each bucket fixes the top 3 bits of each dimension, so every
    // bucket's x- and y-range is ≤ 31 — the property AnalyticsSpec
    // asserts and a linear layout cannot deliver. At 100 TB the
    // companion action is repartitionByRange(z) + sorted parquet write
    // (the q84/q90 machinery); the manifest here is the part with a
    // checkable contract.
    "q136_zorder_layout" -> ((s, dir) => {
      val z = zInterleaveSql("(l_partkey%256)", "(l_suppkey%256)")
      Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_suppkey"),
          expr(s"CAST(floor(($z)/1024) AS BIGINT)").as("zbucket"),
          (col("l_partkey") % 256).as("x"), (col("l_suppkey") % 256).as("y"))
        .groupBy("zbucket")
        .agg(count(lit(1)).as("n"),
          min("x").as("min_x"), max("x").as("max_x"),
          min("y").as("min_y"), max("y").as("max_y"))
        .orderBy("zbucket")
    }),

    // ---------------------------------------------------------------
    // q135: temperature-scaled domain sampling (α = 0.5): target
    // shares ∝ √n_d rebalance the mixture toward small domains at a
    // fixed total budget (half the corpus), realized as per-domain
    // deterministic hash acceptance — no RNG state, rerun-stable,
    // embarrassingly parallel. Per-domain rates are a |sources|-row
    // broadcast; the corpus streams once through a filter.
    "q135_temperature_sample" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "source")
      val counts = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
      val wq = counts.withColumn("w_q",
        floor(sqrt(col("n_docs").cast("double")) * lit(1e9) + lit(0.5)).cast("long"))
      val tot = broadcast(wq.agg(sum("w_q").as("w_tot"),
        floor(sum("n_docs") / 2).cast("long").as("t_total")))
      val rates = broadcast(wq.crossJoin(tot)
        .withColumn("t_d",
          floor(col("w_q").cast("double") / col("w_tot") * col("t_total") +
            lit(0.5)).cast("long"))
        .withColumn("r_d",
          least(lit(1.0), col("t_d").cast("double") / col("n_docs"))))
      docs.join(rates, "source")
        .withColumn("u",
          conv(substring(md5(concat(lit("temp:"), col("doc_id").cast("string"))),
            1, 8), 16, 10).cast("long").cast("double") / lit(4294967296.0))
        .filter(col("u") < col("r_d"))
        .groupBy("source").agg(count(lit(1)).as("n_kept"))
        .join(rates.select("source", "n_docs", "t_d"), "source")
        .select(col("source"), col("n_docs"), col("t_d").as("n_target"),
          col("n_kept"))
        .orderBy("source")
    }),

    // ---------------------------------------------------------------
    // q127: substring-level duplication audit (the Lee et al. 2022
    // "deduplicating training data" shape at shingle granularity):
    // every 5-token window of every doc, flagged if the identical
    // window appears in ≥2 distinct docs; per-doc duplicated-span
    // mass. Shingling is the native graft_shingles loop; the
    // per-shingle doc count and the span↔count join both shuffle on
    // the shingle value — unbounded cardinality, even spread. At
    // 100 TB the shuffle key would be a 128-bit content hash of the
    // shingle (the ops/Dedup exact-dedup pattern) rather than the
    // string itself; the string key is kept here because the oracle
    // compares raw shingles and collision behavior must match.
    "q127_dup_spans" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val spans = docs.select(col("doc_id"),
        explode(Text.shingles(Text.tokens(col("text")), 5)).as("sh"))
      val counts = spans.groupBy("sh")
        .agg(count_distinct(col("doc_id")).as("nd"))
      spans.join(counts, "sh")
        .groupBy("doc_id").agg(
          count(lit(1)).as("n_spans"),
          sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_dup_spans"))
        .select(col("doc_id"), col("n_spans"), col("n_dup_spans"),
          (col("n_dup_spans").cast("double") / col("n_spans")).as("dup_frac"))
        .orderBy("doc_id")
    }),

    // ---------------------------------------------------------------
    // q128: ordered event funnel view → click → purchase, each stage
    // within 3 days of the previous stage's first completion. Pure
    // min-aggregate + equi-join chain on user_id (no windows, no
    // per-user event buffering): each stage is one groupBy and one
    // join keyed on user_id, so the whole funnel is a fixed number of
    // evenly-spread shuffles regardless of per-user event counts.
    "q128_event_funnel" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val window = expr("INTERVAL 3 DAYS")
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t1"))
      val c = ev.filter(col("event_type") === "click").as("e")
        .join(v, "user_id")
        .filter(col("ts") > col("t1") && col("ts") <= col("t1") + window)
        .groupBy("user_id").agg(min("ts").as("t2"))
      val p = ev.filter(col("event_type") === "purchase").as("e")
        .join(c, "user_id")
        .filter(col("ts") > col("t2") && col("ts") <= col("t2") + window)
        .groupBy("user_id").agg(min("ts").as("t3"))
      v.agg(count(lit(1)).as("n_users")).select(lit(1L).as("stage"),
          lit("view").as("name"), col("n_users"))
        .unionAll(c.agg(count(lit(1)).as("n_users"))
          .select(lit(2L).as("stage"), lit("click").as("name"), col("n_users")))
        .unionAll(p.agg(count(lit(1)).as("n_users"))
          .select(lit(3L).as("stage"), lit("purchase").as("name"), col("n_users")))
        .orderBy("stage")
    }),

    // ---------------------------------------------------------------
    // q129: weekly cohort retention — users grouped by first-activity
    // week, counted in each subsequent active week. Two aggregates
    // and one join, all keyed on user_id; the output is |cohorts| ×
    // |offsets| rows (bounded by calendar span, not data volume).
    // Week offsets are exact: both sides are Monday-truncated, so the
    // day delta is always a multiple of 7 and the division is exact.
    "q129_retention_cohort" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val first = ev.groupBy("user_id")
        .agg(date_trunc("week", min("ts")).cast("date").as("cohort_week"))
      val active = ev.select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("active_week")).distinct()
      first.join(active, "user_id")
        .groupBy(col("cohort_week"),
          (datediff(col("active_week"), col("cohort_week")) / 7)
            .cast("long").as("week_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_week", "week_offset")
    }),

    // ---------------------------------------------------------------
    // q130: gap-based sessionization — explicit session ids attached
    // to events (what session_window's aggregate-only output cannot
    // give you), via lag + running flag sum partitioned on user_id
    // (unbounded cardinality: one user's events per window partition).
    // A 30-minute silence starts a new session.
    "q130_sessionize" -> ((s, dir) =>
      sessionIntervals(Tables.events(s, dir))
        .orderBy("user_id", "session_idx")),

    // ---------------------------------------------------------------
    // q131: SCD type-2 dimension build — collapse the event log into
    // validity intervals of the per-user attribute `k` (from props),
    // emitting a row per change with [valid_from, valid_to). Change
    // detection and interval close are two windows over the same
    // (user_id; ts, event_id) sort — one shuffle, high-cardinality
    // partition key. Open (current) intervals carry a high-date
    // sentinel rather than NULL: the engines stringify NULL
    // timestamps differently. The sentinel is 2200-01-01, NOT the
    // classic 9999-12-31: values past 2262-04-11 overflow pandas
    // datetime64[ns] and render as NaT in the driver's stringified
    // hash path (round-8 hash_match=false despite bit-exact values
    // under --exact local compare). Any sentinel beyond max(ts)
    // preserves the half-open-interval contract; 2200-01-01 is
    // portable across every ns-precision engine.
    "q131_scd2" -> ((s, dir) => {
      // Full population (round-12 widening of the old 30-user fixture
      // subset): both windows partition on high-cardinality user_id,
      // so per-task state is one user's history regardless of user
      // count. First-row detection uses lag(ts) — NEVER lag(k_val),
      // whose NULL is ambiguous when the attribute itself can be NULL
      // (two consecutive NULL k_vals must NOT open a new version;
      // `prev_k IS NULL` would).
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k_val"))
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val changes = ev
        .withColumn("prev_k", lag("k_val", 1).over(byUser))
        .withColumn("prev_ts", lag("ts", 1).over(byUser))
        .filter(col("prev_ts").isNull || !(col("prev_k") <=> col("k_val")))
      changes
        .withColumn("valid_to", coalesce(lead("ts", 1).over(byUser),
          lit("2200-01-01 00:00:00").cast("timestamp")))
        .select(col("user_id"), col("ts").as("valid_from"),
          col("valid_to"), col("k_val"))
        .orderBy("user_id", "valid_from")
    }),

    // ---------------------------------------------------------------
    // q132: corpus drift — add-one-smoothed KL(source ‖ corpus) over
    // the global vocabulary, per source. The vocabulary × source grid
    // (needed because absent tokens still contribute smoothed mass)
    // is built by broadcasting the |sources|-row totals against the
    // vocab stream — an explode, not a pair scan; the only real
    // shuffles key on token and (source, token). ln is 9-dp
    // quantized, contributions summed as BIGINT (order-independent).
    "q132_kl_divergence" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val toks = docs.select(col("source"),
        explode(Text.tokens(col("text"))).as("token"))
      val tfSrc = toks.groupBy("source", "token").agg(count(lit(1)).as("tf_s"))
      val vocab = toks.groupBy("token").agg(count(lit(1)).as("tf_all"))
      val srcTotals = broadcast(tfSrc.groupBy("source").agg(sum("tf_s").as("len_s")))
      val totals = broadcast(vocab.agg(
        sum("tf_all").as("len_all"), count(lit(1)).as("v")))
      val grid = vocab.crossJoin(srcTotals).crossJoin(totals)
        .join(tfSrc, Seq("source", "token"), "left")
        .withColumn("tf_s", coalesce(col("tf_s"), lit(0L)))
      val p = (col("tf_s") + lit(1)).cast("double") / (col("len_s") + col("v"))
      val qd = (col("tf_all") + lit(1)).cast("double") / (col("len_all") + col("v"))
      val ln9 = floor(log(p / qd) * lit(1e9) + lit(0.5)) / lit(1e9)
      grid.select(col("source"), q9(p * ln9).as("c9"))
        .groupBy("source").agg(sum("c9").as("kl9"))
        .select(col("source"), col("kl9"), (col("kl9") / lit(1e9)).as("kl"))
        .orderBy("source")
    }),

    // ---------------------------------------------------------------
    // q157: column profiling — the data-quality sweep every ingest
    // pipeline runs first: per column, row/null/distinct counts and
    // min/max rendered to strings. One aggregate PER COLUMN (not one
    // wide multi-distinct aggregate: Spark plans N count(distinct)s in
    // one agg via an N-way expand that multiplies the scan N-fold;
    // separate aggregates each read ONE column through the parquet
    // scan — column-pruned, embarrassingly parallel, and the union is
    // |columns| rows). Doubles profile through the cents quantizer so
    // the string rendering is engine-portable.
    "q157_column_profile" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      def prof(name: String, c: org.apache.spark.sql.Column) =
        o.agg(
          count(lit(1)).as("n_rows"),
          count(when(c.isNull, lit(1))).as("n_null"),
          countDistinct(c).as("n_distinct"),
          min(c).cast("string").as("min_s"),
          max(c).cast("string").as("max_s"))
          .select(lit(name).as("col_name"), col("n_rows"), col("n_null"),
            col("n_distinct"), col("min_s"), col("max_s"))
      prof("o_custkey", col("o_custkey"))
        .unionAll(prof("o_orderpriority", col("o_orderpriority")))
        .unionAll(prof("o_orderstatus", col("o_orderstatus")))
        .unionAll(prof("o_totalcents",
          floor(col("o_totalprice") * lit(100) + lit(0.5)).cast("long")))
        .orderBy("col_name")
    }),

    // ---------------------------------------------------------------
    // q162: snapshot diff (table-versioning / CDC audit) — which keys
    // were added, removed, or changed between two versions of a table.
    // One full outer join on the key comparing content; every shuffle
    // keys on the unbounded o_orderkey, and the rollup output is
    // |diff types| rows with a key checksum. The two "snapshots" are
    // carved deterministically from one base table by an md5-nibble
    // rule (the q112 split discipline: rerun- and engine-stable, no
    // RNG): A drops nibble f, B drops nibble 0 and perturbs nibble 1 —
    // so added/removed/changed are each non-empty with known identity.
    "q162_snapshot_diff" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(col("o_orderkey"),
        floor(col("o_totalprice") * lit(100) + lit(0.5)).cast("long")
          .as("cents"),
        substring(md5(concat(lit("snap:"), col("o_orderkey").cast("string"))),
          1, 1).as("nib"))
      val a = o.filter(col("nib") =!= "f")
        .select(col("o_orderkey").as("ka"), col("cents").as("ca"))
      val b = o.filter(col("nib") =!= "0")
        .select(col("o_orderkey").as("kb"),
          (col("cents") + when(col("nib") === "1", lit(100L)).otherwise(lit(0L)))
            .as("cb"))
      a.join(b, col("ka") === col("kb"), "full")
        .select(coalesce(col("ka"), col("kb")).as("key"),
          when(col("ka").isNull, "added")
            .when(col("kb").isNull, "removed")
            .when(col("ca") =!= col("cb"), "changed")
            .otherwise("unchanged").as("diff_type"))
        .filter(col("diff_type") =!= "unchanged")
        .groupBy("diff_type")
        .agg(count(lit(1)).as("n"), sum("key").as("key_sum"))
        .orderBy("diff_type")
    }),

    // ---------------------------------------------------------------
    // q165: first-touch attribution — every purchase credited to the
    // FIRST event type of its session (q130's 30-minute-gap
    // sessionization feeding a first_value window over the session
    // key). The composite marketing-analytics shape: all three windows
    // ride ONE user_id exchange (same partition prefix), per-user rows
    // are bounded, and the rollup output is |event types| rows.
    "q165_first_touch" -> ((s, dir) => {
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val bySess = Window.partitionBy("user_id", "session_idx")
        .orderBy("ts", "event_id")
      Tables.events(s, dir)
        .withColumn("prev_ts", lag("ts", 1).over(byUser))
        .withColumn("is_new",
          when(col("prev_ts").isNull ||
            col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1L)
            .otherwise(0L))
        .withColumn("session_idx",
          sum("is_new").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("first_touch", first("event_type").over(bySess))
        .filter(col("event_type") === "purchase")
        .groupBy("first_touch")
        .agg(count(lit(1)).as("n_purchases"),
          countDistinct("user_id").as("n_users"))
        .orderBy("first_touch")
    }),

    // ---------------------------------------------------------------
    // q169: SCD-2 point-in-time lookup — q131's versioned dimension
    // joined back to the fact stream: each event resolves the
    // attribute version valid AT ITS TIMESTAMP (valid_from ≤ ts <
    // valid_to), the as-of question every warehouse asks of a type-2
    // dimension. Equi key user_id carries the join (hash/SMJ, never a
    // cartesian — q37's range-predicate-as-join-filter shape); the
    // half-open intervals tile each user's timeline (AnalyticsSpec),
    // so every event matches exactly ONE version — asserted by the
    // count-preservation oracle column.
    "q169_scd2_lookup" -> ((s, dir) => {
      // Full population + lag(ts) first-row detection — q131's
      // round-12 widening, same rationale.
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k_val"))
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val dim = ev
        .withColumn("prev_k", lag("k_val", 1).over(byUser))
        .withColumn("prev_ts", lag("ts", 1).over(byUser))
        .filter(col("prev_ts").isNull || !(col("prev_k") <=> col("k_val")))
        .withColumn("valid_to", coalesce(lead("ts", 1).over(byUser),
          lit("2200-01-01 00:00:00").cast("timestamp")))
        .select(col("user_id").as("d_user"), col("ts").as("valid_from"),
          col("valid_to"), col("k_val"))
      ev.select(col("user_id"), col("ts"))
        .join(dim, col("user_id") === col("d_user") &&
          col("ts") >= col("valid_from") && col("ts") < col("valid_to"))
        .groupBy("k_val")
        .agg(count(lit(1)).as("n_events"),
          countDistinct("user_id").as("n_users"))
        .orderBy("k_val")
    }),

    // ---------------------------------------------------------------
    // q175: Merkle-style bucket reconciliation — the anti-entropy
    // sync-check between two table versions: each side folds its rows
    // into 64 RANGE-bucket digests (bit_xor of a 60-bit md5 row hash —
    // order-independent AND engine-portable, unlike xxhash64), and
    // only buckets whose digests differ need row-level repair. q162
    // diffs every row; this prunes the work to dirty buckets FIRST.
    // Churn is LOCALIZED to the top ~10% of the key space (the
    // append-mostly reality: recent rows change, history doesn't), so
    // range bucketing confines the dirt to the tail buckets and the
    // clean majority genuinely exercises the digests-agree path — at
    // 100 TB the digest pass is one narrow scan per side and the
    // repair join touches only the dirty key ranges. Bucket width
    // comes from an in-plan 1-row max-key broadcast (q145's pattern).
    "q175_merkle_sync" -> ((s, dir) => {
      val mk = broadcast(Tables.orders(s, dir)
        .agg(max("o_orderkey").as("maxkey")))
      val o = Tables.orders(s, dir).crossJoin(mk).select(
        col("o_orderkey"), col("maxkey"),
        floor(col("o_totalprice") * lit(100) + lit(0.5)).cast("long")
          .as("cents"),
        (substring(md5(concat(lit("snap:"), col("o_orderkey").cast("string"))),
          1, 1) === "1" &&
          col("o_orderkey") * 10 >= col("maxkey") * 9).as("churned"))
      def digest(df: org.apache.spark.sql.DataFrame, side: String) = df
        .select(expr("o_orderkey div (maxkey div 64 + 1)").as("bucket"),
          conv(substring(md5(concat_ws(":",
            col("o_orderkey").cast("string"), col("cents").cast("string"))),
            1, 15), 16, 10).cast("long").as("h"))
        .groupBy("bucket").agg(expr("bit_xor(h)").as(side))
      val a = digest(o, "ha")
      val b = digest(o.withColumn("cents",
        col("cents") + when(col("churned"), lit(100L)).otherwise(lit(0L))), "hb")
      a.join(b, Seq("bucket"), "full")
        .select(col("bucket"), col("ha"), col("hb"),
          (!(col("ha") <=> col("hb"))).as("dirty"))
        .orderBy("bucket")
    }),

    // ---------------------------------------------------------------
    // q177: peak concurrency — the classic interval sweep ("maximum
    // number of simultaneously open sessions"), over q130's gap-based
    // sessions. Each session [s_start, s_end] (inclusive: end = last
    // event) becomes a +1 point at start and a −1 at end; kind orders
    // starts BEFORE ends at equal ts so a session ending at t still
    // overlaps one starting at t. The prefix sum of deltas over the
    // global (ts, kind, user, idx) order is the concurrency profile —
    // a single-partition window at scale (the q21 defect class), so it
    // runs on ScalableRank.runningSummed's two-phase range-bucket
    // shape: per-task sort bounded at points/buckets, exact LONG
    // partials. The peak and its earliest timestamp come back via
    // 1-row broadcast scalars, never a driver round-trip.
    "q177_peak_concurrency" -> ((s, dir) => {
      // Three consumers (both sweep legs + the session count): cut
      // lazily so the sessionization windows run once.
      val sess = sessionIntervals(Tables.events(s, dir))
        .localCheckpoint(false)
      val points = sess.select(col("s_start").as("ts"), lit(0L).as("kind"),
          col("user_id"), col("session_idx"), lit(1L).as("delta"))
        .unionAll(sess.select(col("s_end").as("ts"), lit(1L).as("kind"),
          col("user_id"), col("session_idx"), lit(-1L).as("delta")))
      val swept = graft.ops.ScalableRank.runningSummed(points, Seq.empty,
        Seq(col("ts"), col("kind"), col("user_id"), col("session_idx")),
        "delta", buckets = 32)
        // Two consumers (peak aggregate + peak filter): cut so the
        // two-phase sweep's shuffles run once.
        .localCheckpoint(false)
      val peak = broadcast(swept.agg(max("run").as("peak")))
      val nSess = broadcast(sess.agg(count(lit(1)).as("n_sessions")))
      swept.crossJoin(peak).filter(col("run") === col("peak"))
        .groupBy("peak").agg(min("ts").as("peak_at"))
        .crossJoin(nSess)
        .select(col("n_sessions"), col("peak"), col("peak_at"))
    }),

    // ---------------------------------------------------------------
    // q180: reciprocal-rank fusion — the standard hybrid-retrieval
    // combiner (Cormack et al. 2009; what every lexical+dense search
    // stack ships): fuse the BM25 ranking (q126) with the sparse
    // TF-IDF cosine ranking (q140) by RRF(d) = Σ_lists 1/(60+rank_d).
    // Each leg is the REGISTERED query — score-identical by
    // construction — and contributes its top-20. Ranks are recovered
    // WITHOUT a window: each ≤20-row leg collapses to one
    // collect_list, array_sort on (−score, doc_id) replays the leg's
    // exact (score desc, id asc) order, posexplode's ordinal is the
    // rank — bounded by the top-k contract, so no low-card window
    // partition and no single-task sort of anything unbounded. Each
    // 1/(60+rank) term quantizes half-up to 1e-9 units; the fused
    // score is a BIGINT sum.
    "q180_rrf_fusion" -> ((s, dir) => {
      def ranked(leg: org.apache.spark.sql.DataFrame, scoreCol: String) = leg
        .agg(collect_list(struct((-col(scoreCol)).as("ns"),
          col("doc_id").as("d"))).as("xs"))
        .select(posexplode(array_sort(col("xs"))).as(Seq("pos", "x")))
        .select(col("x.d").as("doc_id"), (col("pos") + 1).cast("long").as("rank"))
      val bm = ranked(
        queries("q126_bm25")(s, dir).select("doc_id", "score9"), "score9")
      val sp = ranked(
        MiningQueries.queries("q140_sparse_cosine_search")(s, dir), "cos9")
      bm.unionAll(sp)
        .select(col("doc_id"),
          floor(lit(1e9) / (lit(60) + col("rank")) + lit(0.5)).cast("long")
            .as("rrf_q"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_lists"), sum("rrf_q").as("rrf9"))
        .orderBy(col("rrf9").desc, col("doc_id"))
        .limit(10)
    }),

    // ---------------------------------------------------------------
    // q181: Shannon entropy of each source's token distribution — the
    // diversity leg of the corpus-drift family (q132 measures distance
    // BETWEEN distributions, this measures spread WITHIN one; both
    // feed domain-mixture decisions like q123/q135). H(source) =
    // −Σ_token p·ln p with p = c/T. Each token's term is ONE fixed
    // IEEE dag (division, ln, multiply, negate) quantized half-up to
    // 1e-9 units, so the per-source sum is exact BIGINT — order-free
    // and engine-portable; rounding is deterministic-identical on both
    // engines rather than absent (the q126 summed-quantized-terms
    // contract). Scale: one (source, token) aggregation — unbounded
    // key, map-side combinable — then a |sources|-row broadcast of the
    // totals; nothing else shuffles.
    "q181_source_entropy" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(col("source"), explode(Text.tokens(col("text"))).as("token"))
      val c = toks.groupBy("source", "token").agg(count(lit(1)).as("c"))
      val t = c.groupBy("source")
        .agg(sum("c").as("t"), count(lit(1)).as("vocab"))
      val p = col("c").cast("double") / col("t").cast("double")
      c.join(broadcast(t), "source")
        .select(col("source"), col("t"), col("vocab"),
          floor(-(p * log(p)) * lit(1e9) + lit(0.5)).cast("long").as("h_q"))
        .groupBy("source", "t", "vocab")
        .agg(sum("h_q").as("ent9"))
        .select(col("source"), col("t").as("n_tokens"), col("vocab"),
          col("ent9"))
        .orderBy("source")
    }),

    // ---------------------------------------------------------------
    // q183: referential-integrity audit — orphan counts across the
    // schema's FK edges (the data-quality check every warehouse load
    // runs next to q157's column profile). Each edge is ONE left join
    // of the child's FK column against the parent's DISTINCT keys
    // (no fan-out possible) folded into a single aggregate — n_child,
    // orphan rows, distinct orphan keys — so the cost per edge is one
    // equi-key shuffle of the child's key column, nothing else. The
    // four real edges prove the clean path; the fifth re-audits
    // lineitem→orders against a parent with an md5-carved 1/16 of
    // keys deterministically removed, so the orphan-detection path is
    // exercised with known-identity damage (the q162/q175 fixture
    // pattern).
    "q183_fk_orphans" -> ((s, dir) => {
      def audit(edge: String, child: org.apache.spark.sql.DataFrame,
                key: String, parent: org.apache.spark.sql.DataFrame,
                pkey: String) =
        child.select(col(key)).filter(col(key).isNotNull)
          .join(parent.select(col(pkey).as(key)).distinct()
            .withColumn("__hit", lit(1L)), Seq(key), "left")
          .agg(count(lit(1)).as("n_child"),
            coalesce(sum(when(col("__hit").isNull, 1L).otherwise(0L)), lit(0L))
              .as("n_orphans"),
            countDistinct(when(col("__hit").isNull, col(key)))
              .as("n_orphan_keys"))
          .select(lit(edge).as("fk"), col("n_child"), col("n_orphans"),
            col("n_orphan_keys"))
      val damaged = Tables.orders(s, dir).filter(
        substring(md5(concat(lit("fk:"), col("o_orderkey").cast("string"))),
          1, 1) =!= "0")
      audit("customer.c_nationkey->nation", Tables.customer(s, dir),
          "c_nationkey", Tables.nation(s, dir), "n_nationkey")
        .unionAll(audit("lineitem.l_orderkey->orders", Tables.lineitem(s, dir),
          "l_orderkey", Tables.orders(s, dir), "o_orderkey"))
        .unionAll(audit("lineitem.l_orderkey->orders[damaged]",
          Tables.lineitem(s, dir), "l_orderkey", damaged, "o_orderkey"))
        .unionAll(audit("lineitem.l_partkey->part", Tables.lineitem(s, dir),
          "l_partkey", Tables.part(s, dir), "p_partkey"))
        .unionAll(audit("orders.o_custkey->customer", Tables.orders(s, dir),
          "o_custkey", Tables.customer(s, dir), "c_custkey"))
        .orderBy("fk")
    }),

    // ---------------------------------------------------------------
    // q187: sequence pattern with NEGATION — "first view, then a
    // purchase within 3 days, with NO click in between": the
    // MATCH_RECOGNIZE shape SQL engines bolt on, composed here from
    // three user_id-keyed conditional aggregates (q128's funnel plus
    // the between-events negative condition it cannot express). Pass 1
    // anchors the pattern (first view); pass 2 finds the earliest
    // in-window purchase after the anchor; pass 3 counts blockers
    // strictly between the two. Every pass is a hash aggregate on the
    // unbounded user key — no windows, no per-user event buffering —
    // and the funnel counts collapse to one row of exact integers
    // (latency sums in whole seconds).
    "q187_pattern_negation" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select("user_id", "event_type", "ts")
      val anchors = ev.groupBy("user_id")
        .agg(min(when(col("event_type") === "view", col("ts"))).as("t_v"))
        .filter(col("t_v").isNotNull)
      val conv = ev.join(anchors, "user_id")
        .groupBy("user_id", "t_v")
        .agg(min(when(col("event_type") === "purchase" &&
          col("ts") > col("t_v") &&
          col("ts") <= col("t_v") + expr("INTERVAL 3 DAYS"), col("ts")))
          .as("t_p"))
      val blocked = ev.join(conv.filter(col("t_p").isNotNull), "user_id")
        .groupBy("user_id", "t_v", "t_p")
        .agg(sum(when(col("event_type") === "click" &&
          col("ts") > col("t_v") && col("ts") < col("t_p"), 1L)
          .otherwise(0L)).as("n_clicks_between"))
      conv.join(blocked, Seq("user_id", "t_v", "t_p"), "left")
        .agg(count(lit(1)).as("n_candidates"),
          count(col("t_p")).as("n_converted"),
          sum(when(col("t_p").isNotNull && col("n_clicks_between") === 0, 1L)
            .otherwise(0L)).as("n_clean"),
          coalesce(sum(when(col("n_clicks_between") === 0,
            unix_timestamp(col("t_p")) - unix_timestamp(col("t_v")))), lit(0L))
            .as("clean_latency_s"))
    }),

    // ---------------------------------------------------------------
    // q188: burst detection — brands whose weekly order volume spikes
    // against their own trailing 4-week baseline (the trending-topics
    // / corpus-monitoring shape on the order stream). The baseline is
    // built WITHOUT a per-key time window: each (brand, week, cnt) row
    // explodes onto the ≤4 later weeks it baselines (q138's bounded
    // fan-out), so one (brand, week)-keyed aggregation yields trailing
    // sums and the join back is equi-keyed — no RANGE window over a
    // low-cardinality partition anywhere, and the shape is identical
    // for an unbounded key (tokens, parts) at production density.
    // lift = 4·cnt/baseline as one quantized IEEE division; thresholds
    // are exact integers. Top 20 bursts, ties broken (week, brand).
    "q188_burst_brands" -> ((s, dir) => {
      val weekly = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
        .select(col("p_brand").as("brand"),
          to_date(date_trunc("week", col("o_orderdate"))).as("wk"))
        .groupBy("brand", "wk").agg(count(lit(1)).as("cnt"))
      val baseline = weekly
        .select(col("brand"), explode(sequence(lit(1), lit(4))).as("off"),
          col("wk"), col("cnt"))
        .select(col("brand"), date_add(col("wk"), col("off") * 7).as("wk"),
          col("cnt"))
        .groupBy("brand", "wk").agg(sum("cnt").as("base"))
      weekly.join(baseline, Seq("brand", "wk"))
        .filter(col("cnt") >= 8 && col("base") >= 12)
        .select(col("wk"), col("brand"), col("cnt"), col("base"),
          q9((col("cnt") * 4).cast("double") / col("base").cast("double"))
            .as("lift9"))
        .orderBy(col("lift9").desc, col("wk"), col("brand"))
        .limit(20)
    }),

    // ---------------------------------------------------------------
    // q192: MERGE / upsert (SCD type-1) — the warehouse MERGE INTO
    // statement expressed as its relational core: base ∪ updates via
    // ONE full outer join on the key, coalesce(update, base) per
    // column — update wins, unmatched updates insert, unmatched base
    // survives. Fixture carves deterministic change classes from
    // orders (q162's md5 pattern): base = keys with md5 nibble ≠ 'f',
    // updates = a carved slice with +1 cents (the overlap → updated)
    // plus the nibble-'f' keys base never had (→ inserted). The audit
    // row proves per-class counts AND the merged table's content via
    // an order-independent bit_xor digest over (key, cents) — q175's
    // whole-table checksum, so the oracle equality covers every row,
    // not just the counts.
    "q192_merge_upsert" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(col("o_orderkey").as("k"),
        floor(col("o_totalprice") * lit(100) + lit(0.5)).cast("long")
          .as("cents"),
        substring(md5(concat(lit("mg:"), col("o_orderkey").cast("string"))),
          1, 1).as("nib"))
      val base = o.filter(col("nib") =!= "f").select("k", "cents")
      val updates = o.filter(col("nib") === "0")
        .select(col("k"), (col("cents") + 1).as("cents"))
        .unionAll(o.filter(col("nib") === "f").select("k", "cents"))
      val merged = base.as("b")
        .join(updates.as("u"), col("b.k") === col("u.k"), "full")
        .select(coalesce(col("u.k"), col("b.k")).as("k"),
          coalesce(col("u.cents"), col("b.cents")).as("cents"),
          when(col("u.k").isNull, lit("kept"))
            .when(col("b.k").isNull, lit("inserted"))
            .otherwise(lit("updated")).as("cls"))
      merged
        .withColumn("h",
          conv(substring(md5(concat_ws(":", col("k").cast("string"),
            col("cents").cast("string"))), 1, 15), 16, 10).cast("long"))
        .groupBy("cls")
        .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("digest"))
        .orderBy("cls")
    }),

    // ---------------------------------------------------------------
    // q195: consistent-hashing shard rebalance audit — assign every
    // document to a shard by hash-ring successor lookup (16 shards × 8
    // virtual nodes), then re-assign on a 17-shard ring and measure
    // what moved: consistent hashing's contract is that ONLY keys
    // landing on the new shard's vnodes move (expected fraction ≈
    // 8/136 of the ring), vs. modulo sharding where ~16/17 of all
    // keys would. Both rings ride as 1-row broadcast sorted
    // struct-arrays (136 vnodes max); the per-doc successor lookup is
    // a filter+get HOF over that array — no join fan-out, no shuffle
    // beyond the final 1-row aggregate. get() (not element_at) for the
    // wrap-around: an empty filter result must yield NULL → coalesce
    // to the ring's first vnode, not an ANSI error.
    "q195_shard_rebalance" -> ((s, dir) => {
      def ring(shards: Int) = broadcast(
        s.range(0, shards * 8L).select(
          expr("id div 8").as("shard"), expr("id % 8").as("r"))
          .select(struct(
            conv(substring(md5(concat(lit("vn:"),
              col("shard").cast("string"), lit(":"),
              col("r").cast("string"))), 1, 15), 16, 10).cast("long")
              .as("vh"),
            col("shard")).as("vn"))
          .agg(sort_array(collect_list(col("vn"))).as("ring")))
      def assigned(ringCol: org.apache.spark.sql.Column,
                   h: org.apache.spark.sql.Column) =
        coalesce(
          get(filter(ringCol, x => x.getField("vh") >= h), lit(0)),
          get(ringCol, lit(0))).getField("shard")
      val docs = Tables.documents(s, dir).select(col("doc_id"),
        conv(substring(md5(concat(lit("doc:"), col("doc_id").cast("string"))),
          1, 15), 16, 10).cast("long").as("h"))
      docs
        .crossJoin(ring(16).select(col("ring").as("r16")))
        .crossJoin(ring(17).select(col("ring").as("r17")))
        .select(col("doc_id"),
          assigned(col("r16"), col("h")).as("s16"),
          assigned(col("r17"), col("h")).as("s17"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("s16") =!= col("s17"), 1L).otherwise(0L))
            .as("n_moved"),
          sum(when(col("s16") =!= col("s17") && col("s17") =!= 16, 1L)
            .otherwise(0L)).as("n_moved_elsewhere"))
        .select(col("n_docs"), col("n_moved"), col("n_moved_elsewhere"),
          q9(col("n_moved").cast("double") / col("n_docs").cast("double"))
            .as("moved_frac9"))
    }),

    // ---------------------------------------------------------------
    // q197: join-key skew diagnostics — the pre-flight report a 100 TB
    // join plan review starts from: per candidate shuffle key, the key
    // cardinality, the hottest key and its row count, and the skew
    // ratio max/avg = max·n_keys/n_rows (>> 1 ⇒ salt it, q156/q83's
    // cue). One value-count aggregation per key column (map-side
    // combinable), one struct-max for the deterministic hottest key
    // (largest count, smallest key on ties — q108's packed tie-break),
    // one quantized division. The key column is scanned alone: column
    // pruning keeps each audit a single-column pass.
    "q197_skew_diagnostics" -> ((s, dir) => {
      def audit(keyCol: String) = {
        val vc = Tables.lineitem(s, dir).groupBy(keyCol)
          .agg(count(lit(1)).as("cnt"))
        vc.agg(count(lit(1)).as("n_keys"), sum("cnt").as("n_rows"),
            max(struct(col("cnt"), (-col(keyCol)).as("nk"))).as("m"))
          .select(lit(keyCol).as("key_col"), col("n_rows"), col("n_keys"),
            (-col("m.nk")).as("hot_key"), col("m.cnt").as("hot_rows"),
            q9(col("m.cnt").cast("double") * col("n_keys").cast("double") /
              col("n_rows").cast("double")).as("skew9"))
      }
      audit("l_orderkey")
        .unionAll(audit("l_partkey"))
        .unionAll(audit("l_suppkey"))
        .orderBy("key_col")
    }),

    // ---------------------------------------------------------------
    // q198: linear-interpolation gap repair — the time-series cleaning
    // step q91's zero-fill gap detection stops short of: every event
    // with a NULL metric (md5-carved ~1/4 of purchase values, known
    // identity) is repaired by interpolating between its nearest
    // non-null neighbors IN TIME within the same user: v = v_prev +
    // (v_next − v_prev)·(t − t_prev)/(t_next − t_prev). The neighbor
    // lookup is two IGNORE-NULLS window functions (last_value/
    // first_value over the user_id sort — high-cardinality partition,
    // one shuffle); edges with only one neighbor take that neighbor
    // (ffill/bfill). Values quantize to cents and times to whole
    // seconds first, so the single interpolation division is the only
    // IEEE op and both engines replay it bit-identically. Output
    // aggregates the repair mass per event type.
    "q198_interpolate_gaps" -> ((s, dir) => {
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"),
          when(substring(md5(concat(lit("gap:"),
              col("event_id").cast("string"))), 1, 1).isin("0", "1", "2", "3"),
            lit(null).cast("long"))
            .otherwise(floor(col("value") * 100 + lit(0.5)).cast("long"))
            .as("v"),
          unix_timestamp(col("ts")).as("t"))
      val nb = ev
        .withColumn("pv", last("v", ignoreNulls = true)
          .over(byUser.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("pt", last(when(col("v").isNotNull, col("t")),
          ignoreNulls = true)
          .over(byUser.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("nv", first("v", ignoreNulls = true)
          .over(byUser.rowsBetween(1, Window.unboundedFollowing)))
        .withColumn("nt", first(when(col("v").isNotNull, col("t")),
          ignoreNulls = true)
          .over(byUser.rowsBetween(1, Window.unboundedFollowing)))
      val repaired = nb.withColumn("rv",
        when(col("v").isNotNull, col("v").cast("double"))
          // nt > pt guards the division: same-second neighbors fall
          // back to the previous value (ffill), not an Inf blow-up.
          .when(col("pv").isNotNull && col("nv").isNotNull &&
              col("nt") > col("pt"),
            col("pv").cast("double") +
              (col("nv") - col("pv")).cast("double") *
              (col("t") - col("pt")).cast("double") /
              (col("nt") - col("pt")).cast("double"))
          .otherwise(coalesce(col("pv"), col("nv")).cast("double")))
      repaired.groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_repaired"),
          sum(when(col("v").isNull && col("rv").isNull, 1L).otherwise(0L))
            .as("n_unrepairable"),
          sum(when(col("v").isNull, q9(col("rv")))).as("repaired_mass9"))
        .orderBy("event_type")
    }),

    // ---------------------------------------------------------------
    // q284: LARGEST-REMAINDER PRORATION — the billing/finance
    // allocation shape: distribute each order's 10% rebate pool
    // (integer cents) across its lineitems proportionally to extended
    // price, with the fractional cents assigned by the largest-
    // remainder method (Hamilton apportionment) so every order's
    // allocations sum EXACTLY to its pool — the invariant float
    // proration can't give. All integer: base_i = pool·w_i div W,
    // remainder rank per order (ties broken by linenumber), the first
    // (pool − Σbase) lines get +1 cent. Σrem is divisible by W, so
    // extra < #lines by construction. Windows partition on
    // l_orderkey — per-entity high-cardinality, bounded lines/order
    // (the schema contract) — and pool·w ≤ 5e14 sits far inside
    // BIGINT at any scale (prices don't grow with the corpus). The
    // output audits the invariant: per priority class, orders/lines/
    // bumped-line counts, total allocated cents, and resid_total ≡ 0
    // (Σalloc − Σpool) — the oracle recomputes all of it, so a
    // rounding defect in either engine breaks the hash.
    "q284_proration" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(col("o_orderkey").as("l_orderkey"),
        col("o_orderpriority").as("prio"),
        expr("cast(round(o_totalprice * 100, 0) as long) div 10").as("pool"))
      val li = Tables.lineitem(s, dir).select(col("l_orderkey"),
        col("l_linenumber").as("ln"),
        graft.functions.Exact.cents(col("l_extendedprice")).as("w"))
      val j = li.join(o, "l_orderkey")
      val byOrder = Window.partitionBy("l_orderkey")
      val a = j.withColumn("wsum", sum("w").over(byOrder))
        .withColumn("base", expr("(pool * w) div wsum"))
        .withColumn("rem", expr("(pool * w) % wsum"))
      val ranked = a
        .withColumn("rn", row_number().over(
          Window.partitionBy("l_orderkey").orderBy(col("rem").desc, col("ln"))))
        .withColumn("extra", (col("pool") - sum("base").over(byOrder)))
        .withColumn("alloc",
          col("base") + when(col("rn") <= col("extra"), 1L).otherwise(0L))
      val perOrder = ranked.groupBy("l_orderkey", "prio", "pool").agg(
        count(lit(1)).as("nl"),
        sum(when(col("rn") <= col("extra"), 1L).otherwise(0L)).as("bumped"),
        sum("alloc").as("alloc_sum"))
      perOrder.groupBy("prio").agg(
          count(lit(1)).as("n_orders"), sum("nl").as("n_lines"),
          sum("bumped").as("n_bumped"), sum("alloc_sum").as("alloc_total"),
          sum(col("alloc_sum") - col("pool")).as("resid_total"))
        .orderBy("prio")
    }),

    // ---------------------------------------------------------------
    // q287: INCLUSION-DEPENDENCY DISCOVERY — the cross-table
    // complement of q280's (intra-table) FD discovery and q246's
    // (declared-FK) integrity audit: over a candidate grid of
    // type-compatible column pairs, test A ⊆ B and report the
    // violation count + g3-style error (min deletions / |distinct A|)
    // for the pairs that fail — the Metanome/SPIDER-class schema
    // inference step that DISCOVERS the FK graph q246 assumes. One
    // branch per pair (the q252/q280 lesson: per-pair column-pruned
    // scans + narrow distinct shuffles beat any single wide plan);
    // each branch is distinct(A) left-join distinct(B) → one 2-sum
    // aggregate — no row explosion, any-scale safe. The grid spans
    // the 7 true FK INDs, the 2 reverse candidates the data genuinely
    // decides (customers without orders, parts never sold — hold or
    // fail per the generator), and the 25-value nation reverse.
    "q287_ind_discovery" -> ((s, dir) => {
      def branch(name: String, lhs: org.apache.spark.sql.DataFrame,
          lcol: String, rhs: org.apache.spark.sql.DataFrame,
          rcol: String) = {
        val l = lhs.select(col(lcol).cast("long").as("v")).distinct()
        val r = rhs.select(col(rcol).cast("long").as("rv")).distinct()
        l.join(r, col("v") === col("rv"), "left")
          .agg(count(lit(1)).as("n_lhs"),
            sum(when(col("rv").isNull, 1L).otherwise(0L)).as("n_missing"))
          .select(lit(name).as("pair"), col("n_lhs"), col("n_missing"),
            (col("n_missing") === 0L).cast("int").as("holds"),
            q9(col("n_missing").cast("double") / col("n_lhs").cast("double"))
              .as("err9"))
      }
      val c = Tables.customer(s, dir); val n = Tables.nation(s, dir)
      val o = Tables.orders(s, dir); val li = Tables.lineitem(s, dir)
      val p = Tables.part(s, dir); val su = Tables.supplier(s, dir)
      val r = Tables.region(s, dir)
      Seq(
        branch("c_nationkey<n_nationkey", c, "c_nationkey", n, "n_nationkey"),
        branch("s_nationkey<n_nationkey", su, "s_nationkey", n, "n_nationkey"),
        branch("n_regionkey<r_regionkey", n, "n_regionkey", r, "r_regionkey"),
        branch("o_custkey<c_custkey", o, "o_custkey", c, "c_custkey"),
        branch("l_orderkey<o_orderkey", li, "l_orderkey", o, "o_orderkey"),
        branch("l_partkey<p_partkey", li, "l_partkey", p, "p_partkey"),
        branch("l_suppkey<s_suppkey", li, "l_suppkey", su, "s_suppkey"),
        branch("c_custkey<o_custkey", c, "c_custkey", o, "o_custkey"),
        branch("p_partkey<l_partkey", p, "p_partkey", li, "l_partkey"),
        branch("n_nationkey<c_nationkey", n, "n_nationkey", c, "c_nationkey"))
        .reduce(_ unionAll _)
        .orderBy("pair")
    }),

    // ---------------------------------------------------------------
    // q288: l-DIVERSITY AUDIT — the privacy metric k-anonymity (q259)
    // famously fails to capture: a QI group can be large (k-anonymous)
    // yet expose everyone when all its members share one sensitive
    // value. QI = (nation, market segment), sensitive = the
    // 1000-currency-unit balance band. Output: the distribution of
    // distinct-l over QI groups (groups + members per l) plus each
    // l's failure flag against l ≥ 3 — two hash aggregates over the
    // QI key space, exact distinct via the (QI, band) pre-aggregate,
    // no windows, any-scale safe.
    "q288_l_diversity" -> ((s, dir) => {
      val qi = Tables.customer(s, dir)
        .select(col("c_nationkey").as("nk"), col("c_mktsegment").as("seg"),
          expr("cast(floor(c_acctbal / 1000.0) as long)").as("band"))
      val grp = qi.groupBy("nk", "seg", "band").agg(count(lit(1)).as("c"))
        .groupBy("nk", "seg")
        .agg(count(lit(1)).as("l"), sum("c").as("members"))
      grp.groupBy("l")
        .agg(count(lit(1)).as("n_groups"), sum("members").as("n_members"))
        .withColumn("violates", (col("l") < 3L).cast("int"))
        .orderBy("l")
    }),

    // ---------------------------------------------------------------
    // q297: INCREMENTAL VIEW MAINTENANCE, JOIN DELTA — the join-view
    // counterpart of q224's aggregate IVM: maintain V = O ⋈ L under
    // batch inserts with the textbook delta algebra ΔV = ΔO⋈L₀ ∪
    // O₀⋈ΔL ∪ ΔO⋈ΔL (each term |Δ|-proportional on the probe side; in
    // a stored deployment O₀/L₀ are key-partitioned so the probes are
    // co-located, never a view recompute). The delta batch is an
    // md5-carved ~1/8 of each table — deterministic, rerun-stable —
    // and the output is the MAINTAINED view's per-priority audit
    // aggregate, while the ORACLE is the plain full join+aggregate
    // that never sees the carve: the hash compare proves the delta
    // algebra exactly, the q286/q290/q292 compare-against-what-it-
    // avoids discipline.
    "q297_ivm_join_delta" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(col("o_orderkey").as("ok"),
        col("o_orderpriority").as("prio"),
        substring(md5(concat(lit("ivmo:"), col("o_orderkey").cast("string"))),
          1, 1).isin("0", "1").as("is_new"))
      val l = Tables.lineitem(s, dir).select(col("l_orderkey").as("ok"),
        graft.functions.Exact.cents(col("l_extendedprice")).as("p2"),
        substring(md5(concat(lit("ivml:"), col("l_orderkey").cast("string"),
          lit(":"), col("l_linenumber").cast("string"))), 1, 1)
          .isin("0", "1").as("is_new"))
      val o0 = o.filter(!col("is_new")).select("ok", "prio")
      val dO = o.filter(col("is_new")).select("ok", "prio")
      val l0 = l.filter(!col("is_new")).select("ok", "p2")
      val dL = l.filter(col("is_new")).select("ok", "p2")
      val base = o0.join(l0, "ok")
      val delta = dO.join(l0, "ok")
        .unionAll(o0.join(dL, "ok"))
        .unionAll(dO.join(dL, "ok"))
      base.unionAll(delta)
        .groupBy("prio")
        .agg(count(lit(1)).as("n_rows"), sum("p2").as("rev2"))
        .orderBy("prio")
    }),

    // ---------------------------------------------------------------
    // q298: MARKOV REMOVAL-EFFECT ATTRIBUTION — the data-driven
    // upgrade of q165's first-touch: credit each channel by how much
    // the journey-graph conversion probability DROPS when the channel
    // is removed (transitions into it absorb to NULL). The corpus
    // work is ONE distributed pass: per-user journeys (row_number +
    // lead over the high-cardinality user key), truncated at the
    // first purchase, folded to (src, dst) transition counts. The
    // chain math then runs on a BOUNDED COLLECT — ≤(|event types|+2)²
    // transition rows, a schema-contract constant, the
    // Similarity-centroid precedent — as 12 exact integer-damped
    // rounds p(s) ← (Σ c·p(dst)) div total(s) in 1e-9 units (BigInt
    // products; CONV/NULL pinned; truncating div on positives =
    // DuckDB //), one base chain + one per removed channel. Removal
    // effects clamp at 0 BEFORE dividing (floor-vs-truncate parity on
    // negatives), shares renormalize in integer units. The oracle
    // replays journeys, counts, and all five 12-round chains as
    // generated CTEs — bit-identical by construction.
    "q298_markov_attribution" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val r = Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("rn", row_number().over(w))
      val pp = r.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(min("rn").as("pp"))
      val path = r.join(pp, Seq("user_id"), "left")
        .filter(col("pp").isNull || col("rn") < col("pp"))
      val nx = path.withColumn("nt", lead("event_type", 1).over(w))
      val tr = nx.filter(col("nt").isNotNull)
          .select(col("event_type").as("src"), col("nt").as("dst"))
        .unionAll(path.filter(col("rn") === 1)
          .select(lit("START").as("src"), col("event_type").as("dst")))
        .unionAll(pp.filter(col("pp") === 1)
          .select(lit("START").as("src"), lit("CONV").as("dst")))
        .unionAll(nx.filter(col("nt").isNull)
          .select(col("event_type").as("src"),
            when(col("pp").isNotNull, lit("CONV")).otherwise(lit("NULL"))
              .as("dst")))
        .groupBy("src", "dst").agg(count(lit(1)).as("c"))
      // Bounded by the event-type domain — the documented constant.
      val trRows = tr.collect()
        .map(x => (x.getString(0), x.getString(1), x.getLong(2)))
      def convProb(trs: Seq[(String, String, Long)]): Long = {
        val tot = trs.groupBy(_._1).map { case (st, xs) =>
          st -> xs.map(x => BigInt(x._3)).sum }
        val bySrc = trs.groupBy(_._1)
        val abs0 = Map("CONV" -> 1000000000L, "NULL" -> 0L)
        var p = Map.empty[String, Long].withDefaultValue(0L)
        for (_ <- 1 to 12) {
          p = bySrc.map { case (st, xs) =>
            val num = xs.map { case (_, d, c) =>
              BigInt(c) * BigInt(abs0.getOrElse(d, p(d))) }.sum
            st -> (num / tot(st)).toLong
          }.withDefaultValue(0L)
        }
        p("START")
      }
      val channels = Seq("click", "error", "signup", "view")
      val pBase = convProb(trRows)
      val res = channels.map { ch =>
        val trs2 = trRows.filter(_._1 != ch)
          .map { case (s2, d, c) => (s2, if (d == ch) "NULL" else d, c) }
          .groupBy(t => (t._1, t._2))
          .map { case ((a, b), xs) => (a, b, xs.map(_._3).sum) }.toSeq
        val pc = convProb(trs2)
        val re9 = if (pBase == 0L) 0L
          else ((BigInt(pBase) - BigInt(pc)).max(BigInt(0)) *
            BigInt(1000000000L) / BigInt(pBase)).toLong
        (ch, pc, re9)
      }
      val sumRe = res.map(_._3).sum
      res.map { case (ch, pc, re9) =>
        val share9 = if (sumRe == 0L) 0L
          else (BigInt(re9) * BigInt(1000000000L) / BigInt(sumRe)).toLong
        (ch, pBase, pc, re9, share9)
      }.toDF("channel", "conv_base9", "conv_removed9", "re9", "share9")
        .orderBy("channel")
    })
  )

  /** q225's oracle: the same shift/mask Morton spread, grid, file
    * packing and envelope audit — one CTE chain per layout, unioned.
    * The spread ladder is written once and interpolated for x and y. */
  private val zorderOracleSql: String = {
    def spread(e: String) = {
      val s1 = s"(($e | ($e << 4)) & 3855)"
      val s2 = s"(($s1 | ($s1 << 2)) & 13107)"
      s"(($s2 | ($s2 << 1)) & 21845)"
    }
    def layoutCte(name: String, ord: String) =
      s"""f_$name AS (
         |  SELECT sum(cnt) OVER (ORDER BY $ord ROWS UNBOUNDED PRECEDING) - cnt AS cum0,
         |    x, y, cnt FROM cells),
         |g_$name AS (
         |  SELECT least(cum0 * 64 // t.total, 63) AS file_id,
         |    min(x) AS min_x, max(x) AS max_x,
         |    min(y) AS min_y, max(y) AS max_y, sum(cnt) AS rows_in_file,
         |    sum(CASE WHEN x BETWEEN 8 AND 15 AND y BETWEEN 8 AND 15
         |      THEN cnt ELSE 0 END) AS rows_matching
         |  FROM f_$name, tot t GROUP BY 1),
         |a_$name AS (
         |  SELECT '$name' AS layout, CAST(count(*) AS BIGINT) AS n_files,
         |    CAST(sum(CASE WHEN min_x <= 15 AND max_x >= 8 AND min_y <= 15
         |      AND max_y >= 8 THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
         |    CAST(sum(CASE WHEN min_x <= 15 AND max_x >= 8 AND min_y <= 15
         |      AND max_y >= 8 THEN rows_in_file ELSE 0 END) AS BIGINT) AS rows_scanned,
         |    CAST(sum(rows_matching) AS BIGINT) AS rows_matching
         |  FROM g_$name)""".stripMargin
    s"""WITH keyed AS (
       |  SELECT o_custkey % 64 AS x,
       |    (CAST(o_orderdate AS DATE) - DATE '1970-01-01') % 64 AS y
       |  FROM orders),
       |cells AS MATERIALIZED (
       |  SELECT x, y, count(*) AS cnt,
       |    ${spread("x")} | (${spread("y")} << 1) AS zv
       |  FROM keyed GROUP BY x, y),
       |tot AS (SELECT sum(cnt) AS total FROM cells),
       |${layoutCte("zorder", "zv, x, y")},
       |${layoutCte("linear", "x, y")}
       |SELECT * FROM a_zorder UNION ALL SELECT * FROM a_linear
       |ORDER BY layout""".stripMargin
  }

  override val oracles: Map[String, String] = Map(

    // q280: one generated g3 branch per candidate pair.
    "q280_fd_discovery" -> {
      def g3(tab: String, x: String, y: String): String =
        s"""SELECT '$x->$y' AS fd, n, n_x, n - keep AS violations,
           |  CAST(floor(CAST(n - keep AS DOUBLE) / CAST(n AS DOUBLE)
           |    * 1e9 + 0.5) AS BIGINT) AS g3_err9,
           |  CAST(n = keep AS INT) AS holds
           |FROM (SELECT CAST(sum(mc) AS BIGINT) AS keep,
           |    CAST(sum(nx) AS BIGINT) AS n,
           |    CAST(count(*) AS BIGINT) AS n_x
           |  FROM (SELECT x, max(c) AS mc, sum(c) AS nx
           |    FROM (SELECT $x AS x, $y AS y, count(*) AS c
           |      FROM $tab GROUP BY 1, 2) GROUP BY x))""".stripMargin
      Seq(
        g3("documents", "doc_id", "source"),
        g3("documents", "source", "lang"),
        g3("documents", "lang", "source"),
        g3("lineitem", "l_orderkey", "l_linestatus"),
        g3("lineitem", "l_suppkey", "l_returnflag"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY fd")
    },

    // ndcg: q126's contrib dag, same self-join peer-count ranks,
    // same embedded weight literals and gain lattice.
    "q253_ndcg" -> {
      val wvals = NdcgW9.zipWithIndex
        .map { case (w, i) => s"(${i + 1}, $w)" }.mkString(", ")
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
         |    t -> t <> '')) AS token FROM documents),
         |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
         |stats AS (SELECT count(*) AS n,
         |  CAST(sum(dl) AS DOUBLE)/count(*) AS avgdl FROM dl),
         |qt AS (SELECT * FROM (VALUES ('join'),('hash'),('vector')) q(token)),
         |df AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks
         |  WHERE token IN (SELECT token FROM qt) GROUP BY 1),
         |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks
         |  WHERE token IN (SELECT token FROM qt) GROUP BY 1, 2),
         |contrib AS (
         |  SELECT tf.doc_id, CAST(floor(
         |    (floor(ln(1.0 + (stats.n - df.df + 0.5)/(df.df + 0.5))*1e9 + 0.5)/1e9)
         |    * (CAST(tf.tf AS DOUBLE)*2.2
         |       / (CAST(tf.tf AS DOUBLE) + 1.2*(0.25 + 0.75*dl.dl/stats.avgdl)))
         |    * 1e9 + 0.5) AS BIGINT) AS c9
         |  FROM tf JOIN df USING (token) JOIN dl USING (doc_id) CROSS JOIN stats),
         |scored AS (SELECT doc_id, CAST(sum(c9) AS BIGINT) AS score9
         |  FROM contrib GROUP BY doc_id),
         |rel AS (SELECT doc_id, CAST(count(DISTINCT token) AS BIGINT) AS rel
         |  FROM toks WHERE token IN (SELECT token FROM qt) GROUP BY doc_id),
         |tops AS MATERIALIZED (SELECT doc_id, score9 FROM scored
         |  ORDER BY score9 DESC, doc_id LIMIT 10),
         |rks AS (SELECT a.doc_id, count(*) AS rk FROM tops a JOIN tops b
         |  ON b.score9 > a.score9
         |    OR (b.score9 = a.score9 AND b.doc_id <= a.doc_id)
         |  GROUP BY a.doc_id),
         |topr AS MATERIALIZED (SELECT doc_id, rel FROM rel
         |  ORDER BY rel DESC, doc_id LIMIT 10),
         |rkr AS (SELECT a.doc_id, count(*) AS rk FROM topr a JOIN topr b
         |  ON b.rel > a.rel OR (b.rel = a.rel AND b.doc_id <= a.doc_id)
         |  GROUP BY a.doc_id),
         |w(rk, w9) AS (SELECT * FROM (VALUES $wvals)),
         |dcg AS (SELECT CAST(sum(
         |    ((CAST(1 AS BIGINT) << CAST(rel AS INTEGER)) - 1) * w9)
         |    AS BIGINT) AS dcg9
         |  FROM rks JOIN rel USING (doc_id) JOIN w USING (rk)),
         |idcg AS (SELECT CAST(sum(
         |    ((CAST(1 AS BIGINT) << CAST(rel AS INTEGER)) - 1) * w9)
         |    AS BIGINT) AS idcg9
         |  FROM rkr JOIN rel USING (doc_id) JOIN w USING (rk))
         |SELECT dcg9, idcg9,
         |  CAST(dcg9 AS DOUBLE) / CAST(idcg9 AS DOUBLE) AS ndcg
         |FROM dcg, idcg""".stripMargin
    },

    // column-profile: one UNION ALL branch per column, same
    // deterministic renderings.
    "q252_column_profile" -> {
      val branches = Seq(
        ("o_orderkey", "o_orderkey"),
        ("o_custkey", "o_custkey"),
        ("o_orderstatus", "o_orderstatus"),
        ("o_totalprice_cents", "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"),
        ("o_orderdate", "CAST(o_orderdate AS DATE)"),
        ("o_orderpriority", "o_orderpriority"))
        .map { case (n, e) =>
          s"""SELECT '$n' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(CASE WHEN ($e) IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_nulls,
             |  CAST(count(DISTINCT ($e)) AS BIGINT) AS n_distinct,
             |  CAST(min($e) AS VARCHAR) AS min_str,
             |  CAST(max($e) AS VARCHAR) AS max_str
             |FROM orders""".stripMargin }
        .mkString("\nUNION ALL\n")
      s"""SELECT * FROM (\n$branches\n) ORDER BY column_name"""
    },

    // kaplan-meier: same subject derivation, risk-set recurrence,
    // quantized log factors and cumulative survival sum.
    "q247_kaplan_meier" ->
      """WITH su AS (SELECT user_id, min(ts) AS s0 FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |conv AS (SELECT e.user_id, min(e.ts) AS p0
        |  FROM events e JOIN su ON e.user_id = su.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= su.s0
        |  GROUP BY e.user_id),
        |dmax AS (SELECT max(CAST(ts AS DATE)) AS dmax FROM events),
        |subj AS (SELECT
        |    CAST(CASE WHEN p0 IS NOT NULL
        |      THEN datediff('day', CAST(s0 AS DATE), CAST(p0 AS DATE))
        |      ELSE datediff('day', CAST(s0 AS DATE), dmax) END AS BIGINT)
        |      AS t,
        |    CASE WHEN p0 IS NOT NULL THEN 1 ELSE 0 END AS ev
        |  FROM su LEFT JOIN conv USING (user_id) CROSS JOIN dmax),
        |byt AS (SELECT t, CAST(sum(ev) AS BIGINT) AS d,
        |    CAST(sum(1 - ev) AS BIGINT) AS c
        |  FROM subj GROUP BY t),
        |n AS (SELECT CAST(sum(d + c) AS BIGINT) AS n FROM byt),
        |r AS (SELECT t, d, c,
        |    n.n - (sum(d + c) OVER (ORDER BY t) - (d + c)) AS n_risk
        |  FROM byt, n),
        |f AS (SELECT t, n_risk, d, c,
        |    CASE WHEN d = 0 THEN 0
        |      WHEN d < n_risk THEN CAST(floor(
        |        ln(CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE))
        |        * 1e9 + 0.5) AS BIGINT)
        |      ELSE -50000000000 END AS term9
        |  FROM r)
        |SELECT t, CAST(n_risk AS BIGINT) AS n_risk, d, c,
        |  CAST(sum(term9) OVER (ORDER BY t) AS BIGINT) AS log_s9
        |FROM f ORDER BY t""".stripMargin,

    // wow: same weekly cells, lag, nullif-guarded division.
    "q268_wow_growth" ->
      """WITH w AS (SELECT event_type AS t,
        |    CAST(date_trunc('week', ts) AS DATE) AS wk,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT t, wk, cents,
        |    lag(cents) OVER (PARTITION BY t ORDER BY wk) AS prev FROM w)
        |SELECT t AS event_type, wk, cents, prev,
        |  CAST(cents - prev AS DOUBLE) /
        |    CAST(nullif(prev, 0) AS DOUBLE) AS wow_growth
        |FROM l ORDER BY event_type, wk""".stripMargin,

    // freshness: same per-table watermark + trailing-24h count.
    "q269_freshness_audit" ->
      """WITH e AS (SELECT 'events' AS table_name, max(ts) AS watermark,
        |    CAST(count(*) AS BIGINT) AS n_rows,
        |    (SELECT CAST(count(*) AS BIGINT) FROM events
        |     WHERE CAST(epoch(ts) AS BIGINT) >=
        |       (SELECT CAST(epoch(max(ts)) AS BIGINT) - 86400 FROM events))
        |      AS n_last_24h
        |  FROM events),
        |o AS (SELECT 'orders', max(o_orderdate),
        |    CAST(count(*) AS BIGINT),
        |    (SELECT CAST(count(*) AS BIGINT) FROM orders
        |     WHERE CAST(epoch(o_orderdate) AS BIGINT) >=
        |       (SELECT CAST(epoch(max(o_orderdate)) AS BIGINT) - 86400
        |        FROM orders))
        |  FROM orders),
        |l AS (SELECT 'lineitem', max(l_shipdate),
        |    CAST(count(*) AS BIGINT),
        |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem
        |     WHERE CAST(epoch(l_shipdate) AS BIGINT) >=
        |       (SELECT CAST(epoch(max(l_shipdate)) AS BIGINT) - 86400
        |        FROM lineitem))
        |  FROM lineitem)
        |SELECT * FROM (SELECT * FROM e UNION ALL SELECT * FROM o
        |  UNION ALL SELECT * FROM l)
        |ORDER BY table_name""".stripMargin,

    // jain: same HRW loads, exact moment sums, one double dag.
    "q270_jain_fairness" ->
      """WITH k AS (SELECT c_custkey AS k FROM customer),
        |n AS (SELECT unnest(generate_series(0, 15)) AS node),
        |sc AS (SELECT k.k, n.node,
        |    CAST(('0x' || substring(md5('hrw:' || CAST(n.node AS VARCHAR) ||
        |      ':' || CAST(k.k AS VARCHAR)), 1, 15)) AS BIGINT) AS score
        |  FROM k CROSS JOIN n),
        |a AS (SELECT k, arg_max(node, score) AS node FROM sc GROUP BY k),
        |loads AS (SELECT node, CAST(count(*) AS BIGINT) AS x
        |  FROM a GROUP BY node)
        |SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(x) AS BIGINT) AS sx,
        |  CAST(sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS BIGINT)
        |    AS sxx,
        |  CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE) /
        |    (CAST(count(*) AS DOUBLE) *
        |     CAST(sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS DOUBLE))
        |    AS jain
        |FROM loads""".stripMargin,

    // streaks: same day-rank island id, per-user max, distribution.
    "q271_activity_streaks" ->
      """WITH days AS (SELECT DISTINCT user_id,
        |    CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS d
        |  FROM events),
        |isl AS (SELECT user_id,
        |    d - row_number() OVER (PARTITION BY user_id ORDER BY d)
        |      AS island
        |  FROM days),
        |runs AS (SELECT user_id, island, count(*) AS len
        |  FROM isl GROUP BY 1, 2),
        |best AS (SELECT user_id, CAST(max(len) AS BIGINT) AS best_streak
        |  FROM runs GROUP BY user_id)
        |SELECT best_streak, CAST(count(*) AS BIGINT) AS n_users
        |FROM best GROUP BY best_streak ORDER BY best_streak""".stripMargin,

    // kwic: same 1-based instr, clamp and width.
    "q266_kwic_snippets" ->
      """SELECT doc_id, CAST(strpos(text, 'vector') AS INTEGER) AS pos,
        |  substring(text, CAST(greatest(strpos(text, 'vector') - 20, 1)
        |    AS INTEGER), 50) AS snippet
        |FROM documents WHERE strpos(text, 'vector') > 0
        |ORDER BY doc_id LIMIT 25""".stripMargin,

    // trigrams: same two lags, global counts, (support desc, pattern)
    // top-20.
    "q263_event_trigrams" ->
      """WITH l AS (SELECT event_type AS e3,
        |    lag(event_type, 1) OVER w AS e2,
        |    lag(event_type, 2) OVER w AS e1
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |tri AS (SELECT e1, e2, e3, count(*) AS support FROM l
        |  WHERE e1 IS NOT NULL GROUP BY 1, 2, 3),
        |tot AS (SELECT CAST(sum(support) AS BIGINT) AS n_tri FROM tri)
        |SELECT e1 || '>' || e2 || '>' || e3 AS pattern,
        |  CAST(support AS BIGINT) AS support,
        |  CAST(support AS DOUBLE) / CAST(n_tri AS DOUBLE) AS share
        |FROM tri, tot
        |ORDER BY support DESC, pattern LIMIT 20""".stripMargin,

    // mad: same value-count lower medians, cross-multiplied 3σ rule.
    "q264_mad_outliers" ->
      """WITH c AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |    AS v FROM orders),
        |vc AS (SELECT v, count(*) AS cnt FROM c GROUP BY v),
        |n1 AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM vc),
        |med AS (SELECT min(v) AS med FROM
        |  (SELECT v, sum(cnt) OVER (ORDER BY v) AS cum FROM vc), n1
        |  WHERE cum * 2 >= n),
        |dev AS (SELECT abs(v - med) AS v, CAST(sum(cnt) AS BIGINT) AS cnt
        |  FROM vc, med GROUP BY 1),
        |n2 AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM dev),
        |mad AS (SELECT min(v) AS mad FROM
        |  (SELECT v, sum(cnt) OVER (ORDER BY v) AS cum FROM dev), n2
        |  WHERE cum * 2 >= n),
        |f AS (SELECT med, mad,
        |    CASE WHEN abs(v - med) * 10000 > 44478 * mad THEN 1 ELSE 0 END
        |      AS is_out
        |  FROM c, med, mad)
        |SELECT CAST(min(med) AS BIGINT) AS med,
        |  CAST(min(mad) AS BIGINT) AS mad,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(is_out) AS BIGINT) AS n_outliers,
        |  CAST(sum(is_out) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |    AS outlier_rate
        |FROM f""".stripMargin,

    // cohort-ltv: same signup-week cohorts, week-offset cells,
    // per-cohort cumulative window.
    "q265_cohort_ltv" ->
      """WITH cohort AS (SELECT user_id,
        |    CAST(date_trunc('week', min(ts)) AS DATE) AS cw
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |sizes AS (SELECT cw, CAST(count(*) AS BIGINT) AS n_users
        |  FROM cohort GROUP BY cw),
        |cells AS (SELECT c.cw,
        |    CAST(floor(datediff('day', c.cw, CAST(e.ts AS DATE)) / 7)
        |      AS BIGINT) AS wk,
        |    CAST(sum(CAST(floor(e.value * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS rev
        |  FROM events e JOIN cohort c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= c.cw
        |  GROUP BY 1, 2),
        |cum AS (SELECT cw, wk, rev,
        |    sum(rev) OVER (PARTITION BY cw ORDER BY wk) AS cum_rev
        |  FROM cells)
        |SELECT cum.cw AS cohort_week, wk, rev,
        |  CAST(cum_rev AS BIGINT) AS cum_rev,
        |  CAST(cum_rev AS DOUBLE) / CAST(n_users AS DOUBLE) AS ltv_per_user
        |FROM cum JOIN sizes ON cum.cw = sizes.cw
        |ORDER BY cohort_week, wk""".stripMargin,

    // winback: same per-user lag, epoch-second gap test, day rollup.
    "q258_winback" ->
      """WITH l AS (SELECT user_id, ts, event_id,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev
        |  FROM events),
        |r AS (SELECT user_id, ts FROM l
        |  WHERE prev IS NOT NULL
        |    AND CAST(epoch(ts) AS BIGINT) - CAST(epoch(prev) AS BIGINT)
        |      >= 172800)
        |SELECT CAST(ts AS DATE) AS return_day,
        |  CAST(count(*) AS BIGINT) AS n_winbacks,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM r GROUP BY 1 ORDER BY return_day""".stripMargin,

    // k-anonymity: same QI grouping and sub-k accounting.
    "q259_k_anonymity" ->
      """WITH g AS (SELECT c_nationkey, c_mktsegment, count(*) AS sz
        |  FROM customer GROUP BY 1, 2)
        |SELECT CAST(5 AS BIGINT) AS k,
        |  CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(sum(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_violating_groups,
        |  CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
        |    AS n_risk_rows,
        |  CAST(min(sz) AS BIGINT) AS min_group_size,
        |  CAST(sum(sz) AS BIGINT) AS n_rows
        |FROM g""".stripMargin,

    // fk-integrity: NOT EXISTS mirrors of the four anti joins.
    "q246_fk_integrity" ->
      """WITH a AS (SELECT 'lineitem->orders' AS relation,
        |    (SELECT count(*) FROM lineitem) AS n_rows,
        |    (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |      AS n_orphans),
        |b AS (SELECT 'lineitem->supplier' AS relation,
        |    (SELECT count(*) FROM lineitem) AS n_rows,
        |    (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |      (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
        |      AS n_orphans),
        |c AS (SELECT 'orders->customer' AS relation,
        |    (SELECT count(*) FROM orders) AS n_rows,
        |    (SELECT count(*) FROM orders o WHERE NOT EXISTS
        |      (SELECT 1 FROM customer cu WHERE cu.c_custkey = o.o_custkey))
        |      AS n_orphans),
        |d AS (SELECT 'orders-without-lineitem' AS relation,
        |    (SELECT count(*) FROM orders) AS n_rows,
        |    (SELECT count(*) FROM orders o WHERE NOT EXISTS
        |      (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey))
        |      AS n_orphans)
        |SELECT relation, CAST(n_rows AS BIGINT) AS n_rows,
        |  CAST(n_orphans AS BIGINT) AS n_orphans
        |FROM (SELECT * FROM a UNION ALL SELECT * FROM b
        |  UNION ALL SELECT * FROM c UNION ALL SELECT * FROM d)
        |ORDER BY relation""".stripMargin,

    // compaction: same per-day file synthesis, same start-offset
    // integer-div grouping rule.
    "q240_compaction_plan" ->
      """WITH files AS (SELECT CAST(l_shipdate AS DATE) AS day,
        |    count(*) AS nrows, count(*) * 100 AS bytes
        |  FROM lineitem GROUP BY 1),
        |c AS (SELECT day, nrows, bytes,
        |    sum(bytes) OVER (ORDER BY day) AS cum FROM files),
        |g AS (SELECT (cum - bytes) // 262144 AS grp, nrows, bytes, day FROM c)
        |SELECT CAST(grp AS BIGINT) AS grp, CAST(count(*) AS BIGINT) AS n_files,
        |  CAST(sum(bytes) AS BIGINT) AS total_bytes,
        |  CAST(sum(nrows) AS BIGINT) AS total_rows,
        |  min(day) AS first_day, max(day) AS last_day
        |FROM g GROUP BY grp ORDER BY grp""".stripMargin,

    // rendezvous: same md5 scores, arg-max per key (scores are 60-bit
    // md5 prefixes — distinct by construction), same node summaries.
    "q241_rendezvous_hash" ->
      """WITH k AS (SELECT c_custkey AS k FROM customer),
        |n AS (SELECT unnest(generate_series(0, 16)) AS node),
        |sc AS (SELECT k.k, n.node,
        |    CAST(('0x' || substring(md5('hrw:' || CAST(n.node AS VARCHAR) ||
        |      ':' || CAST(k.k AS VARCHAR)), 1, 15)) AS BIGINT) AS score
        |  FROM k CROSS JOIN n),
        |a AS (SELECT k,
        |    arg_max(node, score) FILTER (WHERE node < 16) AS a16,
        |    arg_max(node, score) AS a17
        |  FROM sc GROUP BY k),
        |l16 AS (SELECT a16 AS node, count(*) AS load16 FROM a GROUP BY 1),
        |l17 AS (SELECT a17 AS node, count(*) AS load17 FROM a GROUP BY 1),
        |mv AS (SELECT a17 AS node, count(*) AS moved_in FROM a
        |  WHERE a16 <> a17 GROUP BY 1)
        |SELECT CAST(n.node AS BIGINT) AS node,
        |  CAST(coalesce(load16, 0) AS BIGINT) AS load16,
        |  CAST(coalesce(load17, 0) AS BIGINT) AS load17,
        |  CAST(coalesce(moved_in, 0) AS BIGINT) AS moved_in
        |FROM n LEFT JOIN l16 USING (node) LEFT JOIN l17 USING (node)
        |LEFT JOIN mv USING (node) ORDER BY node""".stripMargin,

    // ab-ztest: same parity arms, same per-user max-conversion
    // aggregate, same pooled-variance double dag.
    "q235_ab_ztest" ->
      """WITH pu AS (SELECT user_id % 2 AS arm,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
        |  FROM events GROUP BY user_id, CAST(ts AS DATE)),
        |ag AS (SELECT
        |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT) AS c_a,
        |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT) AS c_b
        |  FROM pu)
        |SELECT n_a, c_a, n_b, c_b,
        |  (CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE) -
        |   CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE)) /
        |  sqrt((CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)) *
        |    (1.0 - CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)) *
        |    (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))) AS z
        |FROM ag""".stripMargin,

    // hdr-histogram: same top-5-bit truncation via binary-string
    // length, same integer cum·100 ≥ pct·n rank rule.
    "q236_hdr_histogram" ->
      """WITH vals AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
        |  FROM orders),
        |b AS (SELECT
        |    (v >> greatest(length(printf('%b', v)) - 5, 0))
        |      << greatest(length(printf('%b', v)) - 5, 0) AS lb,
        |    CAST(1 AS BIGINT) << greatest(length(printf('%b', v)) - 5, 0) AS w
        |  FROM vals),
        |buckets AS (SELECT lb, w, count(*) AS cnt FROM b GROUP BY lb, w),
        |cum AS (SELECT lb, w, cnt,
        |    sum(cnt) OVER (ORDER BY lb) AS cum FROM buckets),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM buckets),
        |qs AS (SELECT unnest([50, 90, 95, 99]) AS pct),
        |hit AS (SELECT qs.pct, cum.lb, cum.w, cum.cum, tot.n,
        |    row_number() OVER (PARTITION BY qs.pct ORDER BY cum.lb) AS rk
        |  FROM qs, cum, tot WHERE cum.cum * 100 >= qs.pct * tot.n)
        |SELECT CAST(pct AS BIGINT) AS pct, lb AS lo_bound,
        |  lb + w - 1 AS hi_bound, CAST(cum AS BIGINT) AS cum_count, n
        |FROM hit WHERE rk = 1 ORDER BY pct""".stripMargin,

    // psi: same fixed cents bins, same Laplace smoothing, same
    // division→ln→product dag quantized per bin.
    "q231_psi_drift" ->
      """WITH e AS (SELECT
        |    least(CAST(floor(value * 100 + 0.5) AS BIGINT) // 5000, 9) AS bin,
        |    CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS is_curr
        |  FROM events),
        |cell AS (SELECT bin, CAST(sum(1 - is_curr) AS BIGINT) AS cb,
        |    CAST(sum(is_curr) AS BIGINT) AS cc FROM e GROUP BY bin),
        |tot AS (SELECT CAST(sum(cb) AS BIGINT) AS nb,
        |    CAST(sum(cc) AS BIGINT) AS nc FROM cell),
        |g AS (SELECT b.bin, CAST(coalesce(cell.cb, 0) AS BIGINT) AS cb,
        |    CAST(coalesce(cell.cc, 0) AS BIGINT) AS cc
        |  FROM (SELECT unnest(generate_series(0, 9)) AS bin) b
        |  LEFT JOIN cell ON b.bin = cell.bin)
        |SELECT CAST(g.bin AS BIGINT) AS bin, cb AS c_base, cc AS c_curr,
        |  CAST(floor(
        |    (CAST(cb + 1 AS DOUBLE) / CAST(nb + 10 AS DOUBLE) -
        |     CAST(cc + 1 AS DOUBLE) / CAST(nc + 10 AS DOUBLE)) *
        |    ln(CAST((cb + 1) * (nc + 10) AS DOUBLE) /
        |       CAST((cc + 1) * (nb + 10) AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)
        |    AS term9
        |FROM g, tot ORDER BY bin""".stripMargin,

    // benford: same string-first-char digit, same 1e-9 constants, same
    // quantized per-digit χ² terms.
    "q227_benford_audit" ->
      """WITH c AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
        |  FROM orders),
        |obs AS (SELECT CAST(substring(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit,
        |    count(*) AS observed FROM c GROUP BY 1),
        |p AS (SELECT CAST(digit AS BIGINT) AS digit, CAST(p9 AS BIGINT) AS p9
        |  FROM (VALUES (1, 301029996), (2, 176091259), (3, 124938737),
        |    (4, 96910013), (5, 79181246), (6, 66946790), (7, 57991947),
        |    (8, 51152522), (9, 45757491)) AS t(digit, p9)),
        |n AS (SELECT CAST(sum(observed) AS BIGINT) AS n FROM obs),
        |g AS (SELECT p.digit, CAST(coalesce(obs.observed, 0) AS BIGINT) AS observed,
        |    p.p9 FROM p LEFT JOIN obs ON p.digit = obs.digit),
        |f AS (SELECT digit, observed, n.n * p9 AS e9,
        |    observed * 1000000000 - n.n * p9 AS diff9 FROM g, n)
        |SELECT digit, observed, e9,
        |  CAST(floor((CAST(diff9 AS DOUBLE) / 1e9) * (CAST(diff9 AS DOUBLE) / 1e9) /
        |    (CAST(e9 AS DOUBLE) / 1e9) * 1e9 + 0.5) AS BIGINT) AS term9
        |FROM f ORDER BY digit""".stripMargin,

    // incremental-agg: the oracle recomputes the maintained state from
    // the full table in one pass — the merge law is the thing checked.
    "q224_incremental_agg" ->
      """WITH full_agg AS (
        |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS total_cents,
        |    CAST(max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS max_cents,
        |    CAST(max(CASE WHEN o_orderdate >= TIMESTAMP '1999-01-01'
        |      THEN 1 ELSE 0 END) AS INT) AS touched_by_delta
        |  FROM orders GROUP BY o_custkey)
        |SELECT o_custkey, n_orders, total_cents, max_cents, touched_by_delta
        |FROM full_agg ORDER BY o_custkey""".stripMargin,

    "q225_zorder_audit" -> zorderOracleSql,

    "q126_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
        |    t -> t <> '')) AS token FROM documents),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
        |stats AS (SELECT count(*) AS n,
        |  CAST(sum(dl) AS DOUBLE)/count(*) AS avgdl FROM dl),
        |qt AS (SELECT * FROM (VALUES ('join'),('hash'),('vector')) q(token)),
        |df AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks
        |  WHERE token IN (SELECT token FROM qt) GROUP BY 1),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks
        |  WHERE token IN (SELECT token FROM qt) GROUP BY 1, 2),
        |contrib AS (
        |  SELECT tf.doc_id, CAST(floor(
        |    (floor(ln(1.0 + (stats.n - df.df + 0.5)/(df.df + 0.5))*1e9 + 0.5)/1e9)
        |    * (CAST(tf.tf AS DOUBLE)*2.2
        |       / (CAST(tf.tf AS DOUBLE) + 1.2*(0.25 + 0.75*dl.dl/stats.avgdl)))
        |    * 1e9 + 0.5) AS BIGINT) AS c9
        |  FROM tf JOIN df USING (token) JOIN dl USING (doc_id) CROSS JOIN stats)
        |SELECT doc_id, CAST(sum(c9) AS BIGINT) AS score9,
        |  CAST(sum(c9) AS BIGINT)/1e9 AS score
        |FROM contrib GROUP BY doc_id
        |ORDER BY score9 DESC, doc_id LIMIT 20""".stripMargin,

    // q133: the index manifest — per-term df and occurrence mass,
    // replayed from the raw corpus.
    "q133_postings_build" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
        |    t -> t <> '')) AS token FROM documents)
        |SELECT token, count(DISTINCT doc_id) AS df,
        |  count(*) AS total_tf
        |FROM toks GROUP BY token ORDER BY token""".stripMargin,

    // q211: block-local gap encoding replayed with the same
    // (token, bucket) window; DuckDB's bin() agrees with Spark's
    // (including bin(0) = '0') and // is the div twin for these
    // non-negative operands.
    "q211_postings_delta" ->
      """WITH posts AS (
        |  SELECT DISTINCT doc_id, token, doc_id // 4096 AS bucket FROM (
        |    SELECT doc_id, unnest(list_filter(string_split(text, ' '),
        |      t -> t <> '')) AS token FROM documents)),
        |gaps AS (
        |  SELECT token, bucket,
        |    coalesce(doc_id - lag(doc_id) OVER (
        |      PARTITION BY token, bucket ORDER BY doc_id), doc_id) AS gap
        |  FROM posts),
        |stats AS (
        |  SELECT token, count(*) AS n_docs,
        |    count(DISTINCT bucket) AS n_blocks,
        |    CAST(sum(length(bin(gap))) AS BIGINT) AS delta_bits
        |  FROM gaps GROUP BY token)
        |SELECT token, n_docs, n_blocks, delta_bits,
        |  n_docs * 64 AS raw_bits,
        |  CAST(((n_docs * 64 - delta_bits) * 100) // (n_docs * 64) AS INT)
        |    AS pct_saved
        |FROM stats ORDER BY n_docs DESC, token LIMIT 20""".stripMargin,

    // q217: the fold replayed — same op tagging, same (ts, event_id)
    // replay order, same integer digest.
    "q217_cdc_fold" ->
      """WITH log AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN substring(md5('op:' || CAST(event_id AS VARCHAR)), 1, 1) < '2'
        |           THEN 'D'
        |         WHEN substring(md5('op:' || CAST(event_id AS VARCHAR)), 1, 1) < '7'
        |           THEN 'I'
        |         ELSE 'U' END AS op,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |last AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM log) WHERE rn = 1)
        |SELECT count(*) AS n_keys,
        |  CAST(sum(CASE WHEN op <> 'D' THEN 1 ELSE 0 END) AS BIGINT) AS n_alive,
        |  CAST(sum(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_tombstoned,
        |  CAST(sum(CASE WHEN op <> 'D' THEN cents ELSE 0 END) AS BIGINT)
        |    AS alive_cents,
        |  bit_xor(CASE WHEN op <> 'D'
        |    THEN user_id * 100000000 + cents ELSE 0 END) AS state_digest
        |FROM last""".stripMargin,

    // q134: identical result contract to q126 — same oracle replay.
    "q134_bm25_indexed" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
        |    t -> t <> '')) AS token FROM documents),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
        |stats AS (SELECT count(*) AS n,
        |  CAST(sum(dl) AS DOUBLE)/count(*) AS avgdl FROM dl),
        |qt AS (SELECT * FROM (VALUES ('join'),('hash'),('vector')) q(token)),
        |df AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks
        |  WHERE token IN (SELECT token FROM qt) GROUP BY 1),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks
        |  WHERE token IN (SELECT token FROM qt) GROUP BY 1, 2),
        |contrib AS (
        |  SELECT tf.doc_id, CAST(floor(
        |    (floor(ln(1.0 + (stats.n - df.df + 0.5)/(df.df + 0.5))*1e9 + 0.5)/1e9)
        |    * (CAST(tf.tf AS DOUBLE)*2.2
        |       / (CAST(tf.tf AS DOUBLE) + 1.2*(0.25 + 0.75*dl.dl/stats.avgdl)))
        |    * 1e9 + 0.5) AS BIGINT) AS c9
        |  FROM tf JOIN df USING (token) JOIN dl USING (doc_id) CROSS JOIN stats)
        |SELECT doc_id, CAST(sum(c9) AS BIGINT) AS score9,
        |  CAST(sum(c9) AS BIGINT)/1e9 AS score
        |FROM contrib GROUP BY doc_id
        |ORDER BY score9 DESC, doc_id LIMIT 20""".stripMargin,

    // q137: the batch replayed from the raw corpus — per-query df is
    // GLOBAL df (postings count per token), scores per (query, doc),
    // row_number cut at 5.
    "q137_bm25_batch" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
        |    t -> t <> '')) AS token FROM documents),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
        |stats AS (SELECT count(*) AS n,
        |  CAST(sum(dl) AS DOUBLE)/count(*) AS avgdl FROM dl),
        |qt AS (SELECT * FROM (VALUES (1, 'join'), (1, 'hash'),
        |  (2, 'vector'), (2, 'column'), (2, 'scan'),
        |  (3, 'merge')) q(query_id, token)),
        |df AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks
        |  WHERE token IN (SELECT token FROM qt) GROUP BY 1),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks
        |  WHERE token IN (SELECT token FROM qt) GROUP BY 1, 2),
        |contrib AS (
        |  SELECT qt.query_id, tf.doc_id, CAST(floor(
        |    (floor(ln(1.0 + (stats.n - df.df + 0.5)/(df.df + 0.5))*1e9 + 0.5)/1e9)
        |    * (CAST(tf.tf AS DOUBLE)*2.2
        |       / (CAST(tf.tf AS DOUBLE) + 1.2*(0.25 + 0.75*dl.dl/stats.avgdl)))
        |    * 1e9 + 0.5) AS BIGINT) AS c9
        |  FROM tf JOIN qt USING (token) JOIN df USING (token)
        |  JOIN dl USING (doc_id) CROSS JOIN stats),
        |scored AS (
        |  SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
        |    CAST(sum(c9) AS BIGINT) AS score9
        |  FROM contrib GROUP BY query_id, doc_id),
        |ranked AS (
        |  SELECT *, CAST(row_number() OVER
        |    (PARTITION BY query_id ORDER BY score9 DESC, doc_id) AS INT) AS rnk
        |  FROM scored)
        |SELECT query_id, rnk, doc_id, score9, score9/1e9 AS score
        |FROM ranked WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,

    // q138: activity days exploded onto the 7 report days they cover.
    "q138_rolling_dau" ->
      """WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |  FROM events),
        |mx AS (SELECT max(day) AS max_day FROM act),
        |cover AS (SELECT DISTINCT user_id,
        |    CAST(unnest(generate_series(day, day + INTERVAL 6 DAY,
        |      INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM act)
        |SELECT c.day, count(*) AS dau7
        |FROM cover c, mx WHERE c.day <= mx.max_day
        |GROUP BY c.day ORDER BY c.day""".stripMargin,

    // q136: identical generated interleave arithmetic replayed.
    "q136_zorder_layout" -> {
      val z = zInterleaveSql("(l_partkey%256)", "(l_suppkey%256)")
      s"""WITH pts AS (
         |  SELECT l_partkey%256 AS x, l_suppkey%256 AS y,
         |    CAST(floor(($z)/1024) AS BIGINT) AS zbucket
         |  FROM lineitem)
         |SELECT zbucket, count(*) AS n,
         |  min(x) AS min_x, max(x) AS max_x,
         |  min(y) AS min_y, max(y) AS max_y
         |FROM pts GROUP BY zbucket ORDER BY zbucket""".stripMargin
    },

    // q135: √-temperature rebalance replayed; the acceptance uniform is
    // the first 8 md5 hex chars of "temp:<doc_id>" over 2³² — exactly
    // the engine-side conv(md5…,16,10)/2³². sqrt is IEEE
    // correctly-rounded (unlike pow), so both engines agree bit-for-bit.
    "q135_temperature_sample" ->
      """WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
        |w AS (SELECT source, n_docs,
        |  CAST(floor(sqrt(CAST(n_docs AS DOUBLE))*1e9 + 0.5) AS BIGINT) AS w_q
        |  FROM c),
        |tot AS (SELECT sum(w_q) AS w_tot,
        |  CAST(floor(sum(n_docs)/2) AS BIGINT) AS t_total FROM w),
        |rates AS (SELECT source, n_docs,
        |  CAST(floor(CAST(w_q AS DOUBLE)/w_tot*t_total + 0.5) AS BIGINT) AS t_d
        |  FROM w CROSS JOIN tot),
        |r2 AS (SELECT *, least(1.0, CAST(t_d AS DOUBLE)/n_docs) AS r_d FROM rates),
        |kept AS (
        |  SELECT d.source, count(*) AS n_kept
        |  FROM documents d JOIN r2 USING (source)
        |  WHERE CAST(('0x' || substring(md5('temp:' || CAST(d.doc_id AS VARCHAR)), 1, 8))
        |          AS BIGINT)/4294967296.0 < r2.r_d
        |  GROUP BY d.source)
        |SELECT k.source, r2.n_docs, r2.t_d AS n_target, k.n_kept
        |FROM kept k JOIN r2 USING (source) ORDER BY source""".stripMargin,

    "q127_dup_spans" ->
      """WITH toks AS (SELECT doc_id,
        |  list_filter(string_split(text, ' '), t -> t <> '') AS tk
        |  FROM documents),
        |spans AS (
        |  SELECT doc_id, array_to_string(list_slice(tk, g.i, g.i + 4), ' ') AS sh
        |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(tk) - 4)) AS i) g
        |  WHERE len(tk) >= 5),
        |shc AS (SELECT sh, count(DISTINCT doc_id) AS nd FROM spans GROUP BY sh)
        |SELECT s.doc_id, count(*) AS n_spans,
        |  CAST(sum(CASE WHEN shc.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
        |  CAST(sum(CASE WHEN shc.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    / CAST(count(*) AS DOUBLE) AS dup_frac
        |FROM spans s JOIN shc USING (sh)
        |GROUP BY s.doc_id ORDER BY doc_id""".stripMargin,

    "q128_event_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.t1
        |    AND e.ts <= v.t1 + INTERVAL '3 days' GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t2
        |    AND e.ts <= c.t2 + INTERVAL '3 days' GROUP BY 1)
        |SELECT CAST(1 AS BIGINT) AS stage, 'view' AS name, count(*) AS n_users FROM v
        |UNION ALL SELECT 2, 'click', count(*) FROM c
        |UNION ALL SELECT 3, 'purchase', count(*) FROM p
        |ORDER BY stage""".stripMargin,

    // Both sides are Monday-truncated so the day delta is an exact
    // multiple of 7: the /7 division is an exact integer-valued double
    // and Spark's truncating CAST equals DuckDB's rounding CAST.
    "q129_retention_cohort" ->
      """WITH first AS (SELECT user_id,
        |    CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
        |  FROM events GROUP BY 1),
        |act AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', ts) AS DATE) AS active_week
        |  FROM events)
        |SELECT f.cohort_week,
        |  CAST(date_diff('day', f.cohort_week, a.active_week)/7 AS BIGINT)
        |    AS week_offset,
        |  count(*) AS n_users
        |FROM first f JOIN act a USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin,

    "q130_sessionize" ->
      s"""WITH $SessionIntervalsSql
        |SELECT user_id, session_idx, s_start, s_end, n_events
        |FROM intervals
        |ORDER BY user_id, session_idx""".stripMargin,

    "q131_scd2" ->
      """WITH ev AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(props->>'$.k' AS INT) AS k_val
        |  FROM events),
        |changes AS (
        |  SELECT user_id, ts, event_id, k_val
        |  FROM (SELECT *, lag(k_val) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS prev_k,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |    FROM ev)
        |  WHERE prev_ts IS NULL OR k_val IS DISTINCT FROM prev_k)
        |SELECT user_id, ts AS valid_from,
        |  coalesce(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
        |    TIMESTAMP '2200-01-01 00:00:00') AS valid_to,
        |  k_val
        |FROM changes ORDER BY user_id, valid_from""".stripMargin,

    "q132_kl_divergence" ->
      """WITH toks AS (SELECT source, unnest(list_filter(string_split(text, ' '),
        |    t -> t <> '')) AS token FROM documents),
        |tf_s AS (SELECT source, token, count(*) AS tf_s FROM toks GROUP BY 1, 2),
        |vocab AS (SELECT token, count(*) AS tf_all FROM toks GROUP BY 1),
        |src AS (SELECT source, sum(tf_s) AS len_s FROM tf_s GROUP BY 1),
        |tot AS (SELECT sum(tf_all) AS len_all, count(*) AS v FROM vocab),
        |grid AS (
        |  SELECT src.source, vocab.token, vocab.tf_all, src.len_s,
        |    tot.len_all, tot.v, coalesce(tf_s.tf_s, 0) AS tf_s
        |  FROM vocab CROSS JOIN src CROSS JOIN tot
        |  LEFT JOIN tf_s ON tf_s.source = src.source AND tf_s.token = vocab.token),
        |contrib AS (
        |  SELECT source,
        |    CAST(floor(
        |      (CAST(tf_s + 1 AS DOUBLE) / (len_s + v))
        |      * (floor(ln((CAST(tf_s + 1 AS DOUBLE) / (len_s + v))
        |                  / (CAST(tf_all + 1 AS DOUBLE) / (len_all + v)))*1e9 + 0.5)/1e9)
        |      * 1e9 + 0.5) AS BIGINT) AS c9
        |  FROM grid)
        |SELECT source, CAST(sum(c9) AS BIGINT) AS kl9,
        |  CAST(sum(c9) AS BIGINT)/1e9 AS kl
        |FROM contrib GROUP BY source ORDER BY source""".stripMargin,

    "q157_column_profile" ->
      """SELECT 'o_custkey' AS col_name, count(*) AS n_rows,
        |  count(CASE WHEN o_custkey IS NULL THEN 1 END) AS n_null,
        |  count(DISTINCT o_custkey) AS n_distinct,
        |  CAST(min(o_custkey) AS VARCHAR) AS min_s,
        |  CAST(max(o_custkey) AS VARCHAR) AS max_s FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', count(*),
        |  count(CASE WHEN o_orderpriority IS NULL THEN 1 END),
        |  count(DISTINCT o_orderpriority),
        |  CAST(min(o_orderpriority) AS VARCHAR),
        |  CAST(max(o_orderpriority) AS VARCHAR) FROM orders
        |UNION ALL
        |SELECT 'o_orderstatus', count(*),
        |  count(CASE WHEN o_orderstatus IS NULL THEN 1 END),
        |  count(DISTINCT o_orderstatus),
        |  CAST(min(o_orderstatus) AS VARCHAR),
        |  CAST(max(o_orderstatus) AS VARCHAR) FROM orders
        |UNION ALL
        |SELECT 'o_totalcents', count(*),
        |  count(CASE WHEN o_totalprice IS NULL THEN 1 END),
        |  count(DISTINCT CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)),
        |  CAST(min(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS VARCHAR),
        |  CAST(max(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS VARCHAR)
        |  FROM orders
        |ORDER BY col_name""".stripMargin,

    "q162_snapshot_diff" ->
      """WITH o AS (SELECT o_orderkey,
        |    CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents,
        |    substring(md5('snap:' || CAST(o_orderkey AS VARCHAR)), 1, 1) AS nib
        |  FROM orders),
        |a AS (SELECT o_orderkey AS ka, cents AS ca FROM o WHERE nib <> 'f'),
        |b AS (SELECT o_orderkey AS kb,
        |    cents + CASE WHEN nib = '1' THEN 100 ELSE 0 END AS cb
        |  FROM o WHERE nib <> '0'),
        |d AS (SELECT coalesce(ka, kb) AS key,
        |    CASE WHEN ka IS NULL THEN 'added'
        |         WHEN kb IS NULL THEN 'removed'
        |         WHEN ca <> cb THEN 'changed'
        |         ELSE 'unchanged' END AS diff_type
        |  FROM a FULL JOIN b ON ka = kb)
        |SELECT diff_type, count(*) AS n, CAST(sum(key) AS BIGINT) AS key_sum
        |FROM d WHERE diff_type <> 'unchanged'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q165_first_touch" ->
      """WITH flagged AS (SELECT user_id, event_id, ts, event_type,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (SELECT user_id, event_id, ts, event_type,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS session_idx
        |  FROM flagged),
        |attr AS (SELECT user_id, event_type,
        |    first_value(event_type) OVER (PARTITION BY user_id, session_idx
        |      ORDER BY ts, event_id) AS first_touch
        |  FROM sess)
        |SELECT first_touch, count(*) AS n_purchases,
        |  count(DISTINCT user_id) AS n_users
        |FROM attr WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // q169: the dim CTE replays q131's oracle verbatim (same change
    // predicate), then the point-in-time join.
    "q169_scd2_lookup" ->
      """WITH ev AS MATERIALIZED (SELECT user_id, ts, event_id,
        |    CAST(props->>'$.k' AS INT) AS k_val
        |  FROM events),
        |changes AS (
        |  SELECT user_id, ts, event_id, k_val
        |  FROM (SELECT *, lag(k_val) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS prev_k,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |    FROM ev)
        |  WHERE prev_ts IS NULL OR k_val IS DISTINCT FROM prev_k),
        |dim AS (SELECT user_id AS d_user, ts AS valid_from,
        |    coalesce(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
        |      TIMESTAMP '2200-01-01 00:00:00') AS valid_to, k_val
        |  FROM changes)
        |SELECT d.k_val, count(*) AS n_events,
        |  count(DISTINCT e.user_id) AS n_users
        |FROM ev e JOIN dim d ON e.user_id = d.d_user
        |  AND e.ts >= d.valid_from AND e.ts < d.valid_to
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q175_merkle_sync" ->
      """WITH mk AS (SELECT max(o_orderkey) AS maxkey FROM orders),
        |o AS (SELECT o_orderkey, maxkey,
        |    CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents,
        |    (substring(md5('snap:' || CAST(o_orderkey AS VARCHAR)), 1, 1) = '1'
        |      AND o_orderkey*10 >= maxkey*9) AS churned
        |  FROM orders, mk),
        |a AS (SELECT o_orderkey // (maxkey // 64 + 1) AS bucket,
        |    bit_xor(CAST(('0x' || substring(md5(
        |      CAST(o_orderkey AS VARCHAR) || ':' || CAST(cents AS VARCHAR)),
        |      1, 15)) AS BIGINT)) AS ha
        |  FROM o GROUP BY 1),
        |b AS (SELECT o_orderkey // (maxkey // 64 + 1) AS bucket,
        |    bit_xor(CAST(('0x' || substring(md5(
        |      CAST(o_orderkey AS VARCHAR) || ':' ||
        |      CAST(cents + CASE WHEN churned THEN 100 ELSE 0 END AS VARCHAR)),
        |      1, 15)) AS BIGINT)) AS hb
        |  FROM o GROUP BY 1)
        |SELECT coalesce(a.bucket, b.bucket) AS bucket, ha, hb,
        |  ha IS DISTINCT FROM hb AS dirty
        |FROM a FULL JOIN b ON a.bucket = b.bucket
        |ORDER BY bucket""".stripMargin,

    "q177_peak_concurrency" ->
      s"""WITH $SessionIntervalsSql,
        |points AS (
        |  SELECT s_start AS ts, 0 AS kind, user_id, session_idx, 1 AS delta
        |  FROM intervals
        |  UNION ALL
        |  SELECT s_end, 1, user_id, session_idx, -1 FROM intervals),
        |swept AS (
        |  SELECT ts, CAST(sum(delta) OVER (
        |    ORDER BY ts, kind, user_id, session_idx
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run
        |  FROM points)
        |SELECT (SELECT count(*) FROM intervals) AS n_sessions,
        |  (SELECT max(run) FROM swept) AS peak,
        |  (SELECT min(ts) FROM swept
        |   WHERE run = (SELECT max(run) FROM swept)) AS peak_at""".stripMargin,

    // q180: both legs replayed verbatim (q126 / q140 oracle CTEs,
    // q140's renamed tf2/df2 to avoid collisions), ranked by
    // row_number over the same (score desc, id) order, fused with the
    // identical quantized 1/(60+rank) terms.
    "q180_rrf_fusion" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
        |    t -> t <> '')) AS token FROM documents),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
        |stats AS (SELECT count(*) AS n,
        |  CAST(sum(dl) AS DOUBLE)/count(*) AS avgdl FROM dl),
        |qt AS (SELECT * FROM (VALUES ('join'),('hash'),('vector')) q(token)),
        |df AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks
        |  WHERE token IN (SELECT token FROM qt) GROUP BY 1),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks
        |  WHERE token IN (SELECT token FROM qt) GROUP BY 1, 2),
        |contrib AS (
        |  SELECT tf.doc_id, CAST(floor(
        |    (floor(ln(1.0 + (stats.n - df.df + 0.5)/(df.df + 0.5))*1e9 + 0.5)/1e9)
        |    * (CAST(tf.tf AS DOUBLE)*2.2
        |       / (CAST(tf.tf AS DOUBLE) + 1.2*(0.25 + 0.75*dl.dl/stats.avgdl)))
        |    * 1e9 + 0.5) AS BIGINT) AS c9
        |  FROM tf JOIN df USING (token) JOIN dl USING (doc_id) CROSS JOIN stats),
        |bmtop AS (
        |  SELECT doc_id, row_number() OVER (ORDER BY score9 DESC, doc_id)
        |    AS rank
        |  FROM (SELECT doc_id, CAST(sum(c9) AS BIGINT) AS score9
        |    FROM contrib GROUP BY doc_id
        |    ORDER BY score9 DESC, doc_id LIMIT 20)),
        |tf2 AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |df2 AS (SELECT token, count(*) AS df FROM tf2 GROUP BY 1),
        |w AS (SELECT tf2.doc_id, tf2.token,
        |    CAST(floor(CAST(tf2.tf AS DOUBLE)
        |      * (CAST(n.n_docs AS DOUBLE)/CAST(df2.df AS DOUBLE))
        |      * 1e2 + 0.5) AS BIGINT) AS w2
        |  FROM tf2 JOIN df2 USING (token) CROSS JOIN n),
        |nrm AS (SELECT doc_id, sqrt(CAST(sum(w2*w2) AS DOUBLE)) AS nrm
        |  FROM w GROUP BY 1),
        |probe AS (SELECT token, w2 AS pw2 FROM w WHERE doc_id = 0),
        |dots AS (SELECT w.doc_id, CAST(sum(w.w2*probe.pw2) AS BIGINT) AS dot
        |  FROM w JOIN probe USING (token) WHERE w.doc_id <> 0 GROUP BY 1),
        |sptop AS (
        |  SELECT doc_id, row_number() OVER (ORDER BY cos9 DESC, doc_id)
        |    AS rank
        |  FROM (SELECT d.doc_id,
        |      CAST(floor(CAST(dot AS DOUBLE)/(n1.nrm*n0.nrm)*1e9 + 0.5)
        |        AS BIGINT) AS cos9
        |    FROM dots d, nrm n1, nrm n0
        |    WHERE n1.doc_id = d.doc_id AND n0.doc_id = 0
        |    ORDER BY cos9 DESC, d.doc_id LIMIT 20)),
        |u AS (
        |  SELECT doc_id,
        |    CAST(floor(1e9/(60 + rank) + 0.5) AS BIGINT) AS rrf_q
        |  FROM (SELECT * FROM bmtop UNION ALL SELECT * FROM sptop))
        |SELECT doc_id, count(*) AS n_lists, CAST(sum(rrf_q) AS BIGINT) AS rrf9
        |FROM u GROUP BY doc_id
        |ORDER BY rrf9 DESC, doc_id LIMIT 10""".stripMargin,

    "q181_source_entropy" ->
      """WITH toks AS (
        |  SELECT source, unnest(list_filter(string_split(text, ' '),
        |    t -> t <> '')) AS token FROM documents),
        |c AS (SELECT source, token, count(*) AS c FROM toks GROUP BY 1, 2),
        |t AS (SELECT source, CAST(sum(c) AS BIGINT) AS t,
        |    count(*) AS vocab FROM c GROUP BY 1),
        |terms AS (
        |  SELECT c.source, t.t, t.vocab, CAST(floor(
        |    -((CAST(c AS DOUBLE)/CAST(t AS DOUBLE))
        |      * ln(CAST(c AS DOUBLE)/CAST(t AS DOUBLE)))
        |    * 1e9 + 0.5) AS BIGINT) AS h_q
        |  FROM c JOIN t USING (source))
        |SELECT source, t AS n_tokens, vocab,
        |  CAST(sum(h_q) AS BIGINT) AS ent9
        |FROM terms GROUP BY source, t, vocab
        |ORDER BY source""".stripMargin,

    "q183_fk_orphans" ->
      """WITH damaged AS (
        |  SELECT o_orderkey FROM orders
        |  WHERE substring(md5('fk:' || CAST(o_orderkey AS VARCHAR)), 1, 1)
        |    <> '0'),
        |edges AS (
        |  SELECT 'customer.c_nationkey->nation' AS fk,
        |    count(*) AS n_child,
        |    CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_orphans,
        |    count(DISTINCT CASE WHEN p.k IS NULL THEN c.c_nationkey END)
        |      AS n_orphan_keys
        |  FROM customer c LEFT JOIN
        |    (SELECT DISTINCT n_nationkey AS k FROM nation) p
        |    ON c.c_nationkey = p.k
        |  WHERE c.c_nationkey IS NOT NULL
        |  UNION ALL
        |  SELECT 'lineitem.l_orderkey->orders',
        |    count(*),
        |    CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT CASE WHEN p.k IS NULL THEN l.l_orderkey END)
        |  FROM lineitem l LEFT JOIN
        |    (SELECT DISTINCT o_orderkey AS k FROM orders) p
        |    ON l.l_orderkey = p.k
        |  WHERE l.l_orderkey IS NOT NULL
        |  UNION ALL
        |  SELECT 'lineitem.l_orderkey->orders[damaged]',
        |    count(*),
        |    CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT CASE WHEN p.k IS NULL THEN l.l_orderkey END)
        |  FROM lineitem l LEFT JOIN
        |    (SELECT DISTINCT o_orderkey AS k FROM damaged) p
        |    ON l.l_orderkey = p.k
        |  WHERE l.l_orderkey IS NOT NULL
        |  UNION ALL
        |  SELECT 'lineitem.l_partkey->part',
        |    count(*),
        |    CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT CASE WHEN p.k IS NULL THEN l.l_partkey END)
        |  FROM lineitem l LEFT JOIN
        |    (SELECT DISTINCT p_partkey AS k FROM part) p
        |    ON l.l_partkey = p.k
        |  WHERE l.l_partkey IS NOT NULL
        |  UNION ALL
        |  SELECT 'orders.o_custkey->customer',
        |    count(*),
        |    CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT CASE WHEN p.k IS NULL THEN o.o_custkey END)
        |  FROM orders o LEFT JOIN
        |    (SELECT DISTINCT c_custkey AS k FROM customer) p
        |    ON o.o_custkey = p.k
        |  WHERE o.o_custkey IS NOT NULL)
        |SELECT * FROM edges ORDER BY fk""".stripMargin,

    "q187_pattern_negation" ->
      """WITH ev AS (SELECT user_id, event_type, ts FROM events),
        |anchors AS (
        |  SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END)
        |    AS t_v
        |  FROM ev GROUP BY 1),
        |a2 AS (SELECT * FROM anchors WHERE t_v IS NOT NULL),
        |conv AS (
        |  SELECT e.user_id, t_v,
        |    min(CASE WHEN event_type = 'purchase' AND ts > t_v
        |      AND ts <= t_v + INTERVAL 3 DAY THEN ts END) AS t_p
        |  FROM ev e JOIN a2 USING (user_id) GROUP BY 1, 2),
        |blocked AS (
        |  SELECT e.user_id, c.t_v, c.t_p,
        |    CAST(sum(CASE WHEN event_type = 'click' AND ts > c.t_v
        |      AND ts < c.t_p THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_clicks_between
        |  FROM ev e JOIN (SELECT * FROM conv WHERE t_p IS NOT NULL) c
        |    USING (user_id)
        |  GROUP BY 1, 2, 3)
        |SELECT count(*) AS n_candidates, count(t_p) AS n_converted,
        |  CAST(sum(CASE WHEN t_p IS NOT NULL AND n_clicks_between = 0
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
        |  CAST(coalesce(sum(CASE WHEN n_clicks_between = 0
        |    THEN date_diff('second', t_v, t_p) END), 0) AS BIGINT)
        |    AS clean_latency_s
        |FROM conv LEFT JOIN blocked USING (user_id, t_v, t_p)""".stripMargin,

    "q188_burst_brands" ->
      """WITH weekly AS (
        |  SELECT p_brand AS brand,
        |    date_trunc('week', CAST(o_orderdate AS DATE)) AS wk,
        |    count(*) AS cnt
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2),
        |baseline AS (
        |  SELECT brand, wk + CAST(off * 7 AS INTEGER) AS wk,
        |    CAST(sum(cnt) AS BIGINT) AS base
        |  FROM weekly, (SELECT unnest(generate_series(1, 4)) AS off)
        |  GROUP BY 1, 2)
        |SELECT w.wk, w.brand, w.cnt, b.base,
        |  CAST(floor(CAST(w.cnt * 4 AS DOUBLE) / CAST(b.base AS DOUBLE)
        |    * 1e9 + 0.5) AS BIGINT) AS lift9
        |FROM weekly w JOIN baseline b USING (brand, wk)
        |WHERE w.cnt >= 8 AND b.base >= 12
        |ORDER BY lift9 DESC, wk, brand LIMIT 20""".stripMargin,

    "q192_merge_upsert" ->
      """WITH o AS (
        |  SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents,
        |    substring(md5('mg:' || CAST(o_orderkey AS VARCHAR)), 1, 1) AS nib
        |  FROM orders),
        |base AS (SELECT k, cents FROM o WHERE nib <> 'f'),
        |updates AS (
        |  SELECT k, cents + 1 AS cents FROM o WHERE nib = '0'
        |  UNION ALL
        |  SELECT k, cents FROM o WHERE nib = 'f'),
        |merged AS (
        |  SELECT coalesce(u.k, b.k) AS k,
        |    coalesce(u.cents, b.cents) AS cents,
        |    CASE WHEN u.k IS NULL THEN 'kept'
        |      WHEN b.k IS NULL THEN 'inserted'
        |      ELSE 'updated' END AS cls
        |  FROM base b FULL JOIN updates u ON b.k = u.k)
        |SELECT cls, count(*) AS n,
        |  bit_xor(CAST(('0x' || substring(md5(
        |    CAST(k AS VARCHAR) || ':' || CAST(cents AS VARCHAR)),
        |    1, 15)) AS BIGINT)) AS digest
        |FROM merged GROUP BY cls ORDER BY cls""".stripMargin,

    "q195_shard_rebalance" ->
      """WITH vn16 AS (
        |  SELECT {'vh': CAST(('0x' || substring(md5(
        |      'vn:' || CAST(i//8 AS VARCHAR) || ':' || CAST(i%8 AS VARCHAR)),
        |      1, 15)) AS BIGINT), 'shard': i//8} AS vn
        |  FROM (SELECT unnest(generate_series(0, 127)) AS i)),
        |vn17 AS (
        |  SELECT {'vh': CAST(('0x' || substring(md5(
        |      'vn:' || CAST(i//8 AS VARCHAR) || ':' || CAST(i%8 AS VARCHAR)),
        |      1, 15)) AS BIGINT), 'shard': i//8} AS vn
        |  FROM (SELECT unnest(generate_series(0, 135)) AS i)),
        |r16 AS (SELECT list_sort(list(vn)) AS r16 FROM vn16),
        |r17 AS (SELECT list_sort(list(vn)) AS r17 FROM vn17),
        |docs AS (
        |  SELECT doc_id, CAST(('0x' || substring(md5(
        |      'doc:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        |  FROM documents),
        |assigned AS (
        |  SELECT doc_id,
        |    coalesce(list_filter(r16, x -> x.vh >= h)[1], r16[1]).shard
        |      AS s16,
        |    coalesce(list_filter(r17, x -> x.vh >= h)[1], r17[1]).shard
        |      AS s17
        |  FROM docs, r16, r17)
        |SELECT count(*) AS n_docs,
        |  CAST(sum(CASE WHEN s16 <> s17 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_moved,
        |  CAST(sum(CASE WHEN s16 <> s17 AND s17 <> 16 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_moved_elsewhere,
        |  CAST(floor(
        |    CAST(sum(CASE WHEN s16 <> s17 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) * 1e9 + 0.5) AS BIGINT)
        |    AS moved_frac9
        |FROM assigned""".stripMargin,

    "q197_skew_diagnostics" ->
      """WITH a AS (
        |  SELECT 'l_orderkey' AS key_col, count(*) AS n_rows,
        |    count(DISTINCT l_orderkey) AS n_keys
        |  FROM lineitem),
        |ha AS (SELECT l_orderkey AS hot_key, count(*) AS hot_rows
        |  FROM lineitem GROUP BY 1 ORDER BY hot_rows DESC, hot_key LIMIT 1),
        |b AS (
        |  SELECT 'l_partkey' AS key_col, count(*) AS n_rows,
        |    count(DISTINCT l_partkey) AS n_keys
        |  FROM lineitem),
        |hb AS (SELECT l_partkey AS hot_key, count(*) AS hot_rows
        |  FROM lineitem GROUP BY 1 ORDER BY hot_rows DESC, hot_key LIMIT 1),
        |c AS (
        |  SELECT 'l_suppkey' AS key_col, count(*) AS n_rows,
        |    count(DISTINCT l_suppkey) AS n_keys
        |  FROM lineitem),
        |hc AS (SELECT l_suppkey AS hot_key, count(*) AS hot_rows
        |  FROM lineitem GROUP BY 1 ORDER BY hot_rows DESC, hot_key LIMIT 1),
        |rows_u AS (
        |  SELECT a.key_col, a.n_rows, a.n_keys, ha.hot_key, ha.hot_rows
        |  FROM a, ha
        |  UNION ALL
        |  SELECT b.key_col, b.n_rows, b.n_keys, hb.hot_key, hb.hot_rows
        |  FROM b, hb
        |  UNION ALL
        |  SELECT c.key_col, c.n_rows, c.n_keys, hc.hot_key, hc.hot_rows
        |  FROM c, hc)
        |SELECT key_col, n_rows, n_keys, hot_key, hot_rows,
        |  CAST(floor(CAST(hot_rows AS DOUBLE) * CAST(n_keys AS DOUBLE)
        |    / CAST(n_rows AS DOUBLE) * 1e9 + 0.5) AS BIGINT) AS skew9
        |FROM rows_u ORDER BY key_col""".stripMargin,

    "q198_interpolate_gaps" ->
      """WITH ev AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN substring(md5('gap:' || CAST(event_id AS VARCHAR)),
        |        1, 1) IN ('0','1','2','3') THEN NULL
        |      ELSE CAST(floor(value*100 + 0.5) AS BIGINT) END AS v,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS t
        |  FROM events),
        |nb AS (
        |  SELECT *,
        |    last_value(v IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
        |    last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pt,
        |    first_value(v IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id
        |       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id
        |       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt
        |  FROM ev),
        |rep AS (
        |  SELECT event_type, v,
        |    CASE WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
        |      WHEN pv IS NOT NULL AND nv IS NOT NULL AND nt > pt THEN
        |        CAST(pv AS DOUBLE) + CAST(nv - pv AS DOUBLE)
        |          * CAST(t - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE)
        |      ELSE CAST(coalesce(pv, nv) AS DOUBLE) END AS rv
        |  FROM nb)
        |SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_repaired,
        |  CAST(sum(CASE WHEN v IS NULL AND rv IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_unrepairable,
        |  CAST(sum(CASE WHEN v IS NULL THEN
        |    CAST(floor(rv*1e9 + 0.5) AS BIGINT) END) AS BIGINT)
        |    AS repaired_mass9
        |FROM rep GROUP BY event_type ORDER BY event_type""".stripMargin,

    // q284: the same integer Hamilton apportionment with window
    // functions; // and % are DuckDB's truncating div/mod (positives —
    // identical to Spark's div/%).
    "q284_proration" ->
      """WITH o AS (SELECT o_orderkey AS ok, o_orderpriority AS prio,
        |    CAST(round(o_totalprice*100) AS BIGINT)//10 AS pool
        |  FROM orders),
        |li AS (SELECT l_orderkey AS ok, l_linenumber AS ln,
        |    CAST(round(l_extendedprice*100) AS BIGINT) AS w
        |  FROM lineitem),
        |a AS (SELECT li.ok, ln, w, prio, pool,
        |    CAST(sum(w) OVER (PARTITION BY li.ok) AS BIGINT) AS wsum
        |  FROM li JOIN o ON li.ok = o.ok),
        |r AS (SELECT ok, prio, pool,
        |    (pool*w)//wsum AS base, (pool*w)%wsum AS rem, ln,
        |    row_number() OVER (PARTITION BY ok
        |      ORDER BY (pool*w)%wsum DESC, ln) AS rn,
        |    pool - CAST(sum((pool*w)//wsum) OVER (PARTITION BY ok)
        |      AS BIGINT) AS extra
        |  FROM a),
        |po AS (SELECT ok, prio, pool, count(*) AS nl,
        |    CAST(sum(CASE WHEN rn <= extra THEN 1 ELSE 0 END) AS BIGINT)
        |      AS bumped,
        |    CAST(sum(base + CASE WHEN rn <= extra THEN 1 ELSE 0 END)
        |      AS BIGINT) AS alloc_sum
        |  FROM r GROUP BY 1, 2, 3)
        |SELECT prio, count(*) AS n_orders,
        |  CAST(sum(nl) AS BIGINT) AS n_lines,
        |  CAST(sum(bumped) AS BIGINT) AS n_bumped,
        |  CAST(sum(alloc_sum) AS BIGINT) AS alloc_total,
        |  CAST(sum(alloc_sum - pool) AS BIGINT) AS resid_total
        |FROM po GROUP BY prio ORDER BY prio""".stripMargin,

    // q287: one generated UNION ALL branch per candidate pair — the
    // anti-join count via NOT IN over non-null integer keys.
    "q287_ind_discovery" -> {
      val pairs = Seq(
        ("c_nationkey<n_nationkey", "c_nationkey", "customer", "n_nationkey", "nation"),
        ("s_nationkey<n_nationkey", "s_nationkey", "supplier", "n_nationkey", "nation"),
        ("n_regionkey<r_regionkey", "n_regionkey", "nation", "r_regionkey", "region"),
        ("o_custkey<c_custkey", "o_custkey", "orders", "c_custkey", "customer"),
        ("l_orderkey<o_orderkey", "l_orderkey", "lineitem", "o_orderkey", "orders"),
        ("l_partkey<p_partkey", "l_partkey", "lineitem", "p_partkey", "part"),
        ("l_suppkey<s_suppkey", "l_suppkey", "lineitem", "s_suppkey", "supplier"),
        ("c_custkey<o_custkey", "c_custkey", "customer", "o_custkey", "orders"),
        ("p_partkey<l_partkey", "p_partkey", "part", "l_partkey", "lineitem"),
        ("n_nationkey<c_nationkey", "n_nationkey", "nation", "c_nationkey", "customer"))
      pairs.map { case (name, lc, lt, rc, rt) =>
        s"""SELECT '$name' AS pair, n_lhs, n_missing,
           |  CAST(n_missing = 0 AS INT) AS holds,
           |  CAST(floor(CAST(n_missing AS DOUBLE)/CAST(n_lhs AS DOUBLE)*1e9
           |    + 0.5) AS BIGINT) AS err9
           |FROM (SELECT
           |  (SELECT count(*) FROM (SELECT DISTINCT CAST($lc AS BIGINT) AS v
           |     FROM $lt)) AS n_lhs,
           |  (SELECT count(*) FROM (SELECT DISTINCT CAST($lc AS BIGINT) AS v
           |     FROM $lt)
           |   WHERE v NOT IN (SELECT CAST($rc AS BIGINT) FROM $rt))
           |    AS n_missing)""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY pair")
    },

    // q288: the same two-level aggregate; band via floor-division.
    "q288_l_diversity" ->
      """WITH qi AS (SELECT c_nationkey AS nk, c_mktsegment AS seg,
        |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS band
        |  FROM customer),
        |g1 AS (SELECT nk, seg, band, count(*) AS c
        |  FROM qi GROUP BY 1, 2, 3),
        |g2 AS (SELECT nk, seg, count(*) AS l, CAST(sum(c) AS BIGINT)
        |    AS members
        |  FROM g1 GROUP BY 1, 2)
        |SELECT l, count(*) AS n_groups,
        |  CAST(sum(members) AS BIGINT) AS n_members,
        |  CAST(l < 3 AS INT) AS violates
        |FROM g2 GROUP BY l ORDER BY l""".stripMargin,

    // q298: journeys, transition counts, and all five 12-round chains
    // replayed as generated CTEs with the identical integer-damped
    // arithmetic (HUGEINT products, // on positives, clamp-before-
    // divide); MATERIALIZED per the q184 re-inlining lesson.
    "q298_markov_attribution" -> {
      val head =
        """WITH r AS (SELECT user_id, event_type,
          |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
          |      AS rn
          |  FROM events),
          |pp AS MATERIALIZED (SELECT user_id, min(rn) AS pp FROM r
          |  WHERE event_type = 'purchase' GROUP BY 1),
          |path AS MATERIALIZED (SELECT r.user_id, r.event_type, r.rn, pp.pp
          |  FROM r LEFT JOIN pp ON r.user_id = pp.user_id
          |  WHERE pp.pp IS NULL OR r.rn < pp.pp),
          |nx AS MATERIALIZED (SELECT user_id, event_type, rn, pp,
          |    lead(event_type) OVER (PARTITION BY user_id ORDER BY rn) AS nt
          |  FROM path),
          |tr0 AS (SELECT event_type AS src, nt AS dst FROM nx
          |    WHERE nt IS NOT NULL
          |  UNION ALL SELECT 'START', event_type FROM path WHERE rn = 1
          |  UNION ALL SELECT 'START', 'CONV' FROM pp WHERE pp = 1
          |  UNION ALL SELECT event_type,
          |    CASE WHEN pp IS NOT NULL THEN 'CONV' ELSE 'NULL' END
          |  FROM nx WHERE nt IS NULL),
          |tr AS MATERIALIZED (SELECT src, dst, CAST(count(*) AS BIGINT) AS c
          |  FROM tr0 GROUP BY 1, 2)""".stripMargin
      val channels = Seq("click", "error", "signup", "view")
      def chain(tag: String, rm: Option[String]): String = {
        val trv = rm match {
          case None =>
            s",\ntr_$tag AS MATERIALIZED (SELECT src, dst, c FROM tr)"
          case Some(ch) =>
            s""",
               |tr_$tag AS MATERIALIZED (SELECT src,
               |    CASE WHEN dst = '$ch' THEN 'NULL' ELSE dst END AS dst,
               |    CAST(sum(c) AS BIGINT) AS c
               |  FROM tr WHERE src <> '$ch' GROUP BY 1, 2)""".stripMargin
        }
        val tot =
          s""",
             |tot_$tag AS MATERIALIZED (SELECT src, CAST(sum(c) AS BIGINT)
             |    AS t FROM tr_$tag GROUP BY 1)""".stripMargin
        val p0 =
          s""",
             |p_${tag}_0 AS (SELECT src AS st, CAST(0 AS BIGINT) AS p
             |  FROM tot_$tag
             |  UNION ALL SELECT 'CONV', CAST(1000000000 AS BIGINT)
             |  UNION ALL SELECT 'NULL', CAST(0 AS BIGINT))""".stripMargin
        val rounds = (1 to 12).map { k =>
          s""",
             |p_${tag}_$k AS MATERIALIZED (SELECT tr_$tag.src AS st,
             |    CAST(sum(CAST(tr_$tag.c AS HUGEINT) * pv.p)
             |      // tot_$tag.t AS BIGINT) AS p
             |  FROM tr_$tag JOIN p_${tag}_${k - 1} pv ON tr_$tag.dst = pv.st
             |  JOIN tot_$tag ON tr_$tag.src = tot_$tag.src
             |  GROUP BY tr_$tag.src, tot_$tag.t
             |  UNION ALL SELECT 'CONV', CAST(1000000000 AS BIGINT)
             |  UNION ALL SELECT 'NULL', CAST(0 AS BIGINT))""".stripMargin
        }.mkString
        trv + tot + p0 + rounds
      }
      val chains = chain("b", None) +
        channels.map(ch => chain(ch, Some(ch))).mkString
      val remUnion = channels
        .map(ch => s"SELECT '$ch' AS channel, p FROM p_${ch}_12 WHERE st = 'START'")
        .mkString("\n  UNION ALL ")
      head + chains +
        s""",
           |base AS (SELECT p FROM p_b_12 WHERE st = 'START'),
           |rem AS ($remUnion),
           |re AS (SELECT channel, rem.p AS conv_removed9,
           |    CASE WHEN base.p = 0 THEN CAST(0 AS BIGINT)
           |      ELSE CAST(greatest(CAST(base.p AS HUGEINT) - rem.p, 0)
           |        * 1000000000 // base.p AS BIGINT) END AS re9,
           |    base.p AS conv_base9
           |  FROM rem, base),
           |sre AS (SELECT CAST(sum(re9) AS BIGINT) AS sre FROM re)
           |SELECT channel, conv_base9, conv_removed9, re9,
           |  CASE WHEN sre = 0 THEN CAST(0 AS BIGINT)
           |    ELSE CAST(CAST(re9 AS HUGEINT) * 1000000000 // sre AS BIGINT)
           |    END AS share9
           |FROM re, sre ORDER BY channel""".stripMargin
    },

    // q297: the oracle is the plain full recompute — it never sees the
    // carve, so a defect anywhere in the delta algebra breaks the hash.
    "q297_ivm_join_delta" ->
      """SELECT o_orderpriority AS prio, count(*) AS n_rows,
        |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)
        |    AS rev2
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
