package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.ops.AsOf

/** Join-surface completion (SURVEY.md §2.2 "Joins"): right/full outer,
  * theta/range join, as-of join. Round 1 covered inner/broadcast/left/
  * semi/anti/cross.
  *
  * Scale notes: the range join (q37) anchors on an equi key (user_id)
  * so Spark plans a hash/sort-merge join on the key with the time-band
  * predicate as a join filter — never a cartesian. The as-of join (q38)
  * is the union+window composition: one shuffle, no pair blow-up.
  */
object JoinQueries extends QueryPack {

  override val queries: Map[String, Q] = Map(
    // Runtime-filter join pruning surface: a selectively filtered dim
    // joined to the fact on its key. At test SF the dim broadcasts
    // (and the broadcast IS the runtime filter); at cluster scale,
    // when both sides shuffle, Spark's InjectRuntimeFilter turns the
    // dim filter into a bloom filter applied AT THE FACT SCAN — rows
    // for other brands never enter the shuffle. PlanSpec proves the
    // injection fires on this exact plan with the shuffle-join
    // thresholds a 100 TB run would see.
    "q116_runtime_filter_join" -> ((s, dir) => {
      val p = Tables.part(s, dir).filter(col("p_brand") === "Brand#7")
      Tables.lineitem(s, dir)
        .join(p, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_items"),
          graft.functions.Exact.moneySum(col("l_extendedprice")).as("revenue"))
        .orderBy("p_brand")
    }),

    // Right outer: every customer kept, orders optional (q07's mirror
    // through the right-join path).
    "q35_right_outer" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      o.join(c, o("o_custkey") === c("c_custkey"), "right")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey")
    }),

    // Full outer over the nation-key sets of customer × supplier.
    "q36_full_outer" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val su = Tables.supplier(s, dir)
      c.join(su, c("c_nationkey") === su("s_nationkey"), "full")
        .groupBy(coalesce(col("c_nationkey"), col("s_nationkey")).as("nk"))
        .agg(
          count(lit(1)).as("n_pairs"),
          count(col("c_custkey")).as("n_cust"),
          count(col("s_suppkey")).as("n_supp"))
        .orderBy("nk")
    }),

    // Theta/range join: events within a 10-minute follow window of an
    // error event by the same user. Equi-anchor on user_id + range
    // predicate as join condition — the scalable non-equi shape.
    "q37_range_join" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val errs = e.filter(col("event_type") === "error")
        .select(col("user_id").as("u"), col("ts").as("err_ts"))
      val follow = e.select(col("user_id"), col("ts"), col("event_type"))
      errs.join(follow,
          col("u") === col("user_id")
            && col("ts") > col("err_ts")
            && col("ts") <= col("err_ts") + expr("INTERVAL 10 MINUTES"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_follow"))
        .orderBy("event_type")
    }),

    // As-of join: each event gets the user's most recent purchase value
    // at or before its timestamp (union+window composition, ops/AsOf).
    "q38_asof" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      // ≤1 right row per (user_id, ts): pre-aggregate purchases.
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts")
        .agg(max("value").as("pv"))
      AsOf.join(
          e, purchases,
          keys = Seq("user_id"), tsCol = "ts", valueCol = "pv",
          leftCols = Seq("event_id"))
        .select(col("event_id"),
          coalesce(col("asof_pv"), lit(-1.0)).as("last_purchase_v"))
        .orderBy("event_id")
    }),

    // Null-safe equi-join (<=>): NULL keys match each other instead of
    // dropping — still a hash-partitionable equi key (NULLs co-locate
    // in one partition), unlike an OR-of-IS-NULL condition which would
    // degrade to a nested-loop join. Region 2 is nulled on both sides
    // to manufacture NULL keys from the NULL-free harness data.
    "q74_nullsafe_join" -> ((s, dir) => {
      val n = Tables.nation(s, dir).select(col("n_name"),
        when(col("n_regionkey") === 2, lit(null)).otherwise(col("n_regionkey")).as("nk"))
      val r = Tables.region(s, dir).select(col("r_name"),
        when(col("r_regionkey") === 2, lit(null)).otherwise(col("r_regionkey")).as("rk"))
      n.join(broadcast(r), n("nk") <=> r("rk"))
        .select("n_name", "r_name")
        .orderBy("n_name", "r_name")
    }),

    // EXISTS / NOT EXISTS subqueries (SQL surface): planned as
    // left-semi ⨝ left-anti — the same scale shape as q08/q09, reached
    // through the subquery rewrite instead of the DataFrame API.
    "q75_exists_subquery" -> ((s, dir) => {
      Tables.part(s, dir).createOrReplaceTempView("part_q75")
      Tables.lineitem(s, dir).createOrReplaceTempView("li_q75")
      s.sql(
        """SELECT p_partkey, p_name FROM part_q75 p
          |WHERE EXISTS (SELECT 1 FROM li_q75 l
          |              WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 49)
          |  AND NOT EXISTS (SELECT 1 FROM li_q75 l
          |                  WHERE l.l_partkey = p.p_partkey AND l.l_quantity <= 2)
          |ORDER BY p_partkey""".stripMargin)
    }),

    // Salted skewed join ([[graft.ops.Skew.saltedJoin]]): the fact side
    // spreads each customer key over 8 deterministic sub-keys, the dim
    // replicates ×8, and the join runs on (key, salt) — the explicit
    // rewrite for the single-dominant-key case AQE's skew split can't
    // reach. The merge hint forces the shuffle-join path (the one being
    // salted) even though this dim would broadcast at test SF; result
    // is bit-equal to the plain join (the oracle IS the plain join).
    "q156_salted_skew_join" -> ((s, dir) => {
      val fact = Tables.orders(s, dir).select(col("o_custkey"),
        col("o_orderkey"),
        floor(col("o_totalprice") * lit(100) + lit(0.5)).cast("long")
          .as("cents"))
      val dim = Tables.customer(s, dir)
        .select("c_custkey", "c_nationkey").hint("merge")
      graft.ops.Skew
        .saltedJoin(fact, "o_custkey", dim, "c_custkey", 8, col("o_orderkey"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_orders"), sum("cents").as("revenue_cents"))
        .orderBy("c_nationkey")
    }),

    // ---------------------------------------------------------------
    // q190: SCALABLE interval-overlap join — sessions × promo windows
    // via DAY-GRID bucketing: both interval sets explode onto the grid
    // cells they cover (bounded fan-out: sessions span ≤ 2 days, each
    // promo exactly 3), candidates meet in an EQUI-join on the cell,
    // the exact timestamp predicate verifies on candidates only, and
    // DISTINCT collapses pairs that share several cells. This is the
    // interval join that still works when q37's broadcast-theta shape
    // can't (both sides big): candidate volume ∝ co-resident intervals
    // per cell, never |L|×|R|; grid resolution trades fan-out against
    // selectivity. Promo fixture: ten 3-day windows laid every 3 days
    // from the week-truncated global min — derived in-plan from a
    // 1-row broadcast, no driver round-trip. Oracle = the plain theta
    // join (tiny at oracle scale), proving the bucketed rewrite exact.
    "q190_interval_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val sess = AnalyticsQueries.sessionIntervals(ev)
      val w0 = broadcast(ev.agg(date_trunc("week", min("ts")).as("w0")))
      val promos = w0.select(
          explode(sequence(lit(0), lit(9))).as("p_id"), col("w0"))
        .select(col("p_id").cast("long").as("p_id"),
          expr("timestampadd(DAY, CAST(p_id * 3 AS INT), w0)").as("ps"))
        .withColumn("pe", expr("timestampadd(DAY, 3, ps)"))
      val sessCells = sess.select(col("user_id"), col("session_idx"),
        col("s_start"), col("s_end"),
        explode(sequence(to_date(col("s_start")), to_date(col("s_end"))))
          .as("cell"))
      val promoCells = promos.select(col("p_id"), col("ps"), col("pe"),
        explode(sequence(to_date(col("ps")), date_add(to_date(col("ps")), 2)))
          .as("cell"))
      sessCells.join(promoCells, "cell")
        .filter(col("s_start") < col("pe") && col("ps") <= col("s_end"))
        .select("p_id", "user_id", "session_idx").distinct()
        .groupBy("p_id")
        .agg(count(lit(1)).as("n_sessions"),
          countDistinct("user_id").as("n_users"))
        .orderBy("p_id")
    }),

    // ---------------------------------------------------------------
    // q292: EXACT SPATIAL NEAREST-NEIGHBOR JOIN — the grid-bucketed
    // all-nearest shape (every customer → its closest supplier in a
    // deterministic md5-planted 1e6×1e6 integer plane, squared-
    // Euclidean metric so everything stays BIGINT-exact, ties by min
    // supplier key via the packed min-struct). The 100 TB plan:
    // suppliers (the dim side) replicate to their 3×3 neighbor cells
    // (9× a dim table) and customers equi-join their OWN cell — never
    // a cross join. The EXACTNESS argument: if the global nearest has
    // d² ≤ g² (g = the 1e5 cell width) its Chebyshev distance ≤ g, so
    // it lies in the ring and ring-best = global-best; otherwise the
    // customer falls back to a COARSE-grid pass: at cell width 5e5 the
    // 3×3 ring covers the whole 1e6 domain from any cell, so the
    // fallback is a shuffled equi-join on the coarse key that provably
    // sees every supplier — exact, and it moves ≤9× the dim rows
    // through an exchange instead of broadcasting a table that grows
    // with SF (a review catch: the broadcast version dies at Spark's
    // 8 GB limit exactly at the scale the query claims to serve). So
    // `via` ('ring'/'full') is itself a pure function of the data —
    // the oracle replays it from the brute-force minimum alone,
    // proving the two-phase plan exact, the same compare-against-the-
    // plan-it-avoids discipline as q290.
    "q292_grid_nn_join" -> ((s, dir) => {
      def coord(tag: String, k: org.apache.spark.sql.Column) =
        conv(substring(md5(concat(lit(tag), k.cast("string"))), 1, 5), 16, 10)
          .cast("long") % 1000000L
      val g = 100000L
      val cust = Tables.customer(s, dir).select(col("c_custkey").as("ck"),
          coord("cx:", col("c_custkey")).as("cx"),
          coord("cy:", col("c_custkey")).as("cy"))
        .withColumn("gx", expr(s"cx div $g"))
        .withColumn("gy", expr(s"cy div $g"))
        .localCheckpoint(false)
      val supp = Tables.supplier(s, dir).select(col("s_suppkey").as("sk"),
          coord("sx:", col("s_suppkey")).as("sx"),
          coord("sy:", col("s_suppkey")).as("sy"))
        .localCheckpoint(false)
      val offs = array((-1 to 1).map(lit(_)): _*)
      val reps = supp
        .select(col("sk"), col("sx"), col("sy"), explode(offs).as("dx"))
        .select(col("sk"), col("sx"), col("sy"),
          (expr(s"sx div $g") + col("dx")).as("gx"), explode(offs).as("dy"))
        .select(col("sk"), col("sx"), col("sy"), col("gx"),
          (expr(s"sy div $g") + col("dy")).as("gy"))
      val d2 = (col("cx") - col("sx")) * (col("cx") - col("sx")) +
        (col("cy") - col("sy")) * (col("cy") - col("sy"))
      val ring = cust.join(reps, Seq("gx", "gy"))
        .groupBy("ck")
        .agg(min(struct(d2.as("d2"), col("sk"))).as("m"))
        .select(col("ck"), col("m.d2").as("d2"), col("m.sk").as("sk"))
      val ringOk = ring.filter(col("d2") <= lit(g * g))
      val misses = cust
        .join(ringOk.select(col("ck").as("rk")), col("ck") === col("rk"),
          "left_anti")
      val cg = 500000L
      val coarseReps = supp
        .select(col("sk"), col("sx"), col("sy"), explode(offs).as("dx"))
        .select(col("sk"), col("sx"), col("sy"),
          (expr(s"sx div $cg") + col("dx")).as("cgx"), explode(offs).as("dy"))
        .select(col("sk"), col("sx"), col("sy"), col("cgx"),
          (expr(s"sy div $cg") + col("dy")).as("cgy"))
      val full = misses
        .withColumn("cgx", expr(s"cx div $cg"))
        .withColumn("cgy", expr(s"cy div $cg"))
        .join(coarseReps, Seq("cgx", "cgy"))
        .groupBy("ck")
        .agg(min(struct(d2.as("d2"), col("sk"))).as("m"))
        .select(col("ck"), col("m.d2").as("d2"), col("m.sk").as("sk"))
      ringOk.withColumn("via", lit("ring"))
        .unionAll(full.withColumn("via", lit("full")))
        .select(col("ck"), col("sk").as("nearest_sk"), col("d2"), col("via"))
        .orderBy("ck")
    })
  )

  override val oracles: Map[String, String] = Map(
    // q156: the oracle is the UNSALTED plain join — equality proves the
    // salt/replicate rewrite is semantics-preserving.
    "q156_salted_skew_join" ->
      """SELECT c_nationkey, count(*) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS revenue_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q116_runtime_filter_join" ->
      s"""SELECT p_brand, CAST(count(*) AS BIGINT) AS n_items,
         |  ${graft.functions.Exact.moneySumSql("l_extendedprice")} AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE p_brand = 'Brand#7'
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q35_right_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "q36_full_outer" ->
      """SELECT coalesce(c_nationkey, s_nationkey) AS nk,
        |  count(*) AS n_pairs,
        |  count(c_custkey) AS n_cust,
        |  count(s_suppkey) AS n_supp
        |FROM customer FULL JOIN supplier ON c_nationkey = s_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q37_range_join" ->
      """SELECT f.event_type, count(*) AS n_follow
        |FROM (SELECT user_id AS u, ts AS err_ts FROM events
        |      WHERE event_type = 'error') e
        |JOIN events f ON e.u = f.user_id
        |  AND f.ts > e.err_ts AND f.ts <= e.err_ts + INTERVAL 10 MINUTE
        |GROUP BY f.event_type ORDER BY f.event_type""".stripMargin,

    "q38_asof" ->
      """SELECT e.event_id,
        |  coalesce(p.pv, -1.0) AS last_purchase_v
        |FROM events e
        |ASOF LEFT JOIN (SELECT user_id, ts, max(value) AS pv FROM events
        |                WHERE event_type = 'purchase'
        |                GROUP BY user_id, ts) p
        |  ON e.user_id = p.user_id AND e.ts >= p.ts
        |ORDER BY e.event_id""".stripMargin,

    "q74_nullsafe_join" ->
      """SELECT n_name, r_name
        |FROM (SELECT n_name,
        |        CASE WHEN n_regionkey = 2 THEN NULL ELSE n_regionkey END AS nk
        |      FROM nation) n
        |JOIN (SELECT r_name,
        |        CASE WHEN r_regionkey = 2 THEN NULL ELSE r_regionkey END AS rk
        |      FROM region) r
        |  ON n.nk IS NOT DISTINCT FROM r.rk
        |ORDER BY n_name, r_name""".stripMargin,

    "q75_exists_subquery" ->
      """SELECT p_partkey, p_name FROM part p
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 49)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l
        |                  WHERE l.l_partkey = p.p_partkey AND l.l_quantity <= 2)
        |ORDER BY p_partkey""".stripMargin,

    // q190: the oracle is the PLAIN theta join over the same sessions
    // and promo spine — equality proves the day-grid bucketed rewrite
    // finds exactly the overlapping pairs.
    "q190_interval_join" ->
      s"""WITH ${AnalyticsQueries.SessionIntervalsSql},
        |w0 AS (SELECT date_trunc('week', min(ts)) AS w0 FROM events),
        |promos AS (
        |  SELECT CAST(i AS BIGINT) AS p_id,
        |    w0 + INTERVAL 1 DAY * CAST(i * 3 AS INTEGER) AS ps,
        |    w0 + INTERVAL 1 DAY * CAST(i * 3 + 3 AS INTEGER) AS pe
        |  FROM w0, (SELECT unnest(generate_series(0, 9)) AS i))
        |SELECT p_id, count(*) AS n_sessions,
        |  count(DISTINCT user_id) AS n_users
        |FROM intervals JOIN promos
        |  ON s_start < pe AND ps <= s_end
        |GROUP BY p_id ORDER BY p_id""".stripMargin,

    // q292: the oracle is the BRUTE-FORCE all-pairs minimum the grid
    // plan exists to avoid; `via` replays from the global minimum
    // alone (global d² ≤ g² ⟺ the nearest lies in the 3×3 ring).
    "q292_grid_nn_join" ->
      """WITH c AS (SELECT c_custkey AS ck,
        |    ('0x' || substring(md5('cx:' || CAST(c_custkey AS VARCHAR)),
        |      1, 5))::BIGINT % 1000000 AS cx,
        |    ('0x' || substring(md5('cy:' || CAST(c_custkey AS VARCHAR)),
        |      1, 5))::BIGINT % 1000000 AS cy
        |  FROM customer),
        |s AS (SELECT s_suppkey AS sk,
        |    ('0x' || substring(md5('sx:' || CAST(s_suppkey AS VARCHAR)),
        |      1, 5))::BIGINT % 1000000 AS sx,
        |    ('0x' || substring(md5('sy:' || CAST(s_suppkey AS VARCHAR)),
        |      1, 5))::BIGINT % 1000000 AS sy
        |  FROM supplier),
        |pairs AS (SELECT ck,
        |    (cx-sx)*(cx-sx) + (cy-sy)*(cy-sy) AS d2, sk
        |  FROM c, s),
        |best AS (SELECT ck, d2, sk FROM (SELECT ck, d2, sk,
        |    row_number() OVER (PARTITION BY ck ORDER BY d2, sk) AS rn
        |  FROM pairs) WHERE rn = 1)
        |SELECT ck, sk AS nearest_sk, d2,
        |  CASE WHEN d2 <= 10000000000 THEN 'ring' ELSE 'full' END AS via
        |FROM best ORDER BY ck""".stripMargin
  )
}
