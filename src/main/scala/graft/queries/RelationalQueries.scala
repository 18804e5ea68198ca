package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Exact._

/** Relational core: scan → project/filter → join → aggregate → sort/limit
  * → set ops. This is the capability closure of the reference's whole
  * pipeline (SURVEY.md §2.1 S1–S22): its one job is
  * `A JOIN B ON j GROUP BY i,k SUM(a*b)` (program.c:479-514), which the
  * pricing/join/agg queries here generalize over the TPC-H-ish tables.
  *
  * Scale notes (100 TB design point):
  *  - dimension joins (nation/region/customer at dim scale) are broadcast
  *    — no shuffle of the fact table on the dim key;
  *  - aggregations are partial+final hash aggregates (map-side combine is
  *    what the reference's "combiner" (program.c:298-311) wanted to be);
  *  - filters/projections sit directly above the scan so Catalyst pushes
  *    them into the parquet reader (PushedFilters / ReadSchema).
  */
object RelationalQueries extends QueryPack {

  override val queries: Map[String, Q] = Map(
    // S13+S17 generalized: TPC-H Q1-style pricing summary.
    "q01_pricing_summary" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          moneySum(col("l_extendedprice")).as("sum_base_price"),
          moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
          avg("l_quantity").as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // Projection + computed columns + BETWEEN / LIKE / IN / IS NULL predicates.
    "q02_filter_project" -> ((s, dir) => {
      Tables.part(s, dir)
        .filter(col("p_size").between(10, 30)
          && col("p_type").like("%O%")
          && (col("p_brand").isin("Brand#13", "Brand#5", "Brand#19") || col("p_name").isNull))
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_uc"),
          (col("p_size") * 2).as("size2"),
          cents(col("p_retailprice")).as("price_cents"))
        .orderBy("p_partkey")
    }),

    // Fact ⋈ dim ⋈ dim with broadcast dims; revenue per nation.
    "q03_join_agg" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name")
        .agg(
          count(lit(1)).as("n_orders"),
          moneySum(col("o_totalprice")).as("total_rev"))
        .orderBy("n_name")
    }),

    // Global top-k: TakeOrderedAndProject, no full sort at scale.
    "q04_topk" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)),

    "q05_distinct" -> ((s, dir) =>
      Tables.customer(s, dir)
        .select("c_mktsegment").distinct()
        .orderBy("c_mktsegment")),

    "q06_count_distinct" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("nparts"),
          countDistinct(col("l_suppkey")).as("nsupps"))
        .orderBy("l_returnflag")),

    // Left outer join keeping customers with zero orders. The aggregate
    // sits BELOW the join (orders pre-aggregated per o_custkey): at 100×
    // the join shuffles one count-per-key row instead of every order row
    // (round-1 verdict plan fix); count(col) null semantics are preserved
    // by coalescing the missing-key count to 0.
    "q07_left_outer" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val perCust = Tables.orders(s, dir)
        .groupBy("o_custkey").agg(count(lit(1)).as("cnt"))
      c.join(perCust, c("c_custkey") === perCust("o_custkey"), "left")
        .select(col("c_custkey"), coalesce(col("cnt"), lit(0L)).as("n_orders"))
        .orderBy("c_custkey")
    }),

    // Left semi: EXISTS — the key-presence test of list.c:69-78 made relational.
    "q08_semi" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val big = Tables.orders(s, dir).filter(col("o_totalprice") > 300000)
      c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // Left anti: NOT EXISTS.
    "q09_anti" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val big = Tables.orders(s, dir).filter(col("o_totalprice") > 300000)
      c.join(big, c("c_custkey") === big("o_custkey"), "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    }),

    // Cross join (the mapper's i×k output-grid enumeration, program.c:189-191).
    "q10_cross_join" -> ((s, dir) =>
      Tables.region(s, dir).select(col("r_name"))
        .crossJoin(Tables.nation(s, dir).select(col("n_name")))
        .orderBy("r_name", "n_name")),

    // Union all + re-aggregate (A-pairs/B-pairs interleave, program.c:215-217).
    "q11_union_all" -> ((s, dir) => {
      val c = Tables.customer(s, dir).select(col("c_nationkey").as("nk"))
      val su = Tables.supplier(s, dir).select(col("s_nationkey").as("nk"))
      c.unionByName(su)
        .groupBy("nk").agg(count(lit(1)).as("n"))
        .orderBy("nk")
    }),

    "q12_union_distinct" -> ((s, dir) => {
      val c = Tables.customer(s, dir).select(col("c_nationkey").as("nk"))
      val su = Tables.supplier(s, dir).select(col("s_nationkey").as("nk"))
      c.unionByName(su).distinct().orderBy("nk")
    }),

    "q13_intersect" -> ((s, dir) => {
      val c = Tables.customer(s, dir).select(col("c_nationkey").as("nk"))
      val su = Tables.supplier(s, dir).select(col("s_nationkey").as("nk"))
      c.intersect(su).orderBy("nk")
    }),

    "q14_except" -> ((s, dir) => {
      val c = Tables.customer(s, dir).select(col("c_nationkey").as("nk"))
      val su = Tables.supplier(s, dir).select(col("s_nationkey").as("nk"))
      c.except(su).orderBy("nk")
    }),

    // Multiset set ops — INTERSECT ALL / EXCEPT ALL keep duplicate
    // MULTIPLICITY (q13/q14 are the distinct variants): two ship-year
    // slices of (part, qty) compared as bags. Spark plans both as one
    // hash aggregate counting per-row multiplicity on each side then
    // replicating min/difference counts — no join, no sort, same
    // scale shape as a groupBy on the row. Output ordered by all
    // columns (duplicate rows are interchangeable, so the total order
    // is still deterministic).
    "q158_multiset_ops" -> ((s, dir) => {
      def slice(y: Int) = Tables.lineitem(s, dir)
        .filter(col("l_partkey") <= 500 && year(col("l_shipdate")) === y)
        .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"))
      val a = slice(1996)
      val b = slice(1997)
      a.intersectAll(b).withColumn("tag", lit("both"))
        .unionAll(a.exceptAll(b).withColumn("tag", lit("only_1996")))
        .orderBy("tag", "l_partkey", "qty")
    }),

    // TPC-H Q5-shaped 5-table join: fact ⋈ fact ⋈ dim ⋈ dim ⋈ dim.
    // The deep-join showcase: Catalyst orders the joins, both small
    // dims broadcast, the two fact tables shuffle once on their key.
    "q69_five_way_join" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
        .groupBy("r_name")
        .agg(
          moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name")
    }),

    // Correlated scalar subquery (SQL surface — Catalyst decorrelates
    // it into a left outer aggregate join; the subquery machinery the
    // DataFrame API can't express directly).
    "q70_correlated_subquery" -> ((s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("cust_q70")
      Tables.orders(s, dir).createOrReplaceTempView("ord_q70")
      s.sql(
        """SELECT c_custkey,
          |  (SELECT count(*) FROM ord_q70 o
          |   WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000) AS n_big
          |FROM cust_q70 c
          |ORDER BY c_custkey""".stripMargin)
    }),

    // Multi-column global sort (range-partitioned SortExec) + limit.
    "q15_sort_limit" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy(col("l_quantity").desc, col("l_orderkey").asc, col("l_linenumber").asc)
        .limit(100)),

    // -----------------------------------------------------------------
    // q305: volume shipping between a nation PAIR (the TPC-H Q7 shape)
    // — the bidirectional join ladder: lineitem⋈supplier⋈orders⋈customer
    // with BOTH nation assignments admitted and the (supp, cust) pair
    // disambiguated after the joins. Scale shape: the 2-nation filter
    // joins INTO supplier/customer BEFORE they reach the facts, so the
    // fact side is pruned by the earliest possible key join; nation is
    // the only explicit broadcast (true dim), supplier/customer are left
    // to AQE — at 100 TB a 2-of-25-nations customer slice is NOT
    // broadcastable and must shuffle on its key, which this plan does.
    // The one unavoidable fact-fact shuffle is lineitem⋈orders on
    // l_orderkey. Revenue sums exact integer cents (Exact.moneySum).
    "q305_volume_shipping" -> ((s, dir) => {
      val n2 = broadcast(Tables.nation(s, dir)
        .filter(col("n_name").isin("NATION_12", "NATION_19")))
      val su = Tables.supplier(s, dir)
        .join(n2, col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cu = Tables.customer(s, dir)
        .join(n2, col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val l = Tables.lineitem(s, dir)
        .filter(col("l_shipdate").between(
          lit("1996-01-01").cast("timestamp"),
          lit("1997-12-31").cast("timestamp")))
        .select("l_orderkey", "l_suppkey", "l_shipdate",
          "l_extendedprice", "l_discount")
      val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
      l.join(su, col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(cu, col("o_custkey") === col("c_custkey"))
        .filter(
          (col("supp_nation") === "NATION_12" && col("cust_nation") === "NATION_19") ||
          (col("supp_nation") === "NATION_19" && col("cust_nation") === "NATION_12"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // -----------------------------------------------------------------
    // q306: national market share (the TPC-H Q8 shape) — the CASE-share
    // ratio over a 6-table ladder: of all PROMO-part revenue sold to
    // ASIA-region customers, what fraction came from NATION_3 suppliers,
    // per order year. Both the numerator (CASE-gated) and denominator
    // accumulate in ONE aggregate pass as exact integer cents; the share
    // is then a single IEEE division of two BIGINTs quantized half-up to
    // 1e-9 — deterministic and replayed bit-identically by the oracle
    // (the repo's standard ratio formulation; NULL-guarded on an empty
    // denominator). part is filtered 1-in-6 by type and supplier carries
    // only (s_suppkey, n_name) — at 100 TB both are AQE's call to
    // broadcast or shuffle; nothing here forces a broadcast of a
    // fact-scale side.
    "q306_market_share" -> ((s, dir) => {
      val asiaN = broadcast(Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey"))
      val cu = Tables.customer(s, dir)
        .join(asiaN, col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey")
      val su = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val p = Tables.part(s, dir).filter(col("p_type") === "PROMO")
        .select("p_partkey")
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate").between(
          lit("1996-01-01").cast("timestamp"),
          lit("1997-12-31").cast("timestamp")))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val vol = cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
      Tables.lineitem(s, dir)
        .select("l_orderkey", "l_partkey", "l_suppkey",
          "l_extendedprice", "l_discount")
        .join(p, col("l_partkey") === col("p_partkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(cu, col("o_custkey") === col("c_custkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_3", vol).otherwise(lit(0L)))
            .as("nat_cents"),
          sum(vol).as("tot_cents"))
        .withColumn("share9",
          when(col("tot_cents") === 0, lit(null).cast("long"))
            .otherwise(floor(col("nat_cents").cast("double") / col("tot_cents")
              * lit(1e9) + lit(0.5)).cast("long")))
        .orderBy("o_year")
    }),

    // -----------------------------------------------------------------
    // q307: product-type profit (the TPC-H Q9 shape, adapted: this
    // schema has no partsupp/ps_supplycost, so unit cost is modeled as
    // 10% of p_retailprice — the SHAPE is what matters: a part-name
    // LIKE prune, a 5-table ladder, an arithmetic profit expression
    // combining columns of THREE tables, grouped by supplier nation ×
    // order year). Profit accumulates in exact integer MILLS (0.001$):
    // revenue mills = round(extprice·(1−disc)·1000), cost mills =
    // qty·retail_cents (since qty·retail·0.1 $ ≡ qty·retail·100 mills)
    // — unit ≈2^27, so BIGINT sums have 100 TB headroom (2^27 · 2^34
    // rows/group < 2^63). Only nation is force-broadcast.
    "q307_product_profit" -> ((s, dir) => {
      val p = Tables.part(s, dir).filter(col("p_name").like("%red%"))
        .select(col("p_partkey"), cents(col("p_retailprice")).as("retail_cents"))
      val su = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
      val n = broadcast(Tables.nation(s, dir))
      val o = Tables.orders(s, dir).select("o_orderkey", "o_orderdate")
      Tables.lineitem(s, dir)
        .select("l_orderkey", "l_partkey", "l_suppkey",
          "l_quantity", "l_extendedprice", "l_discount")
        .join(p, col("l_partkey") === col("p_partkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .withColumn("profit_mills",
          round(col("l_extendedprice") * (lit(1) - col("l_discount")) * lit(1000), 0)
            .cast("long")
          - col("l_quantity").cast("long") * col("retail_cents"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(sum("profit_mills").as("sum_profit_mills"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // -----------------------------------------------------------------
    // q308: disjunctive-predicate join (the TPC-H Q19 shape) — an OR of
    // three conjunct blocks that each mix part attributes with lineitem
    // attributes, so the disjunction itself cannot be pushed below the
    // join. The scale move is the two PER-SIDE envelope filters placed
    // explicitly above each scan (brand ∈ {1,2,3} ∧ size ≤ 15;
    // quantity ∈ [1,30]) — the union of the blocks' per-side ranges,
    // which Catalyst pushes into the parquet readers (PushedFilters) so
    // only candidate rows ever reach the join; the OR then prunes the
    // cross-block mismatches. Single-row exact-cents output.
    "q308_disjunctive_join" -> ((s, dir) => {
      val p = Tables.part(s, dir)
        .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
          && col("p_size").between(1, 15))
        .select("p_partkey", "p_brand", "p_size")
      val l = Tables.lineitem(s, dir)
        .filter(col("l_quantity").between(1, 30))
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      l.join(p, col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 5)
            && col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 10)
            && col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 15)
            && col("l_quantity").between(20, 30)))
        .agg(
          moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // -----------------------------------------------------------------
    // q309: shipping priority (the TPC-H Q3 shape) — segment-filtered
    // customer ⋈ date-split orders ⋈ lineitem, revenue per order, global
    // top-10. The date split (ordered before the pivot, shipped after)
    // prunes BOTH fact scans in the parquet reader; the per-order
    // aggregate shuffles on the join key it already has; top-10 is
    // TakeOrderedAndProject (never a global sort).
    "q309_shipping_priority" -> ((s, dir) => {
      val pivot = lit("1998-06-01").cast("timestamp")
      val c = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val o = Tables.orders(s, dir).filter(col("o_orderdate") < pivot)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val l = Tables.lineitem(s, dir).filter(col("l_shipdate") > pivot)
        .select("l_orderkey", "l_extendedprice", "l_discount")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    }),

    // -----------------------------------------------------------------
    // q310: returned-item reporting (the TPC-H Q10 shape) — customers
    // ranked by revenue they returned in a quarter. Ladder + per-customer
    // aggregate + top-20; nation broadcast, returnflag/date predicates
    // pushed to both scans.
    "q310_returned_items" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate").between(
          lit("1996-07-01").cast("timestamp"),
          lit("1996-09-30").cast("timestamp")))
        .select("o_orderkey", "o_custkey")
      val c = Tables.customer(s, dir)
      val n = broadcast(Tables.nation(s, dir))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // -----------------------------------------------------------------
    // q311: forecast revenue change (the TPC-H Q6 shape) — the pure
    // scan-side query: every predicate (ship year, discount band,
    // quantity cap) reaches the parquet reader, the aggregate is one
    // map-side-combinable cents sum, and the answer is a single row.
    // The discount literals are the exact parquet doubles (0.05/0.07
    // parse to identical bit patterns in both engines).
    "q311_revenue_forecast" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate").between(
          lit("1996-01-01").cast("timestamp"),
          lit("1996-12-31").cast("timestamp"))
          && col("l_discount").between(0.05, 0.07)
          && col("l_quantity") < 24)
        .agg(moneySum(col("l_extendedprice") * col("l_discount"))
          .as("revenue"))),

    // -----------------------------------------------------------------
    // q312: priority class counts (the TPC-H Q12 shape, shipmode →
    // returnflag: this schema has no l_shipmode) — the conditional-
    // aggregation-over-a-join pattern: one fact-fact join, then CASE
    // counts split the order-priority domain per group in a single
    // aggregate pass (no second scan, no pivot).
    "q312_priority_classes" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
        .filter(col("l_shipdate").between(
          lit("1996-01-01").cast("timestamp"),
          lit("1996-12-31").cast("timestamp")))
        .select("l_orderkey", "l_returnflag")
      val o = Tables.orders(s, dir).select("o_orderkey", "o_orderpriority")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))
        .orderBy("l_returnflag")
    }),

    // -----------------------------------------------------------------
    // q313: promotion effect (the TPC-H Q14 shape) — the CASE-share
    // ratio in its single-group form: what fraction of one month's
    // revenue came from PROMO parts. Numerator and denominator
    // accumulate as exact cents in ONE aggregate; the share is one
    // IEEE division quantized half-up to 1e-9 (NULL on an empty
    // denominator), the q306 contract.
    "q313_promo_effect" -> ((s, dir) => {
      val p = Tables.part(s, dir).select("p_partkey", "p_type")
      val vol = cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate").between(
          lit("1996-06-01").cast("timestamp"),
          lit("1996-06-30").cast("timestamp")))
        .select("l_partkey", "l_extendedprice", "l_discount")
        .join(p, col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", vol).otherwise(lit(0L)))
            .as("promo_cents"),
          sum(vol).as("tot_cents"))
        .withColumn("promo_share9",
          when(col("tot_cents") === 0, lit(null).cast("long"))
            .otherwise(floor(col("promo_cents").cast("double") / col("tot_cents")
              * lit(1e9) + lit(0.5)).cast("long")))
    }),

    // -----------------------------------------------------------------
    // q314: top supplier (the TPC-H Q15 shape) — per-supplier quarterly
    // revenue, keep the supplier(s) achieving the GLOBAL max (ties
    // kept, the view+subquery form's semantics). The max is a 1-row
    // aggregate broadcast back and compared in EXACT integer cents
    // (q151's global-threshold pattern) — no window, no second scan of
    // the fact table (the revenue table is reused for both the max and
    // the filter).
    "q314_top_supplier" -> ((s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .filter(col("l_shipdate").between(
          lit("1996-01-01").cast("timestamp"),
          lit("1996-03-31").cast("timestamp")))
        .groupBy("l_suppkey")
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("rev_cents"))
      val mx = broadcast(rev.agg(max("rev_cents").as("max_cents")))
      rev.crossJoin(mx)
        .filter(col("rev_cents") === col("max_cents"))
        .join(Tables.supplier(s, dir),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          (col("rev_cents") / lit(100.0)).as("total_revenue"))
        .orderBy("s_suppkey")
    }),

    // -----------------------------------------------------------------
    // q315: parts/supplier relationship (the TPC-H Q16 shape) — how
    // many distinct suppliers can deliver each part class, excluding a
    // supplier blocklist (negative account balance, standing in for the
    // complaints filter) and an attribute carve-out. The (part,
    // supplier) pairs come from lineitem (no partsupp in this schema),
    // pre-deduplicated BEFORE the dimension join so the distinct-count
    // shuffle carries pair keys, not line items; the blocklist is an
    // anti join.
    "q315_supplier_counts" -> ((s, dir) => {
      val p = Tables.part(s, dir)
        .filter(col("p_brand") =!= "Brand#1" && !col("p_type").like("PROMO%")
          && col("p_size").isin(1, 5, 10, 15, 20, 25))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      val bad = Tables.supplier(s, dir).filter(col("s_acctbal") < 0)
        .select("s_suppkey")
      val pairs = Tables.lineitem(s, dir)
        .select("l_partkey", "l_suppkey").distinct()
        .join(bad, col("l_suppkey") === col("s_suppkey"), "left_anti")
      pairs.join(p, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    }),

    // -----------------------------------------------------------------
    // q316: important stock (the TPC-H Q11 shape, partsupp → shipped
    // volume) — per-part quantity shipped by one nation's suppliers,
    // HAVING share above a global-aggregate threshold. TPC-H's fixed
    // fraction is deliberately SF-scaled (0.0001/SF) because any fixed
    // share empties as the part population grows; the scale-free
    // equivalent used here keeps parts above 2× the MEAN part share:
    // qty·n_parts > 2·tot_qty, compared as cross-multiplied BIGINTs (no
    // float fraction). The global (total, count) re-aggregates the SAME
    // per-part table (exchange-reusable subtree) into one broadcast row
    // — no second fact scan.
    "q316_important_stock" -> ((s, dir) => {
      val su = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)
          .filter(col("n_name") === "NATION_12")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      val perPart = Tables.lineitem(s, dir)
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(sum(col("l_quantity").cast("long")).as("qty"))
      val tot = broadcast(perPart.agg(
        sum("qty").as("tot_qty"), count(lit(1)).as("n_parts")))
      perPart.crossJoin(tot)
        .filter(col("qty") * col("n_parts") > col("tot_qty") * lit(2L))
        .select("l_partkey", "qty")
        .orderBy(col("qty").desc, col("l_partkey"))
    }),

    // -----------------------------------------------------------------
    // q317: late-order priority check (the TPC-H Q4 shape, commit/
    // receipt dates → a 60-day shipping SLA) — orders in a window that
    // had AT LEAST ONE late line, counted per priority. The existence
    // test is a left-semi join with the lateness predicate as join
    // condition — never a count-then-filter of the fact table.
    "q317_late_order_priority" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate").between(
          lit("1996-01-01").cast("timestamp"),
          lit("1996-06-30").cast("timestamp")))
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
      val l = Tables.lineitem(s, dir).select("l_orderkey", "l_shipdate")
      o.join(l,
          col("l_orderkey") === col("o_orderkey")
            && col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    })
  )

  override val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  sum(l_quantity) AS sum_qty,
         |  ${moneySumSql("l_extendedprice")} AS sum_base_price,
         |  ${moneySumSql("l_extendedprice*(1-l_discount)")} AS sum_disc_price,
         |  ${moneySumSql("l_extendedprice*(1-l_discount)*(1+l_tax)")} AS sum_charge,
         |  avg(l_quantity) AS avg_qty,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT p_partkey, upper(p_brand) AS brand_uc, p_size * 2 AS size2,
        |  CAST(round(p_retailprice*100) AS BIGINT) AS price_cents
        |FROM part
        |WHERE p_size BETWEEN 10 AND 30 AND p_type LIKE '%O%'
        |  AND (p_brand IN ('Brand#13','Brand#5','Brand#19') OR p_name IS NULL)
        |ORDER BY p_partkey""".stripMargin,

    "q03_join_agg" ->
      s"""SELECT n_name, count(*) AS n_orders,
         |  ${moneySumSql("o_totalprice")} AS total_rev
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY n_name
         |ORDER BY n_name""".stripMargin,

    "q04_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q05_distinct" ->
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",

    "q06_count_distinct" ->
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS nparts,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS nsupps
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q07_left_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "q08_semi" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,

    "q09_anti" ->
      """SELECT c_custkey FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,

    "q10_cross_join" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,

    "q11_union_all" ->
      """SELECT nk, count(*) AS n FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nk FROM supplier)
        |GROUP BY nk ORDER BY nk""".stripMargin,

    "q12_union_distinct" ->
      """SELECT c_nationkey AS nk FROM customer
        |UNION
        |SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk""".stripMargin,

    "q13_intersect" ->
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk""".stripMargin,

    "q158_multiset_ops" ->
      """WITH li AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
        |    year(l_shipdate) AS y
        |  FROM lineitem WHERE l_partkey <= 500),
        |a AS (SELECT l_partkey, qty FROM li WHERE y = 1996),
        |b AS (SELECT l_partkey, qty FROM li WHERE y = 1997),
        |m AS (
        |  SELECT l_partkey, qty, 'both' AS tag
        |  FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
        |  UNION ALL
        |  SELECT l_partkey, qty, 'only_1996' AS tag
        |  FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b))
        |SELECT l_partkey, qty, tag FROM m
        |ORDER BY tag, l_partkey, qty""".stripMargin,

    "q14_except" ->
      """SELECT c_nationkey AS nk FROM customer
        |EXCEPT
        |SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk""".stripMargin,

    "q69_five_way_join" ->
      s"""SELECT r_name,
         |  ${moneySumSql("l_extendedprice*(1-l_discount)")} AS revenue,
         |  count(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q70_correlated_subquery" ->
      """SELECT c_custkey,
        |  (SELECT count(*) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000) AS n_big
        |FROM customer c
        |ORDER BY c_custkey""".stripMargin,

    "q15_sort_limit" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |ORDER BY l_quantity DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin,

    // Textbook TPC-H Q7 form: the oracle keeps the flat 6-table join
    // with the bidirectional nation-pair disjunction in WHERE.
    "q305_volume_shipping" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  year(l_shipdate) AS l_year,
         |  ${moneySumSql("l_extendedprice*(1-l_discount)")} AS revenue
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE ((n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_19')
         |    OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_12'))
         |  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
         |                     AND TIMESTAMP '1997-12-31 00:00:00'
         |GROUP BY 1, 2, 3
         |ORDER BY 1, 2, 3""".stripMargin,

    // Textbook TPC-H Q8 form; the share replays the engine's exact
    // formulation: integer-cent sums, one double division, half-up 1e-9
    // quantization, NULL on an empty denominator.
    "q306_market_share" ->
      s"""WITH vol AS (
         |  SELECT year(o_orderdate) AS o_year, n1.n_name AS supp_nation,
         |    ${centsSql("l_extendedprice*(1-l_discount)")} AS v_cents
         |  FROM lineitem
         |  JOIN part ON l_partkey = p_partkey
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |  JOIN region ON n2.n_regionkey = r_regionkey
         |  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
         |    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
         |                        AND TIMESTAMP '1997-12-31 00:00:00'),
         |agg AS (
         |  SELECT o_year,
         |    CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN v_cents ELSE 0 END)
         |      AS BIGINT) AS nat_cents,
         |    CAST(sum(v_cents) AS BIGINT) AS tot_cents
         |  FROM vol GROUP BY o_year)
         |SELECT o_year, nat_cents, tot_cents,
         |  CASE WHEN tot_cents = 0 THEN NULL
         |    ELSE CAST(floor(CAST(nat_cents AS DOUBLE) / tot_cents
         |      * CAST(1e9 AS DOUBLE) + 0.5) AS BIGINT) END AS share9
         |FROM agg ORDER BY o_year""".stripMargin,

    // Textbook TPC-H Q9 form (cost adapted to 10% of p_retailprice —
    // this schema has no partsupp), profit replayed in exact mills.
    "q307_product_profit" ->
      """SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |  CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*1000) AS BIGINT)
        |      - CAST(l_quantity AS BIGINT)
        |        * CAST(round(p_retailprice*100) AS BIGINT)) AS BIGINT)
        |    AS sum_profit_mills
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2
        |ORDER BY nation, o_year DESC""".stripMargin,

    // Textbook TPC-H Q19 form: the bare OR-of-conjuncts, no envelope
    // filters — proving the engine's pushdown rewrite is semantics-
    // preserving.
    "q308_disjunctive_join" ->
      s"""SELECT ${moneySumSql("l_extendedprice*(1-l_discount)")} AS revenue,
         |  count(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
         |        AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
         |        AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
         |        AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q309_shipping_priority" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
         |  ${moneySumSql("l_extendedprice*(1-l_discount)")} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue DESC, o_orderdate, l_orderkey
         |LIMIT 10""".stripMargin,

    "q310_returned_items" ->
      s"""SELECT c_custkey, c_name, n_name,
         |  ${moneySumSql("l_extendedprice*(1-l_discount)")} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate BETWEEN TIMESTAMP '1996-07-01 00:00:00'
         |                      AND TIMESTAMP '1996-09-30 00:00:00'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue DESC, c_custkey
         |LIMIT 20""".stripMargin,

    "q311_revenue_forecast" ->
      s"""SELECT ${moneySumSql("l_extendedprice*l_discount")} AS revenue
         |FROM lineitem
         |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
         |                     AND TIMESTAMP '1996-12-31 00:00:00'
         |  AND l_discount BETWEEN 0.05 AND 0.07
         |  AND l_quantity < 24""".stripMargin,

    "q312_priority_classes" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
        |                     AND TIMESTAMP '1996-12-31 00:00:00'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q313_promo_effect" ->
      s"""WITH agg AS (
         |  SELECT
         |    CAST(sum(CASE WHEN p_type = 'PROMO'
         |      THEN ${centsSql("l_extendedprice*(1-l_discount)")}
         |      ELSE 0 END) AS BIGINT) AS promo_cents,
         |    CAST(sum(${centsSql("l_extendedprice*(1-l_discount)")})
         |      AS BIGINT) AS tot_cents
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE l_shipdate BETWEEN TIMESTAMP '1996-06-01 00:00:00'
         |                       AND TIMESTAMP '1996-06-30 00:00:00')
         |SELECT promo_cents, tot_cents,
         |  CASE WHEN tot_cents = 0 THEN NULL
         |    ELSE CAST(floor(CAST(promo_cents AS DOUBLE) / tot_cents
         |      * CAST(1e9 AS DOUBLE) + 0.5) AS BIGINT) END AS promo_share9
         |FROM agg""".stripMargin,

    // The view+scalar-subquery TPC-H Q15 form: revenue view referenced
    // twice (MATERIALIZED — DuckDB re-inlines multiply-referenced CTEs
    // otherwise), max compared in exact cents.
    "q314_top_supplier" ->
      s"""WITH rev AS MATERIALIZED (
         |  SELECT l_suppkey,
         |    CAST(sum(${centsSql("l_extendedprice*(1-l_discount)")})
         |      AS BIGINT) AS rev_cents
         |  FROM lineitem
         |  WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
         |                       AND TIMESTAMP '1996-03-31 00:00:00'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, rev_cents / 100.0 AS total_revenue
         |FROM rev JOIN supplier ON l_suppkey = s_suppkey
         |WHERE rev_cents = (SELECT max(rev_cents) FROM rev)
         |ORDER BY s_suppkey""".stripMargin,

    "q315_supplier_counts" ->
      """SELECT p_brand, p_type, p_size,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%'
        |  AND p_size IN (1, 5, 10, 15, 20, 25)
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q316_important_stock" ->
      """WITH perpart AS MATERIALIZED (
        |  SELECT l_partkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
        |    AS qty
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_12'
        |  GROUP BY l_partkey)
        |SELECT l_partkey, qty FROM perpart
        |WHERE qty * (SELECT count(*) FROM perpart)
        |    > 2 * (SELECT CAST(sum(qty) AS BIGINT) FROM perpart)
        |ORDER BY qty DESC, l_partkey""".stripMargin,

    "q317_late_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
        |                      AND TIMESTAMP '1996-06-30 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin
  )
}
