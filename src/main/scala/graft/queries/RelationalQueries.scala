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
        .limit(100))
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
        |ORDER BY l_quantity DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin
  )
}
