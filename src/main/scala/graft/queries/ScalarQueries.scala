package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import graft.sources.Tables

/** Scalar-function families (SURVEY.md §2.2 "Scalar functions"):
  * date/time, json, conditional/null, array higher-order, string.
  * The reference's only scalar computation is int arithmetic
  * (`program.c:434`), string assembly (`program.c:203-212`) and parsing
  * (`program.c:432`); each family generalizes one of those or is EXT.
  *
  * Everything here is built-in `functions._` — codegen'd
  * expressions inside whole-stage codegen, zero UDFs (the 100 TB rule:
  * a scalar UDF in the hot path breaks codegen and serializes per row).
  */
object ScalarQueries extends QueryPack {

  override val queries: Map[String, Q] = Map(

    // q254: BUSINESS-DAY ARITHMETIC — order→ship lead time in Mon–Fri
    // business days, the calendar operator ops dashboards need beyond
    // raw datediff. Closed form, no calendar table and no per-day
    // explode: with B(n) = 5·(n div 7) + least(n mod 7, 5) counting
    // business days since the ANCHOR MONDAY 1990-01-01 (before all
    // data, so n ≥ 0 and div/mod agree across engines — negative
    // truncation vs floor division is the cross-engine trap the anchor
    // avoids), lead = B(ship) − B(order) = business days in
    // [order, ship) (order day counts if a weekday, ship day does
    // not — the half-open convention the spec pins). Output is the lead-time
    // histogram over the bounded domain; everything is one narrow
    // projection + one hash aggregate.
    "q254_business_days" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate"))
      Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_shipdate"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .select(
          datediff(col("l_shipdate").cast("date"),
            lit("1990-01-01").cast("date")).cast("long").as("ns"),
          datediff(col("o_orderdate").cast("date"),
            lit("1990-01-01").cast("date")).cast("long").as("no"))
        .select((expr("5 * (ns div 7) + least(ns % 7, 5)") -
          expr("5 * (no div 7) + least(no % 7, 5)")).as("bdays"))
        .groupBy("bdays").agg(count(lit(1)).as("n_items"))
        .orderBy("bdays")
    }),

    // Date/time family over o_orderdate (timestamps were unexercised in
    // round 1 — verdict gap).
    "q24_datetime" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          date_trunc("month", col("o_orderdate")).as("mon_start"),
          datediff(col("o_orderdate"), to_date(lit("1995-01-01"))).as("days_since"),
          (col("o_orderdate") + expr("INTERVAL 30 DAY")).as("due"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"))
        .orderBy("o_orderkey")),

    // JSON family over events.props (a JSON string, FIXTURES.md).
    // ONE from_json parse per row, bound in its own projection; both output
    // columns extract from the parsed struct. (An earlier version ran
    // get_json_object AND from_json — two full JSON parses per row — which
    // doubled the query's work; at 100 TB the parse IS the query, so parse
    // once. CollapseProject will not inline a non-cheap alias referenced
    // twice, so the two-step select keeps exactly one parse.)
    "q25_json" -> ((s, dir) => {
      val schema = StructType(Seq(StructField("k", IntegerType)))
      Tables.events(s, dir)
        .select(col("event_id"), from_json(col("props"), schema).as("p"))
        .select(
          col("event_id"),
          col("p").getField("k").as("k_path"),
          col("p").getField("k").as("k_struct"))
        .orderBy("event_id")
    }),

    // JSON path-extraction + generation surfaces (q25 covers the
    // parse-once from_json shape): get_json_object for ad-hoc path
    // access without a schema, to_json for row → JSON emission. On a
    // bounded subset — these are API-surface demonstrations; the bulk
    // JSON path is q25's single bound parse.
    "q97_json_path" -> ((s, dir) =>
      Tables.events(s, dir)
        .filter(col("event_id") % 10 === 0)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k_path"),
          to_json(struct(col("event_id").as("id"))).as("j_out"))
        .orderBy("event_id")),

    // VARIANT semi-structured ingestion (Spark 4's open-format JSON
    // type): nested JSON — built by the engine's own to_json so the
    // fixture needs no new data — parses ONCE to a binary VariantType
    // column, then typed variant_get path/array access feeds a plain
    // aggregate. The oracle computes from the RAW columns, proving the
    // string→variant→typed round-trip lossless (the reason variant
    // exists: parse cost paid once at ingest, every later access is
    // O(path) on the binary encoding, not a re-parse — the 100 TB
    // semi-structured contract). Longs only in the JSON: float text
    // rendering is engine-specific, integers are not. Keyed 1-in-10
    // subset (q97's pattern): the fixture demonstrates the round-trip,
    // and a full-table synthetic re-parse was the registry's most
    // expensive bench entry (5.9 s at sf0.1) while measuring only
    // to_json/parse_json CPU — Spark's code, not the engine's plan.
    "q189_variant_json" -> ((s, dir) => {
      val js = Tables.orders(s, dir)
        .filter(col("o_orderkey") % 10 === 0)
        .select(
        to_json(struct(
          col("o_orderstatus").as("status"),
          struct(col("o_orderpriority").as("prio"),
            col("o_custkey").as("cust")).as("meta"),
          array(col("o_custkey"), col("o_orderkey")).as("keys"))).as("j"))
      js.select(parse_json(col("j")).as("v"))
        .select(
          expr("variant_get(v, '$.status', 'string')").as("status"),
          expr("variant_get(v, '$.meta.prio', 'string')").as("prio"),
          expr("variant_get(v, '$.keys[1]', 'long')").as("okey"),
          expr("variant_get(v, '$.meta.cust', 'long')").as("cust"))
        .groupBy("status", "prio")
        .agg(count(lit(1)).as("n"), sum("okey").as("sum_okey"),
          sum("cust").as("sum_cust"))
        .orderBy("status", "prio")
    }),

    // Conditional/null family: when/otherwise, nullif, coalesce, casts.
    "q26_conditional" -> ((s, dir) =>
      Tables.customer(s, dir)
        .select(
          col("c_custkey"),
          when(col("c_acctbal") < 0, "neg")
            .when(col("c_acctbal") < 5000, "mid")
            .otherwise("high").as("band"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg2"),
          // floor, not a bare double→int cast: Spark's cast truncates
          // toward zero while DuckDB's rounds — floor is identical in both.
          floor(col("c_acctbal")).cast("int").as("bal_int"))
        .orderBy("c_custkey")),

    // Array higher-order family over embeddings.embedding
    // (ARRAY<FLOAT>, len 64): size, element_at, transform+aggregate
    // (squared L2 norm — the building block of the cosine operators).
    // Floats are cast to double BEFORE multiplication on both engines so
    // the arithmetic is identical.
    "q27_array_hof" -> ((s, dir) =>
      Tables.embeddings(s, dir)
        .select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          element_at(col("embedding"), 1).cast("double").as("e1"),
          aggregate(
            transform(col("embedding"), x => x.cast("double")),
            lit(0.0),
            (acc, x) => acc + x * x).as("sq_norm"),
          array_max(col("embedding")).cast("double").as("emax"))
        .orderBy("vec_id")),

    // Map family: construction, key/value extraction, lookup, explode.
    // Maps are built engine-side; outputs are flattened to scalars
    // (raw MAP columns don't round-trip comparably through parquet vs
    // DuckDB's MAP, so the compare surface is lookups and joins).
    "q61_map" -> ((s, dir) =>
      Tables.nation(s, dir)
        .select(col("n_nationkey"),
          map(lit("name"), col("n_name"),
            lit("region"), col("n_regionkey").cast("string")).as("m"))
        .select(
          col("n_nationkey"),
          element_at(col("m"), "name").as("m_name"),
          concat_ws(",", map_keys(col("m"))).as("keys_csv"),
          concat_ws(",", map_values(col("m"))).as("vals_csv"),
          size(col("m")).as("m_size"))
        .orderBy("n_nationkey")),

    // Explode over a map: one row per entry (generator surface on maps).
    "q62_map_explode" -> ((s, dir) =>
      Tables.region(s, dir)
        .select(col("r_regionkey"),
          explode(map(lit("k1"), col("r_name"), lit("k2"), lower(col("r_name")))))
        .toDF("r_regionkey", "mk", "mv")
        .orderBy("r_regionkey", "mk")),

    // Map family completion: build from entry arrays, merge with
    // map_concat (last-wins on key collision), rewrite values with the
    // transform_values higher-order function, parse from a delimited
    // string with str_to_map. Flattened to scalars for the oracle.
    "q92_map_ops" -> ((s, dir) =>
      Tables.nation(s, dir)
        .select(col("n_nationkey"),
          map_concat(
            map_from_entries(array(
              struct(lit("name").as("k"), col("n_name").as("v")))),
            map_from_entries(array(
              struct(lit("nk").as("k"), col("n_nationkey").cast("string").as("v"))))
          ).as("m"),
          str_to_map(
            concat(lit("rk:"), col("n_regionkey").cast("string"),
              lit(",id:"), col("n_nationkey").cast("string")),
            lit(","), lit(":")).as("parsed"))
        .select(
          col("n_nationkey"),
          element_at(transform_values(col("m"),
            (_, v) => upper(v)), "name").as("name_uc"),
          size(col("m")).as("m_size"),
          element_at(col("parsed"), "rk").cast("int").as("rk"),
          element_at(col("parsed"), "id").cast("int").as("id"))
        .orderBy("n_nationkey")),

    // Scalar UDF surface: the declared compat layer (SURVEY.md §2.2
    // "UDF"). The udf() here mirrors a built-in so the oracle can
    // check it — the POINT is the registration surface; the engine
    // rule stays "builtins > UDFs in hot paths" (UDFs break codegen).
    "q63_scalar_udf" -> ((s, dir) => {
      val revUdf = udf((sIn: String) => if (sIn == null) null else sIn.reverse)
      Tables.part(s, dir)
        .select(col("p_partkey"), revUdf(col("p_brand")).as("brand_rev"))
        .orderBy("p_partkey")
    }),

    // String family: the reference's sprintf/sscanf surface
    // (program.c:203-212,432) generalized.
    "q28_string" -> ((s, dir) =>
      Tables.part(s, dir)
        .select(
          col("p_partkey"),
          lower(col("p_name")).as("name_lc"),
          substring(col("p_type"), 1, 5).as("type5"),
          length(col("p_name")).as("name_len"),
          concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
          regexp_extract(col("p_type"), "^(\\w+)", 1).as("type_head"),
          format_string("%d:%s", col("p_partkey"), col("p_brand")).as("tagged"))
        .orderBy("p_partkey")),

    // posexplode: the ordinal-preserving generator (q46's explode loses
    // position; token position matters for any sequence-aware pipeline
    // stage). Narrow row expansion — no shuffle before the final sort.
    "q73_posexplode" -> ((s, dir) =>
      Tables.documents(s, dir)
        .filter(col("doc_id") < 20)
        .select(col("doc_id"),
          posexplode(graft.ops.Text.tokens(col("text"))).as(Seq("pos", "token")))
        .orderBy("doc_id", "pos")),

    // Date spine + gap fill: sequence() generates the full calendar
    // between min and max order date, left-joined to per-day counts so
    // empty days appear as zeros — the canonical time-series
    // densification. The spine derives from one 2-value aggregate,
    // never a driver-side loop.
    "q91_date_spine" -> ((s, dir) => {
      val days = Tables.orders(s, dir)
        .agg(min(to_date(col("o_orderdate"))).as("d0"),
          max(to_date(col("o_orderdate"))).as("d1"))
        .select(explode(sequence(col("d0"), col("d1"),
          expr("INTERVAL 1 DAY"))).as("day"))
      val perDay = Tables.orders(s, dir)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("n0"))
      days.join(perDay, Seq("day"), "left")
        .select(col("day").cast("string").as("day"),
          coalesce(col("n0"), lit(0L)).as("n_orders"))
        .orderBy("day")
    }),

    // explode_outer: the null-preserving generator — docs with no
    // matching token keep their row (an inner explode silently drops
    // them; the outer form is what a per-doc feature join needs).
    // ~23% of docs have no w-token, so both branches carry real rows.
    // NULL is coalesced to '' because ASC null ordering differs across
    // engines (Spark nulls-first, DuckDB nulls-last).
    "q85_explode_outer" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          explode_outer(filter(graft.ops.Text.tokens(col("text")),
            t => t.startsWith("w"))).as("wtok"))
        .select(col("doc_id"), coalesce(col("wtok"), lit("")).as("wtok"))
        .orderBy("doc_id", "wtok"))
  )

  override val oracles: Map[String, String] = Map(

    // business-days: same anchor-Monday closed form (n ≥ 0 keeps
    // div/mod engine-agnostic).
    "q254_business_days" ->
      """WITH j AS (SELECT
        |    datediff('day', DATE '1990-01-01', CAST(l_shipdate AS DATE))
        |      AS ns,
        |    datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
        |      AS no
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT CAST((5 * (ns // 7) + least(ns % 7, 5)) -
        |    (5 * (no // 7) + least(no % 7, 5)) AS BIGINT) AS bdays,
        |  CAST(count(*) AS BIGINT) AS n_items
        |FROM j GROUP BY 1 ORDER BY bdays""".stripMargin,
    // q189: straight from the raw columns — equality proves the
    // JSON→variant→typed path dropped nothing.
    "q189_variant_json" ->
      """SELECT o_orderstatus AS status, o_orderpriority AS prio,
        |  count(*) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_okey,
        |  CAST(sum(o_custkey) AS BIGINT) AS sum_cust
        |FROM orders WHERE o_orderkey % 10 = 0
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q24_datetime" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(month(o_orderdate) AS INT) AS mo,
        |  CAST(day(o_orderdate) AS INT) AS dom,
        |  date_trunc('month', o_orderdate) AS mon_start,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
        |  o_orderdate + INTERVAL 30 DAY AS due,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q25_json" ->
      """SELECT event_id,
        |  CAST(props->>'$.k' AS INT) AS k_path,
        |  CAST(props->>'$.k' AS INT) AS k_struct
        |FROM events ORDER BY event_id""".stripMargin,

    "q97_json_path" ->
      """SELECT event_id,
        |  CAST(props->>'$.k' AS INT) AS k_path,
        |  '{"id":' || event_id || '}' AS j_out
        |FROM events WHERE event_id % 10 = 0 ORDER BY event_id""".stripMargin,

    "q26_conditional" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 'neg'
        |       WHEN c_acctbal < 5000 THEN 'mid'
        |       ELSE 'high' END AS band,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg2,
        |  CAST(floor(c_acctbal) AS INT) AS bal_int
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q27_array_hof" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS INT) AS dim,
        |  CAST(embedding[1] AS DOUBLE) AS e1,
        |  list_sum(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS sq_norm,
        |  CAST(list_max(embedding) AS DOUBLE) AS emax
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q61_map" ->
      """SELECT n_nationkey,
        |  n_name AS m_name,
        |  'name,region' AS keys_csv,
        |  n_name || ',' || CAST(n_regionkey AS VARCHAR) AS vals_csv,
        |  2 AS m_size
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "q62_map_explode" ->
      """SELECT r_regionkey, mk, mv FROM (
        |  SELECT r_regionkey, 'k1' AS mk, r_name AS mv FROM region
        |  UNION ALL
        |  SELECT r_regionkey, 'k2' AS mk, lower(r_name) AS mv FROM region)
        |ORDER BY r_regionkey, mk""".stripMargin,

    "q63_scalar_udf" ->
      """SELECT p_partkey, reverse(p_brand) AS brand_rev
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q28_string" ->
      """SELECT p_partkey,
        |  lower(p_name) AS name_lc,
        |  substring(p_type, 1, 5) AS type5,
        |  CAST(length(p_name) AS INT) AS name_len,
        |  concat_ws('-', p_brand, p_type) AS brand_type,
        |  regexp_extract(p_type, '^(\w+)', 1) AS type_head,
        |  printf('%d:%s', p_partkey, p_brand) AS tagged
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q73_posexplode" ->
      """WITH d AS (
        |  SELECT doc_id, list_filter(string_split(text,' '), t -> t <> '') AS toks
        |  FROM documents WHERE doc_id < 20)
        |SELECT doc_id, CAST(u.i - 1 AS INT) AS pos, toks[u.i] AS token
        |FROM d, LATERAL (SELECT unnest(generate_series(1, len(d.toks))) AS i) u
        |ORDER BY doc_id, pos""".stripMargin,

    "q85_explode_outer" ->
      """WITH d AS (
        |  SELECT doc_id, list_filter(string_split(text,' '),
        |    t -> t LIKE 'w%') AS wt
        |  FROM documents)
        |SELECT doc_id,
        |  -- wt IS NULL: NULL text → Spark emits (doc_id, '') via
        |  -- explode_outer + coalesce; unnest(NULL) would emit nothing
        |  unnest(CASE WHEN wt IS NULL OR len(wt) = 0 THEN [''] ELSE wt END) AS wtok
        |FROM d ORDER BY doc_id, wtok""".stripMargin,

    "q92_map_ops" ->
      """SELECT n_nationkey,
        |  upper(n_name) AS name_uc,
        |  2 AS m_size,
        |  n_regionkey AS rk,
        |  n_nationkey AS id
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "q91_date_spine" ->
      """WITH bounds AS (
        |  SELECT CAST(min(o_orderdate) AS DATE) AS d0,
        |         CAST(max(o_orderdate) AS DATE) AS d1 FROM orders),
        |spine AS (
        |  SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
        |  FROM bounds),
        |per_day AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n0
        |  FROM orders GROUP BY 1)
        |SELECT CAST(CAST(s.day AS DATE) AS VARCHAR) AS day,
        |  coalesce(p.n0, 0) AS n_orders
        |FROM spine s LEFT JOIN per_day p ON CAST(s.day AS DATE) = p.day
        |ORDER BY day""".stripMargin
  )
}
