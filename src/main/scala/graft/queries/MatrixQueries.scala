package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.{BinaryMatrix, Generator, Tables}
import graft.ops.Matrix
import graft.functions.Aggregators.DotProductAgg
import graft.mr.MapReduceCompat

/** The reference's own job — dense matrix multiply — plus the typed
  * surfaces built from it (custom Aggregator UDAF, MapReduce facade).
  * SURVEY.md §2.1: the whole C program (`program.c:479-514`) is
  * `SELECT a.i, b.k, SUM(a.v*b.v) FROM A JOIN B ON a.j=b.j GROUP BY i,k`.
  *
  * Shapes are deliberately non-square (48×32 ⋈ 32×40): the reference
  * silently breaks on those (stride bug `program.c:104-108`, reducer
  * range heuristics `program.c:381-393` — SURVEY.md §2.1 bug list); the
  * declarative formulation is shape-oblivious.
  */
object MatrixQueries extends QueryPack {
  private val L = 48; private val M = 32; private val N = 40

  override val queries: Map[String, Q] = Map(
    // S1+S9+S12+S13+S17: generated COO matrices (the reference's own
    // generator semantics, seeded) through the full matmul plan.
    "q16_matmul" -> ((s, _) => {
      val a = Generator.cooMatrix(s, L, M, seed = 1, iName = "i", jName = "j")
      val b = Generator.cooMatrix(s, M, N, seed = 2, iName = "j", jName = "k")
      Matrix.matmul(a, b).orderBy("i", "k")
    }),

    // Same query shape over harness parquet (so the oracle reads the
    // same base tables): part-derived A ⋈ supplier-derived B.
    "q17_matmul_tables" -> ((s, dir) => {
      val a = Tables.part(s, dir).select(
        (col("p_partkey") % 48).cast("int").as("i"),
        (col("p_partkey") % 29).cast("int").as("j"),
        (col("p_size") % 10).cast("int").as("v"))
      val b = Tables.supplier(s, dir).select(
        (col("s_suppkey") % 29).cast("int").as("j"),
        (col("s_suppkey") % 20).cast("int").as("k"),
        (length(col("s_name")) % 10).cast("int").as("v"))
      Matrix.matmul(a, b).orderBy("i", "k")
    }),

    // The reference's reducer fold (program.c:424-436) as a registered
    // typed Aggregator UDAF: dot_product(av, bv) per (i,k) group.
    "q18_matmul_udaf" -> ((s, _) => {
      val dot = udaf(DotProductAgg)
      val a = Generator.cooMatrix(s, L, M, seed = 1).select(
        col("i"), col("j"), col("v").cast("long").as("av"))
      val b = Generator.cooMatrix(s, M, N, seed = 2, iName = "j", jName = "k")
        .select(col("j"), col("k"), col("v").cast("long").as("bv"))
      a.join(b, "j")
        .groupBy("i", "k")
        .agg(dot(col("av"), col("bv")).as("v"))
        .orderBy("i", "k")
    }),

    // Blocked (tiled) matmul — identical result to q16 through the
    // SUMMA-style dense-kernel path (tile size deliberately NOT
    // dividing the 48/32/40 dims, exercising ragged edge tiles).
    "q64_matmul_blocked" -> ((s, _) => {
      val a = Generator.cooMatrix(s, L, M, seed = 1, iName = "i", jName = "j")
      val b = Generator.cooMatrix(s, M, N, seed = 2, iName = "j", jName = "k")
      Matrix.matmulBlocked(a, b, t = 13).orderBy("i", "k")
    }),

    // Raw headerless int32 binary ingest — the reference's literal
    // on-disk matrix format, as a library op ([[BinaryMatrix]]:
    // binaryFile scan, filename dims, per-partition ByteBuffer decode
    // to COO). The fixture file is written driver-side with the same
    // seeded cell formula the Generator uses, so the DuckDB oracle
    // replays it.
    "q93_binary_ingest" -> ((s, dir) => {
      val outDir = graft.sources.Staging.dir(dir, "refbin")
      BinaryMatrix.clear(outDir) // a stale .dat would union foreign rows
      BinaryMatrix.write(outDir, L, M, tag = 1)(id => (((id * 73 + 18) % 97) % 10).toInt)
      BinaryMatrix.readCoo(s, outDir).orderBy("i", "j")
    }),

    // MapReduce-compat facade (SURVEY.md §7.1): word count on documents
    // through the reference's exact phase vocabulary — map emits (token,1)
    // pairs, combiner-style reduceByKey folds them (program.c:184-311).
    "q19_mr_wordcount" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir).select("text").as[String]
      MapReduceCompat
        .reduceByKey(docs)(text =>
          text.split(' ').iterator.filter(_.nonEmpty).map(w => (w, 1L)))(_ + _)
        .toDF("token", "cnt")
        .orderBy("token")
    })
  )

  private def genOracle: String =
    s"""WITH a AS (${Generator.cooMatrixSql(L, M, seed = 1)}),
       |     b AS (${Generator.cooMatrixSql(M, N, seed = 2, iName = "j", jName = "k")})
       |SELECT a.i, b.k, CAST(sum(a.v*b.v) AS BIGINT) AS v
       |FROM a JOIN b ON a.j = b.j
       |GROUP BY a.i, b.k
       |ORDER BY a.i, b.k""".stripMargin

  override val oracles: Map[String, String] = Map(
    "q16_matmul" -> genOracle,
    "q17_matmul_tables" ->
      """WITH a AS (SELECT CAST(p_partkey%48 AS INT) AS i,
        |                  CAST(p_partkey%29 AS INT) AS j,
        |                  CAST(p_size%10 AS INT) AS v FROM part),
        |     b AS (SELECT CAST(s_suppkey%29 AS INT) AS j,
        |                  CAST(s_suppkey%20 AS INT) AS k,
        |                  CAST(length(s_name)%10 AS INT) AS v FROM supplier)
        |SELECT a.i, b.k, CAST(sum(a.v*b.v) AS BIGINT) AS v
        |FROM a JOIN b ON a.j = b.j
        |GROUP BY a.i, b.k
        |ORDER BY a.i, b.k""".stripMargin,
    "q18_matmul_udaf" -> genOracle,
    "q64_matmul_blocked" -> genOracle,
    // The binary file holds the same seeded matrix the Generator
    // formula produces — the oracle replays the formula, so any decode
    // fault (endianness, off-by-one, sign) breaks the hash.
    "q93_binary_ingest" ->
      s"""SELECT i, j, v FROM (${Generator.cooMatrixSql(L, M, seed = 1)})
         |ORDER BY i, j""".stripMargin,
    "q19_mr_wordcount" ->
      """SELECT token, CAST(count(*) AS BIGINT) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |WHERE token <> ''
        |GROUP BY token
        |ORDER BY token""".stripMargin
  )
}
