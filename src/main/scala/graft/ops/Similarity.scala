package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`ARRAY<FLOAT>`):
  * brute-force cosine top-k as the exact baseline, hyperplane-LSH
  * bucketing as the approximate scale path (SURVEY.md §2.2 "similarity
  * search").
  *
  * All vector math is higher-order array expressions (zip_with +
  * aggregate) in double precision — codegen'd, no UDFs, and
  * bit-comparable to an oracle that follows the same cast-then-multiply
  * order.
  *
  * Scale shapes:
  *  - [[topK]] streams the candidate side once against a BROADCAST
  *    probe set (probes × candidates rows exist only inside the join
  *    stage, pruned to k per probe by the window). Right for "few
  *    probes vs huge corpus". For all-pairs workloads use [[lshBuckets]]
  *    so the join is bucket-equi, not cross.
  *  - [[lshBuckets]] buckets = sign pattern of `nPlanes` deterministic
  *    pseudo-random hyperplanes → candidates collide only within a
  *    bucket; recall/probe tradeoff is tested in LlmSpec, not assumed.
  */
object Similarity {

  /** Elementwise product sum in double: Σ aᵢ·bᵢ (cast before multiply —
    * float×float would round differently than the oracle's double math).
    *
    * Baseline formulation via higher-order array functions. Correct but
    * INTERPRETED (lambdas evaluate outside whole-stage codegen) — kept
    * as the reference semantics and for non-float element types.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Hot-path dot product: the native codegen'd
    * [[graft.functions.DotProduct]] expression (registered as
    * `graft_dot` by [[graft.functions.GraftExtensions]]) — a primitive
    * loop inside generated code, same double-accumulation semantics as
    * [[dotHof]] on equal-length float arrays.
    */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, defined as 0 when either vector has zero norm:
    * a bare division crashes with DIVIDE_BY_ZERO under Spark 4's ANSI
    * default, and NaN would rank FIRST in a descending top-k (Spark
    * orders NaN above every double) — 0 is the safe "no direction, no
    * similarity" semantics. CASE WHEN guards the division per row.
    */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2norm(a) * l2norm(b)
    when(denom === 0.0, lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** Exact cosine top-k: for each probe row, the `k` nearest candidate
    * rows (self-matches excluded). `probes` must be small (it is
    * broadcast); `candidates` can be arbitrarily large.
    */
  def topK(probes: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val p = probes.select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val c = candidates.select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("cand_id").asc)
    c.join(broadcast(p), col("cand_id") =!= col("probe_id"))
      .withColumn("cos", cosine(col("pv"), col("cv")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("probe_id", "rnk", "cand_id", "cos")
  }

  /** Deterministic pseudo-random hyperplane component: plane `p`,
    * dimension `d` → value in [-1, 1). Same arithmetic-formula trick as
    * [[graft.sources.Generator]] so planes are reproducible without a
    * stateful RNG.
    */
  private def planeComponent(p: Int, d: Int): Float =
    (((d.toLong * 1315423911L + p.toLong * 2654435761L + 97531L) % 10007L)
      .toDouble / 5003.5 - 1.0).toFloat

  /** Sign-pattern LSH bucket id over `nPlanes` hyperplanes, packed into
    * a LONG. Vectors in the same bucket agree on every plane side —
    * cosine-similar vectors collide with high probability.
    *
    * Planes are materialized driver-side and folded into ONE native
    * [[graft.functions.LshBucketBits]] expression (all nPlanes
    * projections in a single codegen'd loop). The earlier per-plane
    * `when(dot ≥ 0, …)` chain carried nPlanes separate plane literals
    * and expression nodes in the plan — fine at 4, a plan blow-up at
    * scale. `dim` must match the embedding length.
    */
  def lshBucket(emb: Column, nPlanes: Int, dim: Int): Column = {
    val planes = typedLit(Array.tabulate(nPlanes, dim)(planeComponent))
    call_function("graft_lsh_bucket", emb, planes)
  }

  /** IVF-style bucketed ANN: every vector is assigned to its nearest
    * of `nLists` coarse centroids (the "inverted file" cell), then
    * probes meet candidates only within their cell — an equi join on
    * the centroid id, like [[topKLsh]] but with data-derived buckets.
    *
    * Centroid selection is a deterministic coarse sample of the
    * candidate set (every |c|/nLists-th vector by id) — one bounded
    * `collect` of nLists vectors to the driver, embedded as plan
    * literals — optionally refined by `lloydIters` Lloyd (k-means)
    * iterations. Each iteration assigns every candidate to its nearest
    * centroid and recomputes centroids as cell means; the per-cell sums
    * use EXACT integer arithmetic (components quantized to 1e-4 via
    * `floor(x·10⁴ + 0.5)`, summed as BIGINT) so the result is
    * bit-deterministic under any partitioning / aggregation order —
    * float sums would differ run to run and engine to engine. The mean
    * is then rounded back to FLOAT, keeping centroid literals on the
    * codegen'd `graft_dot` path and the whole refinement replayable by
    * an exact SQL oracle. Empty cells keep their seed centroid. Each
    * iteration is one shuffle of (cell, dim) partial sums + one bounded
    * nLists×dim collect. Selection quality only affects recall, never
    * correctness of the within-cell exact cosine.
    *
    * NULL-embedding contract: `graft_best_cell` / `graft_top_cells` are
    * null-intolerant, so a row with a NULL `embedding` gets a NULL
    * cell, never matches the inner cell-equality join, and silently
    * appears in NO result — on either side. (The pre-round-6 literal
    * chain instead assigned such rows a concrete cell, so they could
    * surface as degenerate cos=0 matches.) Filter or impute NULL
    * embeddings upstream if they must participate.
    */
  /** Deterministic coarse seed centroids: the first `nLists` vectors
    * with ids ≡ 0 (mod stride), stride derived from one scalar
    * aggregate — never a full id collect (only the nLists centroid
    * VECTORS come to the driver, bounded). Sparse/offset id sets can
    * contain no multiple of stride — fall back to the first nLists
    * vectors by id (still deterministic and bounded) rather than
    * crashing with an empty centroid set. Empty corpus → empty array.
    */
  def seedCentroids(candidates0: DataFrame, nLists: Int): Array[(Long, Array[Float])] = {
    val candidates = candidates0.withColumn("vec_id", col("vec_id").cast("long"))
    val maxIdRow = candidates.agg(max(col("vec_id"))).collect()(0)
    if (maxIdRow.isNullAt(0)) return Array.empty
    val stride = math.max(1L, (maxIdRow.getLong(0) + 1) / nLists)
    val strided = candidates
      .filter(col("vec_id") % stride === 0)
      .select(col("vec_id"), col("embedding"))
      .orderBy("vec_id").limit(nLists)
      .collect()
    val rows =
      if (strided.nonEmpty) strided
      else candidates.select(col("vec_id"), col("embedding"))
        .orderBy("vec_id").limit(nLists).collect()
    rows.map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
  }

  /** cell = argmax cosine over the centroid matrix, as ONE native
    * expression (graft_best_cell — IvfCells.scala) holding the whole
    * matrix as constant data. The earlier greatest()-of-structs chain
    * embedded every centroid as its own plan literal: an
    * analyzer/codegen blow-up at the thousands of lists a 100 TB IVF
    * needs. Ties break toward the higher centroid id, same as the
    * old struct ordering (and the oracle's ORDER BY ccos DESC, cid
    * DESC replay).
    */
  def cellExpr(cents: Array[(Long, Array[Float])])(emb: Column): Column =
    call_function("graft_best_cell", emb,
      typedLit(cents.map(_._2)), typedLit(cents.map(_._1)))

  def topKIvf(probes0: DataFrame, candidates0: DataFrame, k: Int, nLists: Int,
              lloydIters: Int = 0, nProbe: Int = 1): DataFrame = {
    // Normalize ids to long up front so the operator is id-type
    // agnostic (int-typed vec_id would otherwise ClassCastException in
    // getLong and change the empty-corpus schema).
    val probes = probes0.withColumn("vec_id", col("vec_id").cast("long"))
    val candidates = candidates0.withColumn("vec_id", col("vec_id").cast("long"))
    var centroids = seedCentroids(candidates, nLists)
    if (centroids.isEmpty) {
      // Empty corpus → empty top-k with the contract schema.
      return candidates.sparkSession.emptyDataFrame
        .select(lit(0L).as("probe_id"), lit(0).as("rnk"),
          lit(0L).as("cand_id"), lit(0.0).as("cos"))
        .limit(0)
    }

    def cell(cents: Array[(Long, Array[Float])])(emb: Column): Column =
      cellExpr(cents)(emb)

    for (_ <- 0 until lloydIters) {
      val fixed = centroids // stable capture for the closure below
      val sums = candidates
        .select(cell(fixed)(col("embedding")).as("cell"),
          posexplode(col("embedding")))
        .select(col("cell"), col("pos").as("d"),
          // exact quantized contribution: floor(x·10⁴ + 0.5) as BIGINT
          // (floor(+0.5) = half-up, identical in Spark and DuckDB,
          // unlike round()'s engine-specific half-even/half-away)
          floor(col("col").cast("double") * 10000.0 + 0.5).cast("long").as("q"))
        .groupBy("cell", "d")
        .agg(sum("q").as("s"), count(lit(1)).as("n"))
        .collect() // bounded: ≤ nLists × dim rows
      val byCell = sums.groupBy(_.getLong(0))
      centroids = centroids.map { case (cid, seedVec) =>
        byCell.get(cid) match {
          case Some(cellRows) =>
            val arr = seedVec.clone()
            cellRows.foreach { r =>
              val d = r.getInt(1)
              // same op order as the oracle: (Σq / n) / 10⁴, then float
              arr(d) = ((r.getLong(2).toDouble / r.getLong(3)) / 10000.0).toFloat
            }
            (cid, arr)
          case None => (cid, seedVec) // empty cell keeps its seed
        }
      }
    }

    // Multi-probe: each probe searches its nProbe nearest cells (rank 1
    // = the best_cell assignment) — recall climbs at candidate cost
    // bounded by nProbe × cell size. Candidates keep their single cell
    // (each lives in exactly one inverted list), so probing distinct
    // cells never duplicates a (probe, candidate) pair.
    val p =
      if (nProbe <= 1)
        probes.select(col("vec_id").as("probe_id"), col("embedding").as("pv"),
          cell(centroids)(col("embedding")).as("cell"))
      else
        probes.select(col("vec_id").as("probe_id"), col("embedding").as("pv"),
          explode(call_function("graft_top_cells", col("embedding"),
            typedLit(centroids.map(_._2)), typedLit(centroids.map(_._1)),
            lit(nProbe))).as("cell"))
    val c = candidates.select(col("vec_id").as("cand_id"), col("embedding").as("cv"),
      cell(centroids)(col("embedding")).as("cell"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("cand_id").asc)
    c.join(p, Seq("cell"))
      .filter(col("cand_id") =!= col("probe_id"))
      .withColumn("cos", cosine(col("pv"), col("cv")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("probe_id", "rnk", "cand_id", "cos")
  }

  /** Inverted-list assignment for a PERSISTED IVF index: every
    * candidate row tagged with its coarse cell. This is the
    * build-once side of the index — materialize the result as a table
    * bucketed on `cell` (see `LlmQueries.ensureIvfIndex`) and repeated
    * ANN queries skip re-assignment entirely AND join co-located on
    * the cell without a candidate-side shuffle.
    *
    * NULL-embedding contract: same as [[topKIvf]] — NULL embedding →
    * NULL cell → excluded from every probe result.
    */
  def assignCells(candidates0: DataFrame, cents: Array[(Long, Array[Float])]): DataFrame = {
    val candidates = candidates0.withColumn("vec_id", col("vec_id").cast("long"))
    candidates.select(
      col("vec_id").as("cand_id"),
      col("embedding").as("cv"),
      cellExpr(cents)(col("embedding")).as("cell"))
  }

  /** Probe an already-materialized IVF index: `lists` is the
    * [[assignCells]] output (read back from its bucketed table),
    * `cents` the persisted centroids. Identical result contract (and
    * bit-identical output) to [[topKIvf]] with the same parameters —
    * the difference is purely physical: assignment cost was paid once
    * at build time, and the candidate side arrives pre-partitioned on
    * `cell`, so the probe join needs no exchange under it.
    */
  def topKIvfIndexed(probes0: DataFrame, lists: DataFrame,
                     cents: Array[(Long, Array[Float])], k: Int,
                     nProbe: Int = 1): DataFrame = {
    val probes = probes0.withColumn("vec_id", col("vec_id").cast("long"))
    val p =
      if (nProbe <= 1)
        probes.select(col("vec_id").as("probe_id"), col("embedding").as("pv"),
          cellExpr(cents)(col("embedding")).as("cell"))
      else
        probes.select(col("vec_id").as("probe_id"), col("embedding").as("pv"),
          explode(call_function("graft_top_cells", col("embedding"),
            typedLit(cents.map(_._2)), typedLit(cents.map(_._1)),
            lit(nProbe))).as("cell"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("cand_id").asc)
    lists.join(p, Seq("cell"))
      .filter(col("cand_id") =!= col("probe_id"))
      .withColumn("cos", cosine(col("pv"), col("cv")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("probe_id", "rnk", "cand_id", "cos")
  }

  /** Bucketed approximate top-k: candidates join probes on bucket
    * equality (an equi shuffle join — the 100 TB shape), then exact
    * cosine + window prune within buckets.
    *
    * NULL-embedding contract: same as [[topKIvf]] — a NULL embedding
    * yields a NULL `graft_lsh_bucket`, never joins, and is silently
    * excluded from results on both sides.
    */
  def topKLsh(probes: DataFrame, candidates: DataFrame, k: Int, nPlanes: Int,
              dim: Int = 64): DataFrame = {
    val p = probes.select(col("vec_id").as("probe_id"), col("embedding").as("pv"),
      lshBucket(col("embedding"), nPlanes, dim).as("bucket"))
    val c = candidates.select(col("vec_id").as("cand_id"), col("embedding").as("cv"),
      lshBucket(col("embedding"), nPlanes, dim).as("bucket"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("cand_id").asc)
    c.join(p, Seq("bucket"))
      .filter(col("cand_id") =!= col("probe_id"))
      .withColumn("cos", cosine(col("pv"), col("cv")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("probe_id", "rnk", "cand_id", "cos")
  }
}
