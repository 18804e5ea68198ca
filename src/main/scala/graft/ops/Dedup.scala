package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication family for the training-data pipeline (SURVEY.md §2.2
  * "LLM-data-pipeline extensions"): exact (hash-groupBy), MinHash+LSH
  * banded near-dup, SimHash — all as declarative plans.
  *
  * Scale shapes (the point of each design):
  *  - exact dedup: shuffle on a 128-bit content hash, pick min id per
  *    group — one shuffle, no text comparison, no skew beyond true dup
  *    groups;
  *  - MinHash LSH: NEVER all-pairs. Docs → signatures (narrow) → band
  *    buckets (explode ×bands) → self-join on (band, bucket) — the
  *    shuffle key is the bucket, so candidate volume is Σ bucket².
  *    A pathological mega-bucket is the skew risk; AQE skew-join
  *    handles it, and the band hash width keeps buckets small;
  *  - SimHash: one 64-bit signature per doc, near-dups = small hamming
  *    distance; signature build is a per-row fold over tokens (narrow).
  */
object Dedup {

  // Mersenne prime 2^31-1: operands stay < 2^31 after pre-reduction, so
  // the affine map's product < 2^62 never overflows a LONG under ANSI
  // arithmetic (Spark 4 default).
  private val P = 2147483647L

  /** Exact-dup groups keyed by content hash: (key, keeper = min id,
    * n_copies). Downstream `dedup` = semi-join keeper ids back.
    */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_key"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** MinHash signature: array of `numHashes` minima over the shingle
    * set's hashes, permutation `i` being the affine map
    * `h → (h·aᵢ + bᵢ) mod P` over the field Z_P (odd multiplier,
    * deterministic constants — no stateful RNG). Empty shingle sets get
    * P (an impossible min) so they never collide with real content.
    *
    * Written as ONE fold over the shingles with a `numHashes`-wide
    * accumulator — not `numHashes` independent array_min passes. The
    * naive per-permutation form inlines (and re-evaluates) the whole
    * shingle/tokenize subtree once per permutation; higher-order
    * functions run interpreted (no codegen), so that redundancy
    * multiplied a full regex tokenize ×64 per row and serialized a
    * bench stage into minutes. One pass = the shingle array and its
    * hashes are computed once per row.
    */
  def minHashSignature(shinglesCol: Column, numHashes: Int): Column =
    call_function("minhash_sig", shinglesCol, lit(numHashes))

  /** Reference semantics of [[minHashSignature]] as a declarative fold —
    * kept for the parity test (DedupSpec asserts the native expression
    * produces identical signatures) and as documentation of the math.
    * Interpreted per (shingle × permutation); the native form is the
    * hot path.
    */
  def minHashSignatureHof(shinglesCol: Column, numHashes: Int): Column = {
    val perms = sequence(lit(0), lit(numHashes - 1))
    aggregate(
      transform(shinglesCol, s => pmod(xxhash64(s), lit(P))),
      array_repeat(lit(P), numHashes),
      (acc, h) => zip_with(acc, perms, (m, i) =>
        least(m, pmod(h * pmod(i * 2L + 1315423911L, lit(P)) + (i * 7919L + 104729L), lit(P)))))
  }

  /** (id, band, bucket) rows: the LSH index. `rows` signature values
    * per band, hashed to one bucket id.
    *
    * The signature column is [[Text.letBound]] so it evaluates ONCE per
    * row: referencing `col(sigCol)` inside the per-band lambda would
    * inline the signature expression `bands` times after projection
    * collapse (see [[minHashSignature]] for why that redundancy is
    * catastrophic in interpreted higher-order exprs).
    */
  def lshBands(df: DataFrame, idCol: String, sigCol: String,
               bands: Int, rows: Int): DataFrame =
    df.select(col(idCol), posexplode(
        Text.letBound(col(sigCol)) { s =>
          transform(sequence(lit(0), lit(bands - 1)), b =>
            xxhash64(concat_ws(",", slice(s, b * rows + 1, lit(rows))), b))
        })
      ).toDF(idCol, "band", "bucket")

  /** Candidate near-dup pairs: self-join of the LSH index on
    * (band, bucket), deduped across bands. Pair volume is bounded by
    * bucket sizes, never |docs|².
    */
  def candidatePairs(index: DataFrame, idCol: String): DataFrame = {
    val l = index.select(col("band"), col("bucket"), col(idCol).as("id_a"))
    val r = index.select(col("band"), col("bucket"), col(idCol).as("id_b"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Candidate pairs ACROSS two banded indexes (incoming batch ⋈
    * existing corpus) — the incremental-ingest shape: the
    * already-deduped corpus is never self-joined, so candidate volume
    * is bounded by buckets SHARED between the delta and the corpus
    * (an equi join on (band, bucket)), never |corpus|² and never even
    * |corpus| × |batch|.
    */
  def crossCandidates(batchIdx: DataFrame, corpusIdx: DataFrame,
                      idCol: String): DataFrame = {
    val b = batchIdx.select(col("band"), col("bucket"), col(idCol).as("b_id"))
    val c = corpusIdx.select(col("band"), col("bucket"), col(idCol).as("c_id"))
    b.join(c, Seq("band", "bucket")).select("b_id", "c_id").distinct()
  }

  /** Exact Jaccard similarity of two shingle-array columns (distinct
    * semantics, as for set Jaccard).
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0, 0.0).otherwise(inter / union)
  }

  /** 64-bit SimHash over a token array: bit `b` is set when the sum of
    * ±1 contributions (sign of token-hash bit `b`) is positive.
    * Native tight-loop expression ([[graft.functions.SimHash64]]); the
    * HOF reference fold below is kept for the parity test.
    */
  def simHash(toks: Column): Column = call_function("simhash64", toks)

  /** Reference semantics of [[simHash]] as a declarative fold — ONE
    * fold over the tokens with a 64-wide vote accumulator, then one
    * pack pass. Interpreted per (token × bit); kept for the parity
    * test (LlmSpec asserts the native expression matches) and as
    * documentation of the math.
    */
  def simHashHof(toks: Column): Column = {
    val bits = sequence(lit(0), lit(63))
    val votes = aggregate(
      transform(toks, t => xxhash64(t)),
      array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc, bits, (a, b) =>
        a + call_function("shiftright", h, b.cast("int")).bitwiseAND(1L) * 2L - 1L))
    aggregate(
      zip_with(votes, bits, (v, b) =>
        when(v > 0, call_function("shiftleft", lit(1L), b.cast("int"))).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Connected components over an undirected similarity graph by
    * iterative min-label propagation — the cluster-level dedup step
    * between pairwise near-dup detection and "keep one per duplicate
    * CLUSTER" (remove-any-higher-pair-id, as q94/q105 do, can keep two
    * docs that are both similar to a third but not to each other; the
    * component minimum cannot).
    *
    * `vertices`: one `id` column. `edges`: (`src`, `dst`) pairs, either
    * orientation (symmetrized here). Returns (`id`, `lbl`) with `lbl` =
    * the minimum id reachable from `id` — the canonical component
    * representative.
    *
    * Scale shape: each iteration is one equi-join of edges against
    * current labels + one min-aggregate (both partial-aggregated,
    * shuffled on vertex id) — no task ever holds more than a hash
    * partition. Labels only decrease, so convergence (no label
    * changed) is a monotone fixpoint; each round combines the
    * neighbor-min step with a POINTER JUMP (lbl ← min(lbl, lbl(lbl))),
    * so convergence takes O(log diameter) rounds, not O(diameter) —
    * the property that lets q320's percolated spatial cluster
    * (diameter ≈ 40) close in 8 rounds and a web-corpus component
    * close in ~30. The driver loop checks convergence with one
    * `isEmpty` action per round (bounded by `maxIters` as a runaway
    * guard).
    *
    * Each round is cut with an EAGER `localCheckpoint`, not
    * `persist()`: the new labels reference the old twice (join +
    * convergence check), so an unbroken lineage doubles the logical
    * plan per iteration — exponential analysis cost by iteration 20 —
    * and a persisted frame additionally pins cache-manager entries the
    * caller never sees to unpersist. Checkpointing truncates plan and
    * lineage to a materialized LogicalRDD whose blocks the context
    * cleaner frees once the frame is unreferenced.
    */
  def connectedComponents(
      vertices: DataFrame,
      edges: DataFrame,
      maxIters: Int = 20): DataFrame = {
    // Materialize the symmetrized edge list ONCE: it is re-joined every
    // propagation round, and without this the entire upstream
    // candidate-generation pipeline (LSH bucket self-join + verify in
    // q107's case) re-executes per iteration. Post-dedup-filter edge
    // lists are small next to the corpus, so this is the standard
    // iterate-over-materialized-edges shape at any scale.
    val sym = edges.select("src", "dst")
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    var labels = vertices.select(col("id"), col("id").as("lbl")).localCheckpoint()
    var done = false
    var i = 0
    while (!done && i < maxIters) {
      val nbrMin = sym
        .join(labels.select(col("id").as("src"), col("lbl").as("slbl")), "src")
        .groupBy(col("dst").as("id")).agg(min("slbl").as("nlbl"))
      val prop = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("lbl").as("old"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("l1"))
      // POINTER JUMP (hash-min + shortcutting): after the neighbor-min
      // step, follow the label one hop — lbl ← min(lbl, lbl(lbl)).
      // Labels only ever hold vertex ids of the same component, so the
      // shortcut is sound, and it halves the remaining label-tree
      // depth per round: convergence in O(log diameter) rounds instead
      // of O(diameter) — plain hash-min needed ~40 rounds on q320's
      // percolated spatial cluster (graph diameter ≈ plane/ε), the
      // jump closes it in 8. ADAPTIVE: the first two rounds skip the
      // jump — a near-dup similarity graph (q107 class, diameter ≤ 2)
      // converges before it could help, and the skipped self-join is
      // one fewer shuffle stage per round on that fast path.
      val next = (if (i < 2) {
        prop.select(col("id"), col("l1").as("lbl"),
          (col("l1") < col("old")).as("changed"))
      } else {
        val jump = prop.select(col("id").as("pid"), col("l1").as("plbl"))
        prop.join(jump, col("l1") === col("pid"), "left")
          .select(col("id"),
            least(col("l1"), coalesce(col("plbl"), col("l1"))).as("lbl"),
            (least(col("l1"), coalesce(col("plbl"), col("l1"))) < col("old"))
              .as("changed"))
      }).localCheckpoint()
      // Labels are monotonically non-increasing: any strict decrease
      // means another round is needed. The flag rides along in the
      // checkpointed iterate, so convergence is a cached-partition scan
      // — not a second join of the old and new label tables.
      done = next.filter(col("changed")).isEmpty
      // PERIODIC STATS RESET (ops/Iterate rule 2; the full argument —
      // compounding sizeInBytes BigInts grinding the planner by ~round
      // 10, observed on q320's 8-round spatial graph — lives on
      // [[Iterate]]). Every THIRD round, not every round: intermediate
      // digit counts stay in the thousands while the fast
      // small-diameter path (q107-class graphs converge before the
      // first reset fires) skips the per-round Row-conversion tax.
      val cut = next.select("id", "lbl")
      labels = if (i % 3 == 2) Iterate.statsReset(cut) else cut
      i += 1
    }
    labels
  }
}
