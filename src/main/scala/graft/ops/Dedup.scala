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
    */
  def minHashSignature(shinglesCol: Column, numHashes: Int): Column = {
    val base = transform(shinglesCol, s => pmod(xxhash64(s), lit(P)))
    transform(sequence(lit(0), lit(numHashes - 1)), i =>
      coalesce(
        array_min(transform(base, h =>
          pmod(h * pmod(i * 2L + 1315423911L, lit(P)) + (i * 7919L + 104729L), lit(P)))),
        lit(P)))
  }

  /** (id, band, bucket) rows: the LSH index. `rows` signature values
    * per band, hashed to one bucket id.
    */
  def lshBands(df: DataFrame, idCol: String, sigCol: String,
               bands: Int, rows: Int): DataFrame =
    df.select(col(idCol), posexplode(
        transform(sequence(lit(0), lit(bands - 1)), b =>
          xxhash64(concat_ws(",", slice(col(sigCol), b * rows + 1, lit(rows))), b)))
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

  /** Exact Jaccard similarity of two shingle-array columns (distinct
    * semantics, as for set Jaccard).
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0, 0.0).otherwise(inter / union)
  }

  /** 64-bit SimHash over a token array: bit `b` is set when the sum of
    * ±1 contributions (sign of token-hash bit `b`) is positive. Pure
    * column fold — one narrow pass, 64 × |tokens| bit ops per doc.
    */
  def simHash(toks: Column): Column = {
    val hashes = transform(toks, t => xxhash64(t))
    (0 until 64).map { b =>
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + shiftright(h, b).bitwiseAND(1L) * 2L - 1L)
      when(votes > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
