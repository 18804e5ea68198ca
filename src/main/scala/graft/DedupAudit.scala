package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.{Dedup, Similarity, Text}
import graft.sources.Tables

/** Dedup-family candidate-volume audit (round-11 verdict #8): for each
  * bucketed near-dup query, measure the candidate pairs its blocking
  * scheme actually GENERATES against the brute-force pairs POSSIBLE,
  * so the "bucketed, not all-pairs" claim carries a measured ratio
  * instead of an asserted plan shape.
  *
  * Each block below replicates the candidate construction of its query
  * verbatim (same fixtures, same ops calls — cited per block) and
  * counts (a) the corpus/batch populations, (b) the blocked candidate
  * pairs, (c) the verified (threshold-passing) pairs. Output: one line
  * per query to stdout, consumed into SCALE_HEADROOM.md.
  *
  * Usage: `runMain graft.DedupAudit <sfDir>`
  */
object DedupAudit {

  def main(args: Array[String]): Unit = {
    val Array(dir) = args
    val spark = Engine.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)

    def shingled(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
      array_distinct(Text.shingles(Text.tokens(col("text")), 3)).as("sh"))
    def banded(sh: org.apache.spark.sql.DataFrame) = Dedup.lshBands(
      sh.withColumn("sig", Dedup.minHashSignature(col("sh"), numHashes = 64)),
      "doc_id", "sig", bands = 16, rows = 4)
    def report(q: String, nA: Long, nB: Long, cand: Long, verified: Long): Unit = {
      val possible = if (nB == 0) nA * (nA - 1) / 2 else nA * nB
      println(f"AUDIT $q%s n=${nA + nB}%d pairs_possible=$possible%d " +
        f"pairs_candidate=$cand%d pairs_verified=$verified%d " +
        f"ratio=${cand.toDouble / possible}%.4f")
    }

    // q94 (LlmQueries.scala "q94_neardup_dedup"): MinHash 16x4 LSH
    // self-join candidates, Jaccard >= 0.8 verify.
    locally {
      val base = Tables.documents(spark, dir)
        .filter(col("doc_id") < 200).select("doc_id", "text")
      val toks = Text.tokens(col("text"))
      val perturbed = base.select((col("doc_id") + 100000).as("doc_id"),
        array_join(slice(toks, lit(2), greatest(size(toks) - 1, lit(0))), " ").as("text"))
      val sh = shingled(base.unionAll(perturbed)).localCheckpoint()
      val cand = Dedup.candidatePairs(banded(sh), "doc_id").localCheckpoint()
      val verified = cand
        .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
        .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
        .filter(Dedup.jaccard(col("sh_a"), col("sh_b")) >= 0.8)
      report("q94_neardup_dedup", sh.count(), 0, cand.count(), verified.count())
    }

    // q105 (LlmQueries.scala "q105_embed_dedup"): 16-plane hyperplane-
    // LSH bucket self-join, cosine > 0.9 verify.
    locally {
      val base = Tables.embeddings(spark, dir)
        .filter(col("vec_id") < 500).select("vec_id", "embedding")
      val copies = base
        .withColumn("f",
          when(pmod(col("vec_id"), lit(2)) === 0, lit(2.0f)).otherwise(lit(-2.0f)))
        .select((col("vec_id") + 100000).as("vec_id"),
          transform(col("embedding"), x => x * col("f")).as("embedding"))
      val indexed = base.unionAll(copies).withColumn(
        "bucket", Similarity.lshBucket(col("embedding"), nPlanes = 16, dim = 64))
        .localCheckpoint()
      val a = indexed.select(col("vec_id").as("id_a"), col("embedding").as("va"),
        col("bucket"))
      val b = indexed.select(col("vec_id").as("id_b"), col("embedding").as("vb"),
        col("bucket"))
      val cand = a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
        .localCheckpoint()
      val verified = cand.filter(Similarity.cosine(col("va"), col("vb")) > 0.9)
      report("q105_embed_dedup", indexed.count(), 0, cand.count(), verified.count())
    }

    // q115 (LlmQueries.scala "q115_delta_dedup"): batch x corpus CROSS
    // candidates on shared (band, bucket) — never batch x corpus rows.
    locally {
      val docs = Tables.documents(spark, dir)
      val corpus = docs.filter(col("doc_id") < 200).select("doc_id", "text")
      val toks = Text.tokens(col("text"))
      val fresh = docs.filter(col("doc_id") >= 200 && col("doc_id") < 250)
        .select("doc_id", "text")
      val dups = corpus.filter(col("doc_id") < 30).select(
        (col("doc_id") + 200000).as("doc_id"),
        array_join(slice(toks, lit(2), greatest(size(toks) - 1, lit(0))), " ").as("text"))
      val shC = shingled(corpus).localCheckpoint()
      val shB = shingled(fresh.unionAll(dups)).localCheckpoint()
      val cand = Dedup.crossCandidates(banded(shB), banded(shC), "doc_id")
        .localCheckpoint()
      val verified = cand
        .join(shB.select(col("doc_id").as("b_id"), col("sh").as("sh_b")), "b_id")
        .join(shC.select(col("doc_id").as("c_id"), col("sh").as("sh_c")), "c_id")
        .filter(Dedup.jaccard(col("sh_b"), col("sh_c")) >= 0.8)
      report("q115_delta_dedup", shB.count(), shC.count(), cand.count(),
        verified.count())
    }

    // q121 (LlmQueries.scala "q121_cluster_best_keeper"): same LSH
    // candidates as q94 over the 3-copy corpus; verified pairs are the
    // component edges.
    locally {
      val base = Tables.documents(spark, dir)
        .filter(col("doc_id") < 200).select("doc_id", "text")
      val toks = Text.tokens(col("text"))
      def dropK(k: Int, shift: Long) = base.filter(col("doc_id") < 50).select(
        (col("doc_id") + shift).as("doc_id"),
        array_join(slice(toks, lit(k + 1), greatest(size(toks) - k, lit(0))), " ")
          .as("text"))
      val sh = shingled(base.unionAll(dropK(1, 100000L)).unionAll(dropK(2, 200000L)))
        .localCheckpoint()
      val cand = Dedup.candidatePairs(banded(sh), "doc_id").localCheckpoint()
      val verified = cand
        .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
        .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
        .filter(Dedup.jaccard(col("sh_a"), col("sh_b")) >= 0.8)
      report("q121_cluster_best_keeper", sh.count(), 0, cand.count(),
        verified.count())
    }

    // q149 (MiningQueries.scala "q149_prefix_setjoin"): prefix-filter
    // candidates (rarest-token prefixes sharing a gram), Jaccard >= 0.8.
    locally {
      val base = Tables.documents(spark, dir)
        .filter(col("doc_id") < 200).select("doc_id", "text")
      val toksC = Text.tokens(col("text"))
      val perturbed = base.select((col("doc_id") + 100000).as("doc_id"),
        array_join(slice(toksC, lit(2), greatest(size(toksC) - 1, lit(0))), " ")
          .as("text"))
      val sh = shingled(base.unionAll(perturbed)).localCheckpoint()
      val flat = sh.select(col("doc_id"), size(col("sh")).as("sz"),
        explode(col("sh")).as("g"))
      val dfreq = flat.groupBy("g").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy("doc_id").orderBy("df", "g")
      val prefix = flat.join(dfreq, "g")
        .withColumn("pos", row_number().over(w))
        .filter(col("pos") <= col("sz") - expr("(sz * 8 + 9) div 10") + lit(1))
        .select(col("doc_id"), col("g"))
      val cand = prefix.as("a").join(prefix.as("b"),
          col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .distinct().localCheckpoint()
      val verified = cand
        .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
        .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
        .filter(Dedup.jaccard(col("sh_a"), col("sh_b")) >= 0.8)
      report("q149_prefix_setjoin", sh.count(), 0, cand.count(), verified.count())
    }

    spark.stop()
  }
}
