package graft

import org.apache.spark.sql.functions._
import graft.sources.TxTable

/** Commit-log contract of the minimal transactional table format
  * (sources/TxTable): snapshot isolation, time travel, and — the scale
  * property — range-pruned copy-on-write MERGE. The q328 oracle checks
  * the logical results; these pin the PHYSICAL protocol the oracle
  * can't see.
  */
class TxTableSpec extends SparkSpec {

  private def freshTable(name: String): String = {
    import spark.implicits._
    val root = graft.sources.Staging.dir(sfDir, name)
    val base = spark.range(0, 800)
      .select(col("id").as("k"), lit("A").as("st"), (col("id") * 10).as("c"))
    TxTable.create(base, root, nBuckets = 8)
    root
  }

  test("merge rewrites only the files whose key range overlaps the delta") {
    import spark.implicits._
    val root = freshTable("txspec_prune")
    assert(TxTable.liveFiles(spark, root).size === 8)
    // Delta confined to keys 0..49 — inside bucket 0's [0,99] range.
    val delta = Seq((5L, "X", 1L), (49L, "X", 2L)).toDF("k", "st", "c")
    val (rewritten, carried) = TxTable.merge(spark, root, delta)
    assert(rewritten === 1, "only bucket 0 overlaps the delta envelope")
    assert(carried === 7, "the 7 non-overlapping files must carry over")
    // Carried files are still live at v2 — same paths, no rewrite.
    val v1Files = TxTable.liveFiles(spark, root, 1).map(_.file).toSet
    val v2Files = TxTable.liveFiles(spark, root, 2).map(_.file).toSet
    assert((v1Files & v2Files).size === 7)
    // Upsert semantics: delta wins, everything else unchanged.
    val v2 = TxTable.snapshot(spark, root, 2)
    assert(v2.count() === 800)
    assert(v2.filter(col("st") === "X").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toSet === Set(5L -> 1L, 49L -> 2L))
  }

  test("time travel: an old snapshot is immutable across later merges") {
    import spark.implicits._
    val root = freshTable("txspec_tt")
    val before = TxTable.snapshot(spark, root, 1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    TxTable.merge(spark, root,
      Seq((1L, "X", 0L), (900L, "N", 42L)).toDF("k", "st", "c"))
    assert(TxTable.latestVersion(spark, root) === 2)
    val v1After = TxTable.snapshot(spark, root, 1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(v1After === before, "v1 must replay identically after the merge")
    // The out-of-range key (900 > every file max) still inserts.
    val v2 = TxTable.snapshot(spark, root)
    assert(v2.count() === 801)
    assert(v2.filter(col("k") === 900L).count() === 1)
  }

  test("chained merges: each version reads its own cumulative state") {
    import spark.implicits._
    val root = freshTable("txspec_chain")
    TxTable.merge(spark, root, Seq((10L, "X", 1L)).toDF("k", "st", "c"))
    TxTable.merge(spark, root, Seq((10L, "Y", 2L), (20L, "X", 3L)).toDF("k", "st", "c"))
    assert(TxTable.latestVersion(spark, root) === 3)
    def stOf(v: Int, k: Long) = TxTable.snapshot(spark, root, v)
      .filter(col("k") === k).collect()(0).getString(1)
    assert(stOf(1, 10L) === "A" && stOf(2, 10L) === "X" && stOf(3, 10L) === "Y")
    assert(stOf(2, 20L) === "A" && stOf(3, 20L) === "X")
  }
}
