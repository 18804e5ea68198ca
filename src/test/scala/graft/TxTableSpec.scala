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

  test("restore: metadata-only rollback, idempotent, schema narrows back, forward writes work") {
    import spark.implicits._
    val root = freshTable("txspec_restore")
    val v1 = TxTable.snapshot(spark, root, 1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    TxTable.merge(spark, root, Seq((5L, "X", 1L)).toDF("k", "st", "c")) // v2
    // Widening append: restore must narrow the schema back.
    TxTable.appendBatch(spark, root, "res", 1L,
      Seq((9000L, "W", 2L, "extra")).toDF("k", "st", "c", "tag")) // v3
    assert(TxTable.tableMeta(spark, root).schema.fieldNames.contains("tag"))
    def dataDirs() = {
      val dd = java.nio.file.Paths.get(s"$root/data")
      val st = java.nio.file.Files.walk(dd)
      try { import scala.jdk.CollectionConverters._
        st.iterator().asScala.count(p =>
          p.toString.endsWith(".parquet") || p.toString.endsWith(".snappy.parquet"))
      } finally st.close()
    }
    val filesBefore = dataDirs()
    val (reAdded, removed) = TxTable.restore(spark, root, 1) // v4
    assert(reAdded > 0 && removed > 0)
    // METADATA-ONLY: the restore wrote no data file.
    assert(dataDirs() === filesBefore, "restore must not write data files")
    // Logical state = v1 exactly; schema narrowed back.
    val restored = TxTable.snapshot(spark, root)
    assert(restored.columns.toSeq === Seq("k", "st", "c"))
    assert(restored.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet === v1)
    // The intermediates still time-travel (append-only log).
    assert(TxTable.snapshot(spark, root, 2)
      .filter(col("k") === 5L).collect()(0).getString(1) === "X")
    // Idempotent: restoring to the current state is a no-op.
    assert(TxTable.restore(spark, root, 4) === ((0, 0)))
    // Forward writes keep working after the rollback.
    TxTable.appendBatch(spark, root, "res", 2L,
      Seq((9001L, "F", 3L)).toDF("k", "st", "c"))
    assert(TxTable.snapshot(spark, root).count() === v1.size + 1)
  }

  test("deleteMor: vectors compose, COW materializes, optimize purges, " +
       "vacuum keeps live vectors, connector serves MOR") {
    import spark.implicits._
    val root = freshTable("txspec_mor") // 8 buckets of 100 keys
    val files1 = TxTable.liveFiles(spark, root).map(_.file).toSet
    // MOR delete: no data file changes, rows logically gone.
    val (nf1, nd1) = TxTable.deleteMor(spark, root,
      Seq(0L, 1L, 2L).toDF("k"))
    assert(nf1 === 1 && nd1 === 3L)
    assert(TxTable.liveFiles(spark, root).map(_.file).toSet === files1,
      "merge-on-read must not rewrite data files")
    assert(TxTable.snapshot(spark, root).count() === 797)
    // Second delete on the same file SUPERSEDES with the union (plus a
    // second bucket); deleting an already-deleted key adds nothing.
    val (nf2, nd2) = TxTable.deleteMor(spark, root,
      Seq(2L, 3L, 150L).toDF("k"))
    assert(nf2 === 2 && nd2 === 2L, s"got ($nf2, $nd2)")
    val dvs = TxTable.liveDvs(spark, root)
    assert(dvs.size === 2 && dvs.values.map(_.n).toSeq.sorted === Seq(1L, 4L))
    assert(TxTable.snapshot(spark, root).count() === 795)
    // Time travel sees the vector state AT that version.
    assert(TxTable.snapshot(spark, root, 2).count() === 797)
    assert(TxTable.snapshot(spark, root, 1).count() === 800)
    // A COW delete touching bucket 0 materializes ITS vector (rows
    // 0-3 stay dead) and leaves bucket 1's vector live.
    TxTable.delete(spark, root, Seq(4L).toDF("k"))
    assert(TxTable.snapshot(spark, root).count() === 794)
    assert(TxTable.liveDvs(spark, root).size === 1)
    assert(TxTable.snapshot(spark, root).filter(col("k") <= 4L).count() === 0,
      "COW rewrite must not resurrect MOR-deleted rows")
    // A merge re-inserting a MOR-deleted key wins (upsert semantics)
    // and materializes that bucket's vector.
    TxTable.merge(spark, root, Seq((150L, "Z", 9L)).toDF("k", "st", "c"))
    val r150 = TxTable.snapshot(spark, root).filter(col("k") === 150L).collect()
    assert(r150.length === 1 && r150(0).getString(1) === "Z")
    assert(TxTable.liveDvs(spark, root).isEmpty)
    // Vacuum keeps a LIVE vector (and its table keeps filtering).
    TxTable.deleteMor(spark, root, Seq(200L).toDF("k"))
    TxTable.vacuum(spark, root, retainVersions = 1)
    val dv200 = TxTable.liveDvs(spark, root)
    assert(dv200.size === 1 &&
      java.nio.file.Files.exists(
        java.nio.file.Paths.get(dv200.values.head.path)),
      "vacuum deleted a live deletion vector")
    assert(TxTable.snapshot(spark, root).filter(col("k") === 200L).count() === 0)
    // The connector IMPLEMENTS the deletion-vector reader feature
    // (round-16 upgrade — it used to refuse): the vectored table
    // serves through the raw reader minus exactly the deleted keys.
    val connMor = spark.read.format("graft-txtable").option("root", root).load()
    assert(connMor.count() === 794,
      "the connector must subtract live deletion vectors")
    assert(connMor.filter(col("k") === 200L).count() === 0,
      "a MOR-deleted key must not resurrect through the connector")
    // OPTIMIZE still repays the debt: vectors purged, same rows.
    val (rm, prod) = TxTable.optimize(spark, root, targetRows = 1000000L)
    assert(rm > 0 && prod > 0)
    assert(TxTable.liveDvs(spark, root).isEmpty)
    val conn = spark.read.format("graft-txtable").option("root", root).load()
    assert(conn.count() === 794)
    assert(conn.filter(col("k") === 200L).count() === 0)
    // The change feed saw the MOR delete as delete pre-images (v5→v6
    // was the deleteMor of key 200).
    val morWindow = TxTable.changeFeed(spark, root, 5, 6).collect()
    assert(morWindow.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("delete", 200L)))
  }

  test("CHECK constraints: every write path enforced, add scans existing data, " +
       "drop lifts; timestampAsOf resolves against recorded commit times") {
    import spark.implicits._
    val root = graft.sources.Staging.dir(sfDir, "txspec_constraints")
    val base = spark.range(0, 100)
      .select(col("id").as("k"), lit("A").as("st"), (col("id") * 10).as("c"))
    // create validates the initial data too.
    intercept[IllegalArgumentException] {
      TxTable.create(base, root, nBuckets = 4,
        constraints = Map("c_neg" -> "c < 0"))
    }
    TxTable.create(base, root, nBuckets = 4,
      constraints = Map("c_nonneg" -> "c >= 0"))
    // A violating append is REJECTED and commits nothing.
    val e = intercept[IllegalArgumentException] {
      TxTable.appendBatch(spark, root, "cns", 1L,
        Seq((500L, "B", -5L)).toDF("k", "st", "c"))
    }
    assert(e.getMessage.contains("c_nonneg"))
    assert(TxTable.latestVersion(spark, root) === 1,
      "a rejected write must not commit")
    TxTable.appendBatch(spark, root, "cns", 2L,
      Seq((500L, "B", 5L)).toDF("k", "st", "c"))
    assert(TxTable.snapshot(spark, root).count() === 101)
    // mergeInto: constraints bind the rows that LAND; a delete-flagged
    // row (which never materializes) is exempt.
    intercept[IllegalArgumentException] {
      TxTable.mergeInto(spark, root,
        Seq((1L, "U", -1L)).toDF("k", "st", "c"), deleteWhen = lit(false))
    }
    TxTable.mergeInto(spark, root,
      Seq((1L, "D", -1L)).toDF("k", "st", "c"),
      deleteWhen = col("st") === "D")
    assert(TxTable.snapshot(spark, root).count() === 100)
    // ADD CONSTRAINT scans the existing data first (Delta semantics).
    intercept[IllegalArgumentException] {
      TxTable.addConstraint(spark, root, "c_small", "c < 100")
    }
    TxTable.addConstraint(spark, root, "c_cap", "c < 10000")
    intercept[IllegalArgumentException] {
      TxTable.appendBatch(spark, root, "cns", 3L,
        Seq((600L, "B", 20000L)).toDF("k", "st", "c"))
    }
    TxTable.dropConstraint(spark, root, "c_cap")
    TxTable.appendBatch(spark, root, "cns", 3L,
      Seq((600L, "B", 20000L)).toDF("k", "st", "c"))
    assert(TxTable.snapshot(spark, root).count() === 101)
    // Constraints round-trip the log (and would survive restore).
    assert(TxTable.tableMeta(spark, root).constraints ===
      Map("c_nonneg" -> "c >= 0"))
    // timestampAsOf: resolve against the log's own recorded times.
    val cs = TxTable.commits(spark, root)
    assert(cs.forall(_.ts > 0), "every commit must record its wall-clock")
    val last = cs.last
    assert(TxTable.versionAt(spark, root, last.ts) === last.version)
    assert(TxTable.snapshotAsOf(spark, root, last.ts).count() === 101)
    intercept[IllegalArgumentException] {
      TxTable.versionAt(spark, root, cs.head.ts - 1000)
    }
  }

  test("constraint/append race: a declared constraint and a violating row never coexist") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // Race a violating append against ADD CONSTRAINT. Whatever the
    // interleaving, the OCC total order + in-loop re-validation must
    // leave the table in one of exactly two consistent states:
    //  - append won: the violating row exists, addConstraint's
    //    existing-data scan rejected the constraint;
    //  - constraint won: the constraint is declared, the append's
    //    retry re-read the new meta and rejected the batch.
    // Both-succeed (a declared constraint coexisting with a violating
    // row) is the serializability hole this pins shut.
    for (round <- 1 to 3) {
      val root = graft.sources.Staging.dir(sfDir, s"txspec_cns_race$round")
      val base = spark.range(0, 200)
        .select(col("id").as("k"), lit("A").as("st"), (col("id") * 10).as("c"))
      TxTable.create(base, root, nBuckets = 4)
      val appendF = Future {
        try {
          TxTable.appendBatch(spark, root, "race", 1L,
            Seq((900L, "B", -5L)).toDF("k", "st", "c")); true
        } catch { case _: IllegalArgumentException => false }
      }
      val added =
        try { TxTable.addConstraint(spark, root, "c_nonneg", "c >= 0"); true }
        catch { case _: IllegalArgumentException => false }
      val appended = Await.result(appendF, 120.seconds)
      assert(added || appended, "at least one racer must win")
      val hasConstraint =
        TxTable.tableMeta(spark, root).constraints.contains("c_nonneg")
      val nViolating =
        TxTable.snapshot(spark, root).filter(col("c") < 0).count()
      assert(!(hasConstraint && nViolating > 0),
        s"round $round: constraint declared AND violating row present")
      assert(hasConstraint === added && (nViolating > 0) === appended,
        s"round $round: reported outcomes must match table state")
    }
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

  test("two-distant-bucket delta: middle buckets survive untouched, " +
       "merge output stays per-bucket") {
    import spark.implicits._
    val root = freshTable("txspec_distant")
    // Keys 5 and 750 live in buckets 0 [0,99] and 7 [700,799]. Exact
    // per-file pruning must rewrite EXACTLY those two — a global
    // envelope [5,750] would drag the six middle buckets in.
    val delta = Seq((5L, "X", 1L), (750L, "X", 2L)).toDF("k", "st", "c")
    val (rewritten, carried) = TxTable.merge(spark, root, delta)
    assert(rewritten === 2 && carried === 6)
    val v1 = TxTable.liveFiles(spark, root, 1).sortBy(_.min)
    val v2 = TxTable.liveFiles(spark, root, 2).sortBy(_.min)
    // The untouched middle buckets carry IDENTICAL entries (same
    // path, same envelope) — no decay.
    assert(v2.size === 8, "per-bucket rewrite: still one file per bucket")
    val middle1 = v1.slice(1, 7).toSet
    assert(middle1.subsetOf(v2.toSet), "middle buckets must carry verbatim")
    // The two rewritten entries keep bucket-granular envelopes — NOT
    // one [5,750]-wide file.
    val fresh = v2.filterNot(middle1)
    assert(fresh.map(f => (f.min, f.max)).toSet === Set((0L, 99L), (700L, 799L)))
    // Logical contents intact.
    val snap = TxTable.snapshot(spark, root, 2)
    assert(snap.count() === 800)
    assert(snap.filter(col("st") === "X").count() === 2)
  }

  test("chained multi-bucket merges: pruning counts do not decay") {
    import spark.implicits._
    val root = freshTable("txspec_nodecay")
    // Round 1 touches buckets 0 and 7; if the merge output collapsed
    // into one wide file, round 2 (bucket 3 only) would be forced to
    // rewrite it. Per-bucket output keeps round 2 at exactly 1 rewrite.
    TxTable.merge(spark, root,
      Seq((5L, "X", 1L), (750L, "X", 2L)).toDF("k", "st", "c"))
    val (r2, c2) = TxTable.merge(spark, root,
      Seq((350L, "Y", 3L)).toDF("k", "st", "c"))
    assert(r2 === 1 && c2 === 7, "granularity must survive the chained merge")
    // And a third pass back at bucket 0: still 1 rewrite.
    val (r3, c3) = TxTable.merge(spark, root,
      Seq((6L, "Z", 4L)).toDF("k", "st", "c"))
    assert(r3 === 1 && c3 === 7)
    val snap = TxTable.snapshot(spark, root)
    assert(snap.count() === 800)
    assert(snap.filter(col("st") =!= "A").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSet
      === Set(5L -> "X", 750L -> "X", 350L -> "Y", 6L -> "Z"))
  }

  test("optimistic concurrency: version collision fails atomically and " +
       "concurrent merges both land") {
    import spark.implicits._
    val root = freshTable("txspec_occ")
    // Direct collision: committing the same version twice must throw —
    // last-rename-wins would silently drop a commit.
    TxTable.tryCommit(root, TxTable.Commit(2, Seq.empty, Seq.empty))
    intercept[TxTable.CommitConflictException] {
      TxTable.tryCommit(root, TxTable.Commit(2, Seq.empty, Seq.empty))
    }
    // Remove the synthetic empty commit before the concurrent phase.
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$root/_log/2.json"))
    // Two writers merging disjoint-key deltas concurrently: both must
    // commit (one retries at the next version), and the final snapshot
    // carries BOTH deltas.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val f1 = Future(TxTable.merge(spark, root,
      Seq((5L, "P", 1L)).toDF("k", "st", "c")))
    val f2 = Future(TxTable.merge(spark, root,
      Seq((750L, "Q", 2L)).toDF("k", "st", "c")))
    Await.result(f1, 120.seconds); Await.result(f2, 120.seconds)
    assert(TxTable.latestVersion(spark, root) === 3,
      "both writers must land, as v2 and v3")
    val snap = TxTable.snapshot(spark, root)
    assert(snap.count() === 800)
    assert(snap.filter(col("st").isin("P", "Q")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSet
      === Set(5L -> "P", 750L -> "Q"))
  }

  test("log checkpoint: replay reads O(interval) files and time travel " +
       "across the checkpoint still works") {
    import spark.implicits._
    val root = freshTable("txspec_ckpt")
    // Drive past the checkpoint interval (8): versions 2..10.
    (1 to 9).foreach { i =>
      TxTable.merge(spark, root,
        Seq((i.toLong, s"M$i", i.toLong)).toDF("k", "st", "c"))
    }
    assert(TxTable.latestVersion(spark, root) === 10)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$root/_log/8.checkpoint.json")),
      "a checkpoint must exist at the interval boundary")
    // Checkpoint-assisted replay (v10 path goes through 8.checkpoint)
    // must agree with a raw full-log replay.
    val viaCkpt = TxTable.liveFiles(spark, root, 10).toSet
    val raw = {
      val cs = TxTable.commits(spark, root, 10)
      val removed = cs.flatMap(_.remove).toSet
      cs.flatMap(_.add).filterNot(f => removed(f.file)).toSet
    }
    assert(viaCkpt === raw, "checkpoint replay must equal raw replay")
    // Time travel BEFORE the checkpoint (v3: merges 1..2 applied).
    val v3 = TxTable.snapshot(spark, root, 3)
    assert(v3.filter(col("st").startsWith("M")).count() === 2)
    // And at the head: all 9 merges visible.
    assert(TxTable.snapshot(spark, root)
      .filter(col("st").startsWith("M")).count() === 9)
  }

  test("appendBatch: (appId, batchId)-keyed commits are exactly-once under replay") {
    import spark.implicits._
    val root = freshTable("txspec_batch")
    val b7 = Seq((9001L, "B", 1L), (9002L, "B", 2L)).toDF("k", "st", "c")
    assert(TxTable.appendBatch(spark, root, "sinkA", batchId = 7L, b7) === true)
    val after = TxTable.snapshot(spark, root).count()
    assert(after === 802)
    // Replay of the same micro-batch (simulated failure/restart): the
    // log already carries (sinkA, 7) → no-op, state unchanged.
    assert(TxTable.appendBatch(spark, root, "sinkA", batchId = 7L, b7) === false)
    assert(TxTable.latestVersion(spark, root) === 2)
    assert(TxTable.snapshot(spark, root).count() === 802)
    // A genuinely new batch still lands.
    assert(TxTable.appendBatch(spark, root, "sinkA", batchId = 8L,
      Seq((9003L, "B", 3L)).toDF("k", "st", "c")) === true)
    assert(TxTable.snapshot(spark, root).count() === 803)
    // A DIFFERENT sink's batch 7 is a different transaction — batchId
    // alone must not collide across writer identities.
    assert(TxTable.appendBatch(spark, root, "sinkB", batchId = 7L,
      Seq((9004L, "B", 4L)).toDF("k", "st", "c")) === true)
    assert(TxTable.snapshot(spark, root).count() === 804)
  }

  test("vacuum: drops expired-version files and failed-writer debris, retained snapshots intact") {
    import spark.implicits._
    val root = freshTable("txspec_vac")
    // Three merges all hitting bucket 0, so each version replaces the
    // previous version's bucket-0 file — v1's and v2's bucket-0 files
    // become unreferenced once retention moves past them.
    (1 to 3).foreach { i =>
      TxTable.merge(spark, root, Seq((5L, s"V$i", i.toLong)).toDF("k", "st", "c"))
    }
    assert(TxTable.latestVersion(spark, root) === 4)
    // Failed-writer debris: a data dir the log never recorded.
    val orphan = java.nio.file.Paths.get(s"$root/data/v9-deadbeef-0.parquet")
    java.nio.file.Files.createDirectories(orphan)
    java.nio.file.Files.writeString(orphan.resolve("junk"), "not parquet")
    val v4Before = TxTable.snapshot(spark, root, 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val v3Before = TxTable.snapshot(spark, root, 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val deleted = TxTable.vacuum(spark, root, retainVersions = 2)
    // v1's and v2's replaced bucket-0 files + the orphan must go.
    assert(deleted >= 3, s"expected >= 3 deletions, got $deleted")
    assert(!java.nio.file.Files.exists(orphan), "orphan debris survived")
    // Retained snapshots (v3, v4) replay bit-identically.
    assert(TxTable.snapshot(spark, root, 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet === v4Before)
    assert(TxTable.snapshot(spark, root, 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet === v3Before)
    // Time travel past retention is gone: v1's bucket-0 file was
    // deleted, so the v1 snapshot can no longer be read in full.
    val v1Gone = intercept[Exception] {
      TxTable.snapshot(spark, root, 1).count()
    }
    assert(v1Gone != null)
    // Vacuum is idempotent: nothing left to collect.
    assert(TxTable.vacuum(spark, root, retainVersions = 2) === 0)
  }

  test("optimize: compaction drops file count, snapshot bit-identical") {
    import spark.implicits._
    val root = freshTable("txspec_opt")
    // Scatter 6 tiny append commits → 8 + 6 = 14 live files.
    (1 to 6).foreach { i =>
      TxTable.appendBatch(spark, root, "opt", batchId = i.toLong,
        Seq((1000L + i, "S", i.toLong)).toDF("k", "st", "c"))
    }
    val before = TxTable.snapshot(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val nBefore = TxTable.liveFiles(spark, root).size
    assert(nBefore === 14)
    val (compacted, produced) = TxTable.optimize(spark, root, targetRows = 200L)
    assert(compacted > produced && produced >= 1,
      s"compaction must shrink: $compacted files -> $produced")
    assert(TxTable.liveFiles(spark, root).size < nBefore)
    val afterSet = TxTable.snapshot(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(afterSet === before, "OPTIMIZE is pure layout — data identical")
    // The pre-OPTIMIZE version still time-travels to the same data.
    val prevSet = TxTable.snapshot(spark, root, TxTable.latestVersion(spark, root) - 1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(prevSet === before)
  }

  test("mergeInto: update + conditional delete + insert land as ONE commit") {
    import spark.implicits._
    val root = freshTable("txspec_mi")
    val delta = Seq(
      (10L, "X", 1L),   // matched → update
      (20L, "D", 0L),   // matched + delete-flagged → delete
      (900L, "N", 5L),  // unmatched → insert
      (950L, "D", 0L))  // unmatched + delete-flagged → no-op (ghost)
      .toDF("k", "st", "c")
    val (rewritten, carried) =
      TxTable.mergeInto(spark, root, delta, deleteWhen = col("st") === "D")
    // All four clauses in ONE commit; only bucket 0 held a matched key
    // (the out-of-range insert lands in the nearest rewritten bucket).
    assert(TxTable.latestVersion(spark, root) === 2)
    assert(rewritten === 1 && carried === 7)
    val v2 = TxTable.snapshot(spark, root, 2)
    assert(v2.count() === 800, "800 - 1 delete + 1 insert")
    assert(v2.filter(col("k") === 10L).collect()(0).getString(1) === "X")
    assert(v2.filter(col("k") === 20L).count() === 0, "matched delete")
    assert(v2.filter(col("k") === 900L).count() === 1, "insert")
    assert(v2.filter(col("k") === 950L).count() === 0, "ghost delete = no-op")
    // The pre-merge version still reads whole.
    val v1 = TxTable.snapshot(spark, root, 1)
    assert(v1.count() === 800 && v1.filter(col("k") === 20L).count() === 1)
  }

  test("mergeInto: a NULL delete condition is NOT-satisfied (SQL MERGE semantics)") {
    import spark.implicits._
    val root = freshTable("txspec_mi_null")
    // st = null makes (st === "D") evaluate to NULL for both rows: the
    // matched row must take the UPDATE branch (not silently delete),
    // the unmatched row must INSERT (not silently vanish).
    val delta = Seq((10L, null.asInstanceOf[String], 42L),
      (901L, null.asInstanceOf[String], 43L)).toDF("k", "st", "c")
    TxTable.mergeInto(spark, root, delta, deleteWhen = col("st") === "D")
    val v2 = TxTable.snapshot(spark, root, 2)
    assert(v2.count() === 801, "NULL condition deleted or dropped a row")
    assert(v2.filter(col("k") === 10L).collect()(0).getLong(2) === 42L)
    assert(v2.filter(col("k") === 901L).count() === 1)
  }

  test("connector reads surface NULL fields as NULLs, not reader crashes") {
    import spark.implicits._
    val root = freshTable("txspec_nulls")
    TxTable.appendBatch(spark, root, "nulls", 1L,
      Seq((2000L, null.asInstanceOf[String], 9L)).toDF("k", "st", "c"))
    val got = spark.read.format("graft-txtable").option("root", root).load()
      .filter(col("k") === 2000L).collect()
    assert(got.length === 1)
    assert(got(0).isNullAt(1) && got(0).getLong(2) === 9L)
  }

  test("delete: copy-on-write removal rewrites only touched files") {
    import spark.implicits._
    val root = freshTable("txspec_del")
    // Keys 5/49 (bucket 0 [0,99]) and 750 (bucket 7 [700,799]) — exact
    // per-file pruning must rewrite exactly those two buckets.
    val (rewritten, carried) = TxTable.delete(spark, root,
      Seq(5L, 49L, 750L).toDF("k"))
    assert(rewritten === 2 && carried === 6)
    val v2 = TxTable.snapshot(spark, root, 2)
    assert(v2.count() === 797)
    assert(v2.filter(col("k").isin(5L, 49L, 750L)).count() === 0)
    // Untouched buckets carry verbatim; v1 still time-travels whole.
    val v1Files = TxTable.liveFiles(spark, root, 1).sortBy(_.min)
    val v2Files = TxTable.liveFiles(spark, root, 2).map(_.file).toSet
    assert(v1Files.slice(1, 7).forall(f => v2Files(f.file)))
    assert(TxTable.snapshot(spark, root, 1).count() === 800)
    // Deleting keys no live file can contain is a no-op commit-wise.
    val (r2, _) = TxTable.delete(spark, root, Seq(100000L).toDF("k"))
    assert(r2 === 0 && TxTable.latestVersion(spark, root) === 2)
  }

  test("changeFeed: classification, carried-row suppression, window composition") {
    import spark.implicits._
    val root = freshTable("txspec_cdf")
    TxTable.merge(spark, root,
      Seq((10L, "X", 999L), (900L, "N", 42L)).toDF("k", "st", "c")) // v2
    TxTable.delete(spark, root, Seq(20L).toDF("k"))                 // v3
    def feed(a: Int, b: Int) = TxTable.changeFeed(spark, root, a, b)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // v1→v2: the update's pre+post image PAIR and the insert — and
    // NOTHING else, although the rewritten bucket carried 99 rows.
    assert(feed(1, 2) === Set(("update_pre", 10L), ("update_post", 10L),
      ("insert", 900L)))
    // v2→v3: just the delete.
    assert(feed(2, 3) === Set(("delete", 20L)))
    // v1→v3 composes: update pair + insert + delete, each once.
    assert(feed(1, 3) === Set(("update_pre", 10L), ("update_post", 10L),
      ("insert", 900L), ("delete", 20L)))
    // The image pair carries OLD values on pre, NEW values on post —
    // what lets a downstream aggregate retract and re-add (q349).
    val images = TxTable.changeFeed(spark, root, 1, 2)
      .filter(col("k") === 10L).collect()
      .map(r => r.getString(0) -> (r.getString(2), r.getLong(3))).toMap
    assert(images("update_pre") === ("A", 100L))
    assert(images("update_post") === ("X", 999L))
    // The pruning claim: the feed reads strictly fewer parquet files
    // than one full snapshot — it scans the COW file diff, never two
    // snapshots (here: 2 touched buckets vs 8 + 8).
    val feedFiles = TxTable.changeFeed(spark, root, 1, 2).inputFiles.length
    val snapFiles = TxTable.snapshot(spark, root, 1).inputFiles.length
    assert(feedFiles < snapFiles,
      s"feed reads $feedFiles files, a full v1 snapshot alone has $snapFiles")
  }

  test("connector batch read: versionAsOf time travel equals snapshot, provenance labels") {
    import spark.implicits._
    val root = freshTable("txspec_connector")
    TxTable.merge(spark, root,
      Seq((5L, "X", 1L), (900L, "N", 7L)).toDF("k", "st", "c")) // v2
    def rd(opts: (String, String)*) = {
      val r = spark.read.format("graft-txtable").option("root", root)
      opts.foreach { case (k, v) => r.option(k, v) }
      r.load()
    }
    // Time travel through the connector equals the log-level snapshot.
    def asSet(df: org.apache.spark.sql.DataFrame) = df
      .select("k", "st", "c").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(asSet(rd("versionAsOf" -> "1")) ===
      asSet(TxTable.snapshot(spark, root, 1)))
    assert(asSet(rd()) === asSet(TxTable.snapshot(spark, root)))
    // Provenance: carried rows keep commit 1, rewritten-bucket rows
    // carry commit 2 (incl. the untouched rows the rewrite copied).
    val byCommit = rd().groupBy("commit_version").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byCommit.keySet === Set(1L, 2L))
    assert(byCommit(2L) >= 2L, "the rewritten bucket holds the upserts")
    assert(rd("versionAsOf" -> "1").select("commit_version")
      .distinct().collect().map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("mergeInto: a duplicate-key delta is rejected (SQL MERGE cardinality rule)") {
    import spark.implicits._
    val root = freshTable("txspec_dupkey")
    val dupDelta = Seq((10L, "X", 1L), (10L, "Y", 2L), (11L, "Z", 3L))
      .toDF("k", "st", "c")
    val e = intercept[IllegalArgumentException] {
      TxTable.merge(spark, root, dupDelta)
    }
    assert(e.getMessage.contains("multiple rows"),
      s"unexpected message: ${e.getMessage}")
    // Nothing committed: the table is untouched.
    assert(TxTable.latestVersion(spark, root) === 1)
    assert(TxTable.snapshot(spark, root).count() === 800)
  }

  test("mergeInto: UPDATE can set a column to NULL (delta wins outright)") {
    import spark.implicits._
    val root = freshTable("txspec_nullset")
    // SQL MERGE 'UPDATE SET st = NULL': the delta's NULL must WIN over
    // the base value — per-column coalesce would silently keep 'A'.
    TxTable.merge(spark, root,
      Seq((10L, null.asInstanceOf[String], 77L)).toDF("k", "st", "c"))
    val row = TxTable.snapshot(spark, root)
      .filter(col("k") === 10L).collect()(0)
    assert(row.isNullAt(1), "the delta's NULL st must overwrite the base value")
    assert(row.getLong(2) === 77L)
  }

  test("generic schema: a differently-shaped table runs the full lifecycle, " +
       "schema and key from the log") {
    import spark.implicits._
    val root = graft.sources.Staging.dir(sfDir, "txspec_generic")
    // (sk BIGINT key, name STRING, nk INT, bal BIGINT) — nothing named
    // k/st/c anywhere.
    val base = spark.range(0, 300).select(col("id").as("sk"),
      concat(lit("n"), col("id")).as("name"),
      (col("id") % 7).cast("int").as("nk"), (col("id") * 100).as("bal"))
    TxTable.create(base, root, nBuckets = 4, key = "sk")
    val m = TxTable.tableMeta(spark, root)
    assert(m.key === "sk")
    assert(m.schema.fieldNames.toSeq === Seq("sk", "name", "nk", "bal"))
    // MERGE INTO keyed on sk: update, delete, insert in one commit.
    val delta = Seq(
      (5L, "upd", 1, 999L),     // matched → update
      (6L, "DEL", 0, 0L),       // matched → delete
      (900L, "ins", 2, 111L))   // unmatched → insert
      .toDF("sk", "name", "nk", "bal")
    val (rw, co) = TxTable.mergeInto(spark, root, delta,
      deleteWhen = col("name") === "DEL")
    assert(rw >= 1 && rw + co === 4)
    val v2 = TxTable.snapshot(spark, root)
    assert(v2.columns.toSeq === Seq("sk", "name", "nk", "bal"))
    assert(v2.count() === 300, "300 - 1 delete + 1 insert")
    assert(v2.filter(col("sk") === 5L).collect()(0).getString(1) === "upd")
    assert(v2.filter(col("sk") === 6L).count() === 0)
    assert(v2.filter(col("sk") === 900L).count() === 1)
    // Copy-on-write DELETE keyed on sk.
    TxTable.delete(spark, root, Seq(7L, 8L).toDF("sk"))
    assert(TxTable.snapshot(spark, root).count() === 298)
    // Change feed classifies on the generic key + payload columns.
    val feed = TxTable.changeFeed(spark, root, 1, 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(feed === Set(("update_pre", 5L), ("update_post", 5L),
      ("delete", 6L), ("insert", 900L)))
    // The connector derives its schema + row materializer from the
    // log: generic columns (incl. the INT) round-trip, with
    // commit_version appended.
    val conn = spark.read.format("graft-txtable").option("root", root).load()
    assert(conn.columns.toSeq === Seq("sk", "name", "nk", "bal", "commit_version"))
    val got = conn.filter(col("sk") === 900L).collect()(0)
    assert(got.getLong(0) === 900L && got.getString(1) === "ins" &&
      got.getInt(2) === 2 && got.getLong(3) === 111L)
    // Widening append: the new column lands in the LOG's schema and
    // pre-widening rows NULL-backfill — through snapshot AND connector.
    TxTable.appendBatch(spark, root, "gen", 1L,
      Seq((2000L, "g2", 3, 5L, "extra")).toDF("sk", "name", "nk", "bal", "tag"))
    assert(TxTable.tableMeta(spark, root).schema.fieldNames.toSeq ===
      Seq("sk", "name", "nk", "bal", "tag"))
    val snap = TxTable.snapshot(spark, root)
    assert(snap.columns.toSeq === Seq("sk", "name", "nk", "bal", "tag"))
    assert(snap.filter(col("tag").isNull).count() === 298)
    // Time travel serves the PRE-widening schema from the log.
    assert(TxTable.snapshot(spark, root, 2).columns.toSeq ===
      Seq("sk", "name", "nk", "bal"))
    val connWide = spark.read.format("graft-txtable").option("root", root).load()
    assert(connWide.columns.contains("tag"))
    assert(connWide.filter(col("sk") === 2000L).collect()(0)
      .getAs[String]("tag") === "extra")
    assert(connWide.filter(col("sk") === 5L).collect()(0).isNullAt(4),
      "pre-widening rows must NULL-backfill through the connector reader")
  }

  test("connector data skipping: a point read plans only the matching bucket's files") {
    import spark.implicits._
    val root = freshTable("txspec_skip") // 8 buckets of 100 keys
    def rd() = spark.read.format("graft-txtable").option("root", root).load()
    val fullParts = rd().rdd.getNumPartitions
    assert(fullParts >= 8, s"full scan should plan all 8 buckets, got $fullParts")
    // Point lookup: the key-range pushdown prunes against the log's
    // per-file [min,max] — exactly one bucket's part files remain.
    val pointParts = rd().filter(col("k") === 250L).rdd.getNumPartitions
    assert(pointParts === fullParts / 8,
      s"a point read must plan 1 of 8 buckets: $pointParts vs $fullParts")
    // Range spanning three buckets ([100,199],[200,299],[300,399])
    // prunes to exactly those three.
    val rangeParts = rd().filter(col("k") >= 150L && col("k") < 350L)
      .rdd.getNumPartitions
    assert(rangeParts === 3 * (fullParts / 8),
      s"the range must plan 3 of 8 buckets, got $rangeParts")
    // And the skipped plan still returns exact rows.
    assert(rd().filter(col("k") === 250L).count() === 1)
    assert(rd().filter(col("k") >= 150L && col("k") < 350L).count() === 200)
  }

  test("optimizeZorder: snapshot bit-identical, box pruning beats key-only layout") {
    import spark.implicits._
    val root = graft.sources.Staging.dir(sfDir, "txspec_zorder")
    // c is DELIBERATELY key-uncorrelated (bit-reversed id): under the
    // key-range layout every file spans ~the full c domain.
    val base = spark.range(0, 4096).select(col("id").as("k"), lit("A").as("st"),
      expr("CAST(conv(reverse(lpad(conv(id, 10, 2), 12, '0')), 2, 10) AS BIGINT)")
        .as("c"))
    TxTable.create(base, root, nBuckets = 8, stats2 = Some("c"))
    val before = TxTable.snapshot(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // Box: full key range × lowest quarter of c.
    def boxFiles() = TxTable.filesOverlapping(spark, root, 0L, 4095L, 0L, 1023L)
    val preBox = boxFiles()
    assert(preBox === 8, "key-clustered files all span the full c domain")
    val (removed, produced) = TxTable.optimizeZorder(spark, root, "c", nFiles = 8)
    assert(removed === 8 && produced >= 4)
    val after = TxTable.snapshot(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(after === before, "OPTIMIZE ZORDER is pure layout — data identical")
    val postBox = boxFiles()
    assert(postBox < preBox,
      s"z-order must prune the c-box: $postBox vs $preBox files")
    // The pre-zorder version still time-travels.
    assert(TxTable.snapshot(spark, root, 1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet === before)
  }

  test("optimistic concurrency stress: N writers × random op mix all land, " +
       "final state = serial result, vacuum clears loser debris") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val root = freshTable("txspec_occ_stress")
    // 6 writers, op type drawn from a SEEDED rng, each on a disjoint
    // key range — so the serial result is order-independent and the
    // final state is checkable whatever interleaving the OCC race
    // produced. Ops: merge (upsert st=W<i>), delete (2 keys), append
    // (2 fresh rows), MERGE-ON-READ delete (2 keys via deletion
    // vector — racing sidecar commits must compose with COW rewrites).
    val rng = new scala.util.Random(42)
    val ops = (0 until 6).map(i => (i, rng.nextInt(4)))
    val futures = ops.map { case (i, op) =>
      Future {
        val lo = i * 100L // writer i owns keys [100i, 100i+99]
        op match {
          case 0 => TxTable.merge(spark, root,
            Seq((lo + 1, s"W$i", lo), (lo + 2, s"W$i", lo)).toDF("k", "st", "c"))
          case 1 => TxTable.delete(spark, root,
            Seq(lo + 10, lo + 11).toDF("k"))
          case 2 => TxTable.appendBatch(spark, root, s"stress$i", 1L,
            Seq((10000L + i * 10, s"N$i", 1L), (10001L + i * 10, s"N$i", 2L))
              .toDF("k", "st", "c"))
          case 3 => TxTable.deleteMor(spark, root,
            Seq(lo + 20, lo + 21).toDF("k"))
        }
      }
    }
    // A 7th racer: SCOPED OPTIMIZE over buckets 3–4 (writers 3 and 4's
    // key ranges — deliberate contention with their rewrites). Pure
    // layout, so it changes no expected logical state; it commits one
    // extra version iff its final retry still found a packable group.
    val optF = Future {
      TxTable.optimize(spark, root, targetRows = 250L,
        scopeLo = 300L, scopeHi = 499L)
    }
    futures.foreach(f => Await.result(f, 300.seconds))
    val (optIn, optOut) = Await.result(optF, 300.seconds)
    // Every writer must have landed: 1 create + 6 commits (+1 if the
    // racing scoped compaction found work on its winning attempt).
    val expectedLatest = if (optIn > 0) 8 else 7
    assert(TxTable.latestVersion(spark, root) === expectedLatest,
      s"all concurrent writers must commit (optimize: $optIn -> $optOut)")
    // Serial-equivalent expected state (disjoint ranges commute, so
    // ANY landed order yields the same final table).
    var exp = (0L until 800L).map(k => k -> (("A", k * 10))).toMap
    ops.foreach { case (i, op) =>
      val lo = i * 100L
      op match {
        case 0 => exp = exp + ((lo + 1) -> ((s"W$i", lo))) + ((lo + 2) -> ((s"W$i", lo)))
        case 1 => exp = exp - (lo + 10) - (lo + 11)
        case 2 => exp = exp + ((10000L + i * 10) -> ((s"N$i", 1L))) +
          ((10001L + i * 10) -> ((s"N$i", 2L)))
        case 3 => exp = exp - (lo + 20) - (lo + 21)
      }
    }
    val got = TxTable.snapshot(spark, root).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got === exp, "final state must equal the serial application")
    // Losing-attempt debris (orphaned parquet from retried writers) is
    // collectable; retained snapshots replay bit-identically after.
    TxTable.vacuum(spark, root, retainVersions = 7)
    val got2 = TxTable.snapshot(spark, root).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got2 === exp, "vacuum must not touch any retained snapshot's files")
  }

  test("unique_key property: declared default is write-checked, undeclared " +
       "refuses keyed ops, waived allows them unchecked") {
    import spark.implicits._
    // Default create declares + checks.
    val root = freshTable("txspec_uk")
    assert(TxTable.tableMeta(spark, root).uniqueKey === Some(true))
    // In-batch duplicate keys are rejected BEFORE anything commits.
    val e = intercept[IllegalArgumentException] {
      TxTable.appendBatch(spark, root, "uk", 1L,
        Seq((9000L, "B", 1L), (9000L, "B", 2L)).toDF("k", "st", "c"))
    }
    assert(e.getMessage.contains("duplicate"))
    assert(TxTable.latestVersion(spark, root) === 1)
    // Cheap check is in-batch only: a cross-file duplicate passes…
    TxTable.appendBatch(spark, root, "uk", 2L,
      Seq((5L, "B", 1L)).toDF("k", "st", "c"))
    // …but the documented full-scan opt-in catches it.
    intercept[IllegalArgumentException] {
      TxTable.appendBatch(spark, root, "uk", 3L,
        Seq((7L, "B", 1L)).toDF("k", "st", "c"), uniqueCheckFull = true)
    }
    // create validates the INITIAL data too.
    intercept[IllegalArgumentException] {
      TxTable.create(Seq((1L, "A", 1L), (1L, "A", 2L)).toDF("k", "st", "c"),
        graft.sources.Staging.dir(sfDir, "txspec_uk_dupinit"), nBuckets = 2)
    }
    // UNDECLARED (None): the keyed ops refuse — the silent-wrong-CDF trap.
    val rootU = graft.sources.Staging.dir(sfDir, "txspec_uk_undeclared")
    TxTable.create(spark.range(0, 100)
      .select(col("id").as("k"), lit("A").as("st"), (col("id") * 10).as("c")),
      rootU, nBuckets = 2, uniqueKey = None)
    val e2 = intercept[IllegalArgumentException] {
      TxTable.merge(spark, rootU, Seq((5L, "X", 1L)).toDF("k", "st", "c"))
    }
    assert(e2.getMessage.contains("unique_key"))
    intercept[IllegalArgumentException] {
      TxTable.deleteMor(spark, rootU, Seq(5L).toDF("k"))
    }
    TxTable.appendBatch(spark, rootU, "uk", 1L,
      Seq((500L, "B", 1L)).toDF("k", "st", "c")) // raw appends still fine
    intercept[IllegalArgumentException] {
      TxTable.changeFeed(spark, rootU, 1, 2)
    }
    // WAIVED (Some(false)): keyed ops run, writes are unchecked (the
    // caller asserted the contract), duplicate appends pass.
    val rootW = graft.sources.Staging.dir(sfDir, "txspec_uk_waived")
    TxTable.create(spark.range(0, 100)
      .select(col("id").as("k"), lit("A").as("st"), (col("id") * 10).as("c")),
      rootW, nBuckets = 2, uniqueKey = Some(false))
    TxTable.merge(spark, rootW, Seq((5L, "X", 1L)).toDF("k", "st", "c"))
    assert(TxTable.changeFeed(spark, rootW, 1, 2)
      .filter(col("change_type") === "update_post").count() === 1)
    TxTable.appendBatch(spark, rootW, "uk", 1L,
      Seq((900L, "B", 1L), (900L, "B", 2L)).toDF("k", "st", "c"))
    assert(TxTable.snapshot(spark, rootW).filter(col("k") === 900L).count() === 2)
  }

  test("scoped OPTIMIZE: only in-scope files rewritten, out-of-scope entries " +
       "survive verbatim, snapshot identical") {
    import spark.implicits._
    val root = freshTable("txspec_opt_scoped")
    (1 to 6).foreach { i =>
      TxTable.appendBatch(spark, root, "opt", batchId = i.toLong,
        Seq((1000L + i, "S", i.toLong)).toDF("k", "st", "c"))
    }
    val before = TxTable.snapshot(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val baseEntries = TxTable.liveFiles(spark, root).filter(_.max < 1000L).toSet
    assert(baseEntries.size === 8 && TxTable.liveFiles(spark, root).size === 14)
    // Scope to the append range: the 8 base buckets are OUT of scope.
    val (compacted, produced) =
      TxTable.optimize(spark, root, targetRows = 200L, scopeLo = 1000L)
    assert(compacted === 6 && produced === 1,
      s"exactly the 6 in-scope appends compact: ($compacted, $produced)")
    val after = TxTable.liveFiles(spark, root)
    // Out-of-scope entries carried VERBATIM (same path, same stats).
    assert(after.filter(_.max < 1000L).toSet === baseEntries,
      "out-of-scope file entries must survive the scoped pass untouched")
    assert(after.size === 9)
    assert(TxTable.snapshot(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      === before, "scoped OPTIMIZE is pure layout")
  }

  test("scoped OPTIMIZE ZORDER: re-clusters only the keyed scope, " +
       "carries the rest verbatim") {
    import spark.implicits._
    val root = graft.sources.Staging.dir(sfDir, "txspec_zscope")
    val base = spark.range(0, 4096).select(col("id").as("k"), lit("A").as("st"),
      expr("CAST(conv(reverse(lpad(conv(id, 10, 2), 12, '0')), 2, 10) AS BIGINT)")
        .as("c"))
    TxTable.create(base, root, nBuckets = 8, stats2 = Some("c"))
    val before = TxTable.snapshot(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val outOfScope = TxTable.liveFiles(spark, root).filter(_.min >= 2048L).toSet
    assert(outOfScope.size === 4)
    // Re-cluster keys [0, 2047] only (buckets 0–3).
    val (removed, produced) = TxTable.optimizeZorder(spark, root, "c",
      nFiles = 8, scopeLo = 0L, scopeHi = 2047L)
    assert(removed === 4 && produced >= 4)
    val after = TxTable.liveFiles(spark, root)
    assert(after.filter(_.min >= 2048L).toSet === outOfScope,
      "out-of-scope entries must carry verbatim through scoped ZORDER")
    assert(TxTable.snapshot(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      === before, "scoped ZORDER is pure layout")
    // In-scope box pruning improved: pre-zorder all 4 scoped files
    // must-read the (keys 0–2047 × low-c) box; post, some drop out.
    val postBox = TxTable.filesOverlapping(spark, root, 0L, 2047L, 0L, 1023L)
    assert(postBox < 4,
      s"scoped z-order must prune the in-scope c-box: $postBox vs 4")
  }

  test("OPTIMIZE ZORDER survives full-BIGINT key domains (±2^62)") {
    import spark.implicits._
    val root = graft.sources.Staging.dir(sfDir, "txspec_zwide")
    val half = 1L << 62
    // Two clusters at the BIGINT extremes: the historical rank math
    // (((k-lo)*255) div range) overflows on BOTH the multiply and the
    // subtraction here; the wide path must complete under ANSI.
    val base = spark.range(0, 1000).select(
      when(col("id") < 500, col("id") - lit(half))
        .otherwise(col("id") - lit(500L) + lit(half - 500L)).as("k"),
      lit("A").as("st"), (col("id") * 10L).as("c"))
    TxTable.create(base, root, nBuckets = 4)
    val before = TxTable.snapshot(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(before.size === 1000)
    val (removed, produced) = TxTable.optimizeZorder(spark, root, "c", nFiles = 8)
    assert(removed >= 1 && produced >= 2)
    assert(TxTable.snapshot(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      === before, "wide-domain ZORDER is pure layout")
    // Key pruning still works off the rewritten envelopes: a read of
    // the HIGH cluster must not plan every file.
    val total = TxTable.liveFiles(spark, root).size
    val highOnly = TxTable.filesOverlapping(spark, root,
      half - 500L, Long.MaxValue, Long.MinValue, Long.MaxValue)
    assert(highOnly < total,
      s"high-cluster read must prune: $highOnly of $total files")
  }

  test("liveDvs replay is checkpoint-bounded and survives the checkpoint") {
    import spark.implicits._
    val root = freshTable("txspec_dv_ckpt")
    TxTable.deleteMor(spark, root, Seq(0L, 1L).toDF("k")) // v2: bucket-0 vector
    // Drive past the checkpoint interval with merges on a DISTANT
    // bucket (they must not materialize bucket 0's vector).
    (1 to 7).foreach { i =>
      TxTable.merge(spark, root,
        Seq((750L, s"M$i", i.toLong)).toDF("k", "st", "c")) // v3..v9
    }
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$root/_log/8.checkpoint.json")),
      "the checkpoint at v8 must exist")
    // The checkpoint summarized the vector: post-checkpoint replay
    // (checkpoint + tail only) still sees it…
    val dvs = TxTable.liveDvs(spark, root)
    assert(dvs.size === 1 && dvs.values.head.n === 2L,
      "the live vector must survive checkpoint-bounded replay")
    // …and the snapshot still subtracts it.
    assert(TxTable.snapshot(spark, root).filter(col("k") <= 1L).count() === 0)
    assert(TxTable.snapshot(spark, root).count() === 798)
    // Time travel BEFORE the vector existed is unaffected.
    assert(TxTable.snapshot(spark, root, 1).count() === 800)
  }

  test("changeFeed across a restore that clears deletion vectors emits re-inserts") {
    import spark.implicits._
    val root = freshTable("txspec_cdf_restore")
    TxTable.deleteMor(spark, root, Seq(0L, 1L).toDF("k")) // v2
    TxTable.restore(spark, root, 1)                       // v3: same paths, vector cleared
    // v2→v3 re-inserts the vectored keys even though before==after on
    // file paths (the round-15 ADVICE hole: a path-diff-only feed is
    // empty here).
    val feed23 = TxTable.changeFeed(spark, root, 2, 3).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(feed23 === Set(("insert", 0L), ("insert", 1L)))
    // And the composed window v1→v3 is EMPTY: v3 is bit-identical to v1.
    assert(TxTable.changeFeed(spark, root, 1, 3).count() === 0)
    // The post-images carry the original payloads.
    val img = TxTable.changeFeed(spark, root, 2, 3)
      .filter(col("k") === 1L).collect()(0)
    assert(img.getString(2) === "A" && img.getLong(3) === 10L)
  }

  test("a create rejected by its own constraint scan leaves the prior table intact") {
    import spark.implicits._
    val root = freshTable("txspec_create_intact")
    val bad = Seq((1L, "B", -5L)).toDF("k", "st", "c")
    intercept[IllegalArgumentException] {
      TxTable.create(bad, root, nBuckets = 2,
        constraints = Map("c_nonneg" -> "c >= 0"))
    }
    // The prior table at root survives whole — wipe must not have run.
    assert(TxTable.snapshot(spark, root).count() === 800)
    assert(TxTable.latestVersion(spark, root) === 1)
  }

  test("an explicit Commit.ts round-trips through the log") {
    val root = freshTable("txspec_ts")
    TxTable.tryCommit(root,
      TxTable.Commit(2, Seq.empty, Seq.empty, ts = 1234567890123L))
    val c2 = TxTable.commits(spark, root).find(_.version === 2).get
    assert(c2.ts === 1234567890123L,
      "an explicit nonzero ts must serialize verbatim, not be restamped")
    // Unstamped commits still get publication wall-clock.
    assert(TxTable.commits(spark, root).find(_.version === 1).get.ts > 0L)
  }

  test("restore to a legacy (pre-metadata) version re-declares a synthesized meta") {
    import spark.implicits._
    val root = graft.sources.Staging.dir(sfDir, "txspec_restore_legacy")
    TxTable.wipe(root)
    // Hand-build a LEGACY v1: data written directly, commit without meta.
    val path = s"$root/data/legacy-0.parquet"
    spark.range(0, 50)
      .select(col("id").as("k"), lit("A").as("st"), (col("id") * 2).as("c"))
      .write.mode("overwrite").parquet(path)
    TxTable.tryCommit(root, TxTable.Commit(1,
      Seq(TxTable.FileEntry(path, 0L, 49L, 50L)), Seq.empty))
    assert(TxTable.tableMetaOpt(spark, root).isEmpty)
    // Later-declared metadata (addConstraint commits the footer-derived
    // meta), then restore back to the legacy version.
    TxTable.addConstraint(spark, root, "c_nonneg", "c >= 0") // v2 declares meta
    assert(TxTable.tableMetaOpt(spark, root).isDefined)
    TxTable.restore(spark, root, 1) // v3
    // The restore must RE-DECLARE a meta matching v1's state (footer
    // synthesis) — not leave the v2 constraint in force.
    val m = TxTable.tableMeta(spark, root)
    assert(m.constraints.isEmpty,
      "restore to a legacy version must not keep later-declared constraints")
    assert(m.schema.fieldNames.toSeq === Seq("k", "st", "c"))
    assert(TxTable.snapshot(spark, root).count() === 50)
  }

  test("per-column stats vector: declared columns prune, undeclared stay conservative, " +
       "stats survive compaction") {
    import spark.implicits._
    val root = graft.sources.Staging.dir(sfDir, "txspec_statsvec")
    // 4 appended cells: k spans the full domain in EVERY file (key
    // stats prune nothing); c and d are narrow per file.
    def cell(i: Long) = spark.range(0, 400)
      .filter(col("id") % 4 === i)
      .select(col("id").as("k"), (lit(i * 100) + col("id") % 10).as("c"),
        (lit(i * 1000) + col("id") % 10).as("d"), lit("x").as("e"))
    TxTable.create(cell(0), root, nBuckets = 1, statsCols = Seq("c", "d"))
    (1L to 3L).foreach(i => TxTable.appendBatch(spark, root, "sv", i, cell(i)))
    assert(TxTable.tableMeta(spark, root).statsCols === Seq("c", "d"))
    // Every file records bounds for both declared columns.
    assert(TxTable.liveFiles(spark, root)
      .forall(f => f.stats.map(_._1).toSet === Set("c", "d")))
    def audit(box: (String, (Long, Long))*) =
      TxTable.filesOverlappingBox(spark, root, box.toSeq)
    // Key alone: must-read all 4 (spans every file).
    assert(audit("k" -> (0L, 399L)) === 4)
    // c picks cell 2; d agrees; the pair still lands on exactly 1 file.
    assert(audit("c" -> (200L, 209L)) === 1)
    assert(audit("c" -> (200L, 209L), "d" -> (2000L, 2009L)) === 1)
    // Disjoint c × d boxes intersect NO file.
    assert(audit("c" -> (200L, 209L), "d" -> (3000L, 3009L)) === 0)
    // An UNDECLARED column is a conservative must-read, never a wrong prune.
    assert(audit("e" -> (0L, 0L)) === 4)
    // The connector pushdown consumes the vector: a c-range read plans
    // strictly fewer partitions than the full scan.
    def rd() = spark.read.format("graft-txtable").option("root", root).load()
    val full = rd().rdd.getNumPartitions
    val pruned = rd().filter(col("c") >= 200L && col("c") <= 209L)
      .rdd.getNumPartitions
    assert(pruned < full, s"vector pushdown must prune: $pruned vs $full")
    assert(rd().filter(col("c") >= 200L && col("c") <= 209L).count() === 100)
    // Compaction re-records the vector on its rewritten files.
    TxTable.optimize(spark, root, targetRows = 1000000L)
    assert(TxTable.liveFiles(spark, root)
      .forall(f => f.stats.map(_._1).toSet === Set("c", "d")))
    assert(audit("c" -> (200L, 209L), "d" -> (2000L, 2009L)) === 1)
  }

  test("connector batch write: df.write appends through the OCC commit path, " +
       "constraints and unique_key enforced, rejected writes leave no commit") {
    import spark.implicits._
    val root = graft.sources.Staging.dir(sfDir, "txspec_connwrite")
    val base = spark.range(0, 200)
      .select(col("id").as("k"), lit("A").as("st"), (col("id") * 10).as("c"))
    TxTable.create(base, root, nBuckets = 4,
      constraints = Map("c_nonneg" -> "c >= 0"))
    // The user's first instinct — df.write.format("graft-txtable") —
    // must work and land as one committed version.
    Seq((1000L, "W", 1L), (1001L, "W", 2L)).toDF("k", "st", "c")
      .write.format("graft-txtable").option("root", root)
      .mode("append").save()
    assert(TxTable.latestVersion(spark, root) === 2)
    val snap = TxTable.snapshot(spark, root)
    assert(snap.count() === 202)
    assert(snap.filter(col("st") === "W").count() === 2)
    // Round trip through the connector read too.
    assert(spark.read.format("graft-txtable").option("root", root).load()
      .filter(col("k") >= 1000L).count() === 2)
    // A constraint-violating connector write is rejected, commits
    // nothing, and leaves no file debris behind.
    def dataFiles() = {
      val st = java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$root/data"))
      try { import scala.jdk.CollectionConverters._
        st.iterator().asScala.size } finally st.close()
    }
    val filesBefore = dataFiles()
    val e = intercept[Exception] {
      Seq((2000L, "B", -7L)).toDF("k", "st", "c")
        .write.format("graft-txtable").option("root", root)
        .mode("append").save()
    }
    assert(e.getMessage.contains("c_nonneg") ||
      Option(e.getCause).exists(_.getMessage.contains("c_nonneg")))
    assert(TxTable.latestVersion(spark, root) === 2,
      "a rejected connector write must not commit")
    assert(dataFiles() === filesBefore,
      "a rejected connector write must delete its files")
    // unique_key: an in-batch duplicate is rejected through the
    // connector door too.
    intercept[Exception] {
      Seq((3000L, "D", 1L), (3000L, "D", 2L)).toDF("k", "st", "c")
        .write.format("graft-txtable").option("root", root)
        .mode("append").save()
    }
    assert(TxTable.latestVersion(spark, root) === 2)
    // Widening append through the connector: additive evolution.
    Seq((4000L, "G", 5L, "extra")).toDF("k", "st", "c", "tag")
      .write.format("graft-txtable").option("root", root)
      .mode("append").save()
    assert(TxTable.tableMeta(spark, root).schema.fieldNames.contains("tag"))
    assert(TxTable.snapshot(spark, root).filter(col("tag").isNotNull).count() === 1)
    // Batch idempotency via the explicit txn options (the Delta
    // txnAppId/txnVersion pair on DataFrameWriter).
    def idem() = Seq((5000L, "I", 1L)).toDF("k", "st", "c")
      .write.format("graft-txtable").option("root", root)
      .option("txnAppId", "job42").option("txnVersion", "1")
      .mode("append").save()
    idem(); idem()
    assert(TxTable.snapshot(spark, root).filter(col("k") === 5000L).count() === 1,
      "a replayed (txnAppId, txnVersion) batch write must be a no-op")
  }

  test("connector streaming write: writeStream lands epochs exactly-once " +
       "through the OCC commit path") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val src = graft.sources.Staging.dir(sfDir, "txspec_sw_src")
    val dst = graft.sources.Staging.dir(sfDir, "txspec_sw_dst")
    val ckpt = graft.sources.Staging.dir(sfDir, "txspec_sw_ckpt")
    TxTable.wipe(ckpt)
    val base = spark.range(0, 100)
      .select(col("id").as("k"), lit("A").as("st"), (col("id") * 10).as("c"))
    TxTable.create(base, src, nBuckets = 2)               // source table
    TxTable.create(Seq((-1L, "SEED", 0L)).toDF("k", "st", "c"),
      dst, nBuckets = 1)                                  // dest bootstrap
    // table → table, transformed in flight, NO foreachBatch: the
    // connector is both the source and the sink.
    def drain(): Unit = {
      val q = spark.readStream.format("graft-txtable").option("root", src)
        .option("startingVersion", "1").load()
        .select(col("k"), col("st"), (col("c") * 2).as("c"))
        .writeStream.format("graft-txtable").option("root", dst)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(300000), "stream drain timed out")
    }
    drain()
    val snap1 = TxTable.snapshot(spark, dst)
    assert(snap1.count() === 101, "seed + 100 streamed rows")
    assert(snap1.filter(col("k") === 10L).collect()(0).getLong(2) === 200L)
    // Replaying the SAME drain (no new source commits) must deliver
    // and commit nothing: source offsets + epoch idempotency compose.
    val vBefore = TxTable.latestVersion(spark, dst)
    drain()
    assert(TxTable.latestVersion(spark, dst) === vBefore,
      "an empty resumed drain must not commit")
    assert(TxTable.snapshot(spark, dst).count() === 101)
    // New source data: the resumed stream moves ONLY the new commit.
    TxTable.appendBatch(spark, src, "sw", 1L,
      Seq((500L, "B", 5L)).toDF("k", "st", "c"))
    drain()
    val snap2 = TxTable.snapshot(spark, dst)
    assert(snap2.count() === 102)
    assert(snap2.filter(col("k") === 500L).collect()(0).getLong(2) === 10L)
  }

  test("SQL MERGE INTO graft_tx.`root` plans onto TxTable.mergeInto: " +
       "one commit, same clause semantics, unsupported shapes refused") {
    import spark.implicits._
    val root = freshTable("txspec_sqlmerge")
    Seq(
      (10L, "X", 1L),   // matched → update
      (20L, "D", 0L),   // matched + delete-flagged → delete
      (900L, "N", 5L),  // unmatched → insert
      (950L, "D", 0L))  // unmatched + delete-flagged → ghost no-op
      .toDF("k", "st", "c").createOrReplaceTempView("graft_sqlmerge_delta")
    val res = spark.sql(
      s"""MERGE INTO graft_tx.`$root` AS t
         |USING graft_sqlmerge_delta AS s
         |ON t.k = s.k
         |WHEN MATCHED AND s.st = 'D' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    // The command reports the API's pruning pair; one atomic commit.
    assert(res.length === 1 &&
      res(0).getLong(0) === 1L && res(0).getLong(1) === 7L)
    assert(TxTable.latestVersion(spark, root) === 2)
    val v2 = TxTable.snapshot(spark, root)
    // ANSI semantics through the SQL door: the UNCONDITIONAL INSERT *
    // inserts the unmatched delete-flagged row too (the matched-DELETE
    // condition applies only when matched) — 800 - 1 delete + 2 inserts.
    assert(v2.count() === 801)
    assert(v2.filter(col("k") === 10L).collect()(0).getString(1) === "X")
    assert(v2.filter(col("k") === 20L).count() === 0)
    assert(v2.filter(col("k") === 900L).count() === 1)
    assert(v2.filter(col("k") === 950L).count() === 1,
      "ANSI: an unconditional INSERT * must insert the unmatched " +
        "delete-flagged row")
    // The CDC spelling gates the insert — the ghost is a no-op, which
    // is also the library API's DEFAULT contract (q346 pins that).
    val root2 = freshTable("txspec_sqlmerge_cdc")
    spark.sql(
      s"""MERGE INTO graft_tx.`$root2` AS t
         |USING graft_sqlmerge_delta AS s
         |ON t.k = s.k
         |WHEN MATCHED AND s.st = 'D' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED AND s.st <> 'D' THEN INSERT *""".stripMargin).collect()
    val w2 = TxTable.snapshot(spark, root2)
    assert(w2.count() === 800, "800 - 1 delete + 1 gated insert")
    assert(w2.filter(col("k") === 950L).count() === 0,
      "the AND-conditioned INSERT must gate out the ghost")
    assert(w2.filter(col("k") === 900L).count() === 1)
    // Unsupported shapes fail loudly, not silently diverge.
    intercept[Exception] {
      spark.sql(s"""MERGE INTO graft_tx.`$root` t USING graft_sqlmerge_delta s
        |ON t.c = s.c WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    }
    intercept[Exception] {
      spark.sql(s"""MERGE INTO graft_tx.`$root` t USING graft_sqlmerge_delta s
        |ON t.k = s.k WHEN MATCHED THEN UPDATE SET st = s.st
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    }
    // A non-graft_tx MERGE is untouched by the rule (fails resolution
    // downstream as before, never silently handled).
    intercept[Exception] {
      spark.sql("""MERGE INTO some_missing_table t USING graft_sqlmerge_delta s
        |ON t.k = s.k WHEN MATCHED THEN UPDATE SET *""".stripMargin).collect()
    }
  }

  test("SQL DELETE and UPDATE on graft_tx plan onto the library COW ops") {
    import spark.implicits._
    val root = freshTable("txspec_sqldml")
    // DELETE with an arbitrary predicate: keys resolved from the
    // snapshot, COW delete prunes to the touched buckets.
    val del = spark.sql(
      s"DELETE FROM graft_tx.`$root` WHERE k % 100 = 5 AND k < 300").collect()
    assert(del.length === 1 && del(0).getLong(0) === 3L,
      "keys 5/105/205 live in 3 buckets")
    val v2 = TxTable.snapshot(spark, root)
    assert(v2.count() === 797)
    assert(v2.filter(col("k").isin(5L, 105L, 205L)).count() === 0)
    // UPDATE: simultaneous assignment against the OLD row — st reads
    // the pre-update c, c doubles, both from the same old image.
    spark.sql(
      s"""UPDATE graft_tx.`$root`
         |SET st = concat('v', CAST(c AS STRING)), c = c * 2
         |WHERE k = 10""".stripMargin).collect()
    val r10 = TxTable.snapshot(spark, root).filter(col("k") === 10L).collect()(0)
    assert(r10.getString(1) === "v100", "st must read the OLD c (100)")
    assert(r10.getLong(2) === 200L, "c must double from the old value")
    assert(TxTable.snapshot(spark, root).count() === 797)
    // Guard rails: WHERE-less DELETE and key assignment refused.
    intercept[Exception] {
      spark.sql(s"DELETE FROM graft_tx.`$root`").collect()
    }
    intercept[Exception] {
      spark.sql(s"UPDATE graft_tx.`$root` SET k = k + 1 WHERE k = 1").collect()
    }
    assert(TxTable.snapshot(spark, root).count() === 797,
      "refused statements must not commit")
  }

  test("SQL SELECT over graft_tx relations: joins, @vN time travel, pruning intact") {
    import spark.implicits._
    val root = freshTable("txspec_sqlsel")
    TxTable.merge(spark, root, Seq((5L, "X", 999L)).toDF("k", "st", "c")) // v2
    // Plain SELECT resolves to the connector read.
    val now = spark.sql(
      s"SELECT k, st, c FROM graft_tx.`$root` WHERE k = 5").collect()
    assert(now.length === 1 && now(0).getString(1) === "X")
    // @vN time travel: the pre-merge image.
    val old = spark.sql(
      s"SELECT k, st, c FROM graft_tx.`$root@v1` WHERE k = 5").collect()
    assert(old.length === 1 && old(0).getString(1) === "A" &&
      old(0).getLong(2) === 50L)
    // Self-join across two versions of the same table, pure SQL.
    val changed = spark.sql(
      s"""SELECT count(*) FROM graft_tx.`$root` cur
         |JOIN graft_tx.`$root@v1` old ON cur.k = old.k
         |WHERE cur.st <> old.st""".stripMargin).collect()(0).getLong(0)
    assert(changed === 1L, "exactly the merged key differs across versions")
    // The key-range pushdown still prunes through the SQL door.
    val parts = spark.sql(
      s"SELECT k FROM graft_tx.`$root` WHERE k >= 700 AND k <= 750")
      .rdd.getNumPartitions
    val full = spark.sql(s"SELECT k FROM graft_tx.`$root`")
      .rdd.getNumPartitions
    assert(parts < full, s"SQL read must keep data skipping: $parts vs $full")
  }

  test("schema evolution: a widened append reads back with NULL backfill") {
    import spark.implicits._
    val root = freshTable("txspec_evo")
    TxTable.appendBatch(spark, root, "evo", 1L,
      Seq((2000L, "G2", 7L, "extra")).toDF("k", "st", "c", "tag"))
    val evolved = TxTable.snapshot(spark, root, mergeSchema = true)
    assert(evolved.columns.toSet === Set("k", "st", "c", "tag"))
    // Generation-1 rows backfill NULL; the new row round-trips its tag.
    assert(evolved.filter(col("tag").isNull).count() === 800)
    val g2 = evolved.filter(col("k") === 2000L).collect()(0)
    assert(g2.getAs[String]("tag") === "extra" && g2.getAs[String]("st") === "G2")
    // The un-merged read still serves the original schema's columns.
    assert(TxTable.snapshot(spark, root).select("k", "st", "c").count() === 801)
  }
}
