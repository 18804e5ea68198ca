package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal transactional table format: parquet data files + a JSON
  * commit log with per-file key statistics — the commit-log half the
  * relational MERGE/SCD/IVM queries (q192/q131/q217/q224/q297) were
  * missing (round-12 verdict, declared gap #3). Public design points
  * (the Delta/Iceberg papers and specs):
  *
  *  - **Log = source of truth.** `<root>/_log/<v>.json`, one JSON line
  *    per commit: `{"version":v,"add":[{file,min,max,rows}...],
  *    "remove":[file...]}`. A snapshot at version V is (all adds ≤ V)
  *    minus (all removes ≤ V) — reading the table never lists the data
  *    directory, so concurrent writers and readers see consistent
  *    versions and TIME TRAVEL is just "stop replaying at V".
  *  - **Copy-on-write MERGE with per-FILE pruning.** Each data file's
  *    commit entry records its key min/max. A merge rewrites ONLY the
  *    files that PROVABLY contain (or could contain) a delta key —
  *    membership is decided per file by probing the delta's keys
  *    against each live [min,max] (a broadcast range join, NOT a
  *    single global envelope: a delta touching two distant buckets
  *    rewrites two files, never the span between them). The rewritten
  *    output is re-split on the touched files' own boundaries — one
  *    commit entry per touched bucket — so repeated merges do NOT
  *    decay toward one wide-envelope file (Delta's COW file
  *    granularity). Delta rows whose keys fall outside every live
  *    range are inserts and land in the nearest rewritten bucket
  *    (envelopes are coarse: a widened envelope costs a future
  *    rewrite, never correctness).
  *  - **Optimistic concurrency.** The commit file is published with
  *    putIfAbsent semantics (hard-link-into-place fails atomically if
  *    the version already exists — the single-filesystem equivalent of
  *    Delta's putIfAbsent). A losing writer re-reads the new snapshot
  *    and recomputes against it; its orphaned data files stay
  *    unreferenced (exactly Delta's failed-txn debris, collectable by
  *    VACUUM). Data files carry a per-writer token so two writers
  *    racing on the same version number can never overwrite each
  *    other's parquet.
  *  - **Log checkpoints.** Every [[CheckpointInterval]] commits the
  *    full live-file state is summarized into `<v>.checkpoint.json`;
  *    snapshot replay reads the newest checkpoint ≤ V plus the commits
  *    after it, so replay cost is O(interval), not O(history). All
  *    commit JSONs are retained, so time travel to any version —
  *    including versions before the newest checkpoint — still works.
  *  - **Exactly-once streaming appends.** [[appendBatch]] records the
  *    micro-batch id inside the commit; a replayed batch (same id)
  *    is detected in the log and skipped, making foreachBatch +
  *    appendBatch an idempotent, exactly-once sink (the Delta
  *    txnAppId/txnVersion pattern).
  *  - **OPTIMIZE.** [[optimize]] bin-packs adjacent small live files
  *    into rewritten buckets as one new commit — file count drops,
  *    snapshot bit-identical (compaction is pure layout).
  *
  * The log is driver-side metadata (KBs per thousand commits — exactly
  * the Delta regime); data reads stay fully distributed parquet scans.
  * Schema is fixed per table at create time: (k BIGINT, st STRING,
  * c BIGINT) generalizes to any payload by swapping the case class —
  * kept concrete so the commit statistics stay typed and exact.
  */
object TxTable {

  case class FileEntry(file: String, min: Long, max: Long, rows: Long)
  /** `txnApp`/`batchId` identify an idempotent streaming append: the
    * pair (writer identity, micro-batch id), because batchIds restart
    * from 0 for every fresh checkpoint — batchId alone would make two
    * DIFFERENT sinks' batch 0 collide (the Delta txnAppId/txnVersion
    * pair, verbatim).
    */
  case class Commit(version: Int, add: Seq[FileEntry], remove: Seq[String],
                    txnApp: Option[String] = None, batchId: Option[Long] = None)

  /** Thrown by [[tryCommit]] when the target version already exists —
    * the optimistic-concurrency conflict signal. Writers catch it,
    * re-read the (now newer) snapshot, and recompute.
    */
  final class CommitConflictException(version: Int)
    extends RuntimeException(s"version $version already committed")

  /** A checkpoint every 8 commits keeps replay O(8) JSON files while
    * staying frequent enough that the spec exercises it at tiny commit
    * counts; a production table would use Delta's default of 10.
    */
  val CheckpointInterval = 8

  private def logDir(root: String) = s"$root/_log"
  private def dataDir(root: String) = s"$root/data"

  /** Publish commit `c` with putIfAbsent semantics: the content is
    * written to a uniquely-named temp file, then HARD-LINKED into
    * place — link creation fails atomically (POSIX) if `<v>.json`
    * already exists, so exactly one of two racing writers wins.
    * Package-private so TxTableSpec can force a collision.
    */
  private[graft] def tryCommit(root: String, c: Commit): Unit = {
    import graft.JsonOut.q
    val adds = c.add.map(f =>
      s"""{"file":${q(f.file)},"min":${f.min},"max":${f.max},"rows":${f.rows}}""")
      .mkString("[", ",", "]")
    val rms = c.remove.map(q).mkString("[", ",", "]")
    val txn = (c.txnApp, c.batchId) match {
      case (Some(a), Some(b)) => s""","txnApp":${q(a)},"batchId":$b"""
      case _ => ""
    }
    val json = s"""{"version":${c.version},"add":$adds,"remove":$rms$txn}"""
    val dir = java.nio.file.Paths.get(logDir(root))
    java.nio.file.Files.createDirectories(dir)
    val tmp = dir.resolve(s".${c.version}-${java.util.UUID.randomUUID()}.tmp")
    java.nio.file.Files.writeString(tmp, json)
    try {
      // createLink = atomic fail-if-exists (rename would silently
      // REPLACE an existing commit — the last-rename-wins race).
      java.nio.file.Files.createLink(dir.resolve(s"${c.version}.json"), tmp)
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new CommitConflictException(c.version)
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }

  /** Commit-log filenames present under root, split (commits,
    * checkpoints) — pure directory metadata, no JSON parsed.
    */
  private def logVersions(root: String): (Seq[Int], Seq[Int]) = {
    val dir = java.nio.file.Paths.get(logDir(root))
    if (!java.nio.file.Files.isDirectory(dir)) return (Seq.empty, Seq.empty)
    import scala.jdk.CollectionConverters._
    val names = {
      val st = java.nio.file.Files.list(dir)
      try st.iterator().asScala.map(_.getFileName.toString).toSeq
      finally st.close()
    }
    val ckpts = names.filter(_.endsWith(".checkpoint.json"))
      .map(_.stripSuffix(".checkpoint.json").toInt).sorted
    val commits = names.filter(n => n.endsWith(".json") && !n.endsWith(".checkpoint.json"))
      .map(_.stripSuffix(".json").toInt).sorted
    (commits, ckpts)
  }

  /** Parse a set of commit/checkpoint JSON files (tiny driver-side
    * metadata; Spark's own JSON reader handles the schema). An
    * all-empty JSON array infers as array<string> (or drops), so field
    * access is guarded by the inferred schema, not assumed.
    */
  private def parseCommits(s: SparkSession, paths: Seq[String]): Seq[Commit] = {
    if (paths.isEmpty) return Seq.empty
    val df = s.read.json(paths: _*)
    val cols = df.columns.toSet
    df.collect().map { r =>
      val adds =
        if (!cols("add") || r.isNullAt(r.fieldIndex("add"))) Seq.empty[FileEntry]
        else r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("add")
          .map(a => FileEntry(a.getAs[String]("file"), a.getAs[Long]("min"),
            a.getAs[Long]("max"), a.getAs[Long]("rows"))).toSeq
      val rms =
        if (!cols("remove") || r.isNullAt(r.fieldIndex("remove")))
          Seq.empty[String]
        else r.getAs[scala.collection.Seq[String]]("remove").toSeq
      val app =
        if (!cols("txnApp") || r.isNullAt(r.fieldIndex("txnApp"))) None
        else Some(r.getAs[String]("txnApp"))
      val bid =
        if (!cols("batchId") || r.isNullAt(r.fieldIndex("batchId"))) None
        else Some(r.getAs[Long]("batchId"))
      Commit(r.getAs[Long]("version").toInt, adds, rms, app, bid)
    }.sortBy(_.version)
  }

  /** Replay the raw log up to `version` (Int.MaxValue = latest) — the
    * full history, checkpoint-free (audit / batchId-scan path; the
    * snapshot path goes through [[liveFiles]]' checkpoint shortcut).
    */
  def commits(s: SparkSession, root: String,
              version: Int = Int.MaxValue): Seq[Commit] = {
    val (vs, _) = logVersions(root)
    parseCommits(s, vs.filter(_ <= version).map(v => s"${logDir(root)}/$v.json"))
  }

  /** Live file entries at `version`, via the newest checkpoint ≤
    * version (replay cost O(CheckpointInterval), not O(history)).
    */
  def liveFiles(s: SparkSession, root: String,
                version: Int = Int.MaxValue): Seq[FileEntry] = {
    val (vs, ckpts) = logVersions(root)
    val ckpt = ckpts.filter(_ <= version).lastOption
    val basePaths = ckpt.map(v => s"${logDir(root)}/$v.checkpoint.json").toSeq
    val tailPaths = vs.filter(v => v <= version && v > ckpt.getOrElse(0))
      .map(v => s"${logDir(root)}/$v.json")
    val cs = parseCommits(s, basePaths ++ tailPaths)
    val removed = cs.flatMap(_.remove).toSet
    cs.flatMap(_.add).filterNot(f => removed(f.file))
  }

  /** Latest committed version (0 = no table) — filename metadata only,
    * no JSON parsed.
    */
  def latestVersion(s: SparkSession, root: String): Int =
    logVersions(root)._1.lastOption.getOrElse(0)

  /** Snapshot read at `version` — a plain distributed parquet scan of
    * exactly the live files (TIME TRAVEL: pass an older version).
    * `mergeSchema` unifies files written under different schema
    * generations (SCHEMA EVOLUTION: a widened append's new column
    * reads as NULL from pre-widening files). A production format
    * records the schema in the log itself (Delta's metaData action)
    * so reads never touch N footers; merging footers here keeps the
    * minimal format honest about what the files actually contain —
    * and the file count is log-scale metadata either way.
    */
  def snapshot(s: SparkSession, root: String,
               version: Int = Int.MaxValue,
               mergeSchema: Boolean = false): DataFrame = {
    val files = liveFiles(s, root, version)
    require(files.nonEmpty, s"TxTable at $root has no live files at v$version")
    val r = s.read
    (if (mergeSchema) r.option("mergeSchema", "true") else r)
      .parquet(files.map(_.file): _*)
  }

  /** After committing `v`, summarize the live state into
    * `<v>.checkpoint.json` when the interval divides v. Checkpoints
    * are DERIVED (recomputable from the raw log), so plain
    * write-then-rename is fine — a racing duplicate writes identical
    * content.
    */
  private def maybeCheckpoint(s: SparkSession, root: String, v: Int): Unit =
    if (v % CheckpointInterval == 0) {
      import graft.JsonOut.q
      val live = commits(s, root, v) match {
        case cs =>
          val removed = cs.flatMap(_.remove).toSet
          cs.flatMap(_.add).filterNot(f => removed(f.file))
      }
      val adds = live.map(f =>
        s"""{"file":${q(f.file)},"min":${f.min},"max":${f.max},"rows":${f.rows}}""")
        .mkString("[", ",", "]")
      val json = s"""{"version":$v,"add":$adds,"remove":[]}"""
      val dir = java.nio.file.Paths.get(logDir(root))
      val tmp = dir.resolve(s".$v-${java.util.UUID.randomUUID()}.ckpt.tmp")
      java.nio.file.Files.writeString(tmp, json)
      java.nio.file.Files.move(tmp, dir.resolve(s"$v.checkpoint.json"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }

  /** Write `df` (k, st, c) bucketed into `nBuckets` key-range files and
    * commit as version 1. Wipes any prior table at `root`. One
    * partitioned write + one stats aggregate — NOT a filtered write per
    * bucket (that shape scans the source nBuckets times; at 100 TB the
    * initial layout job must be a single pass).
    */
  def create(df: DataFrame, root: String, nBuckets: Int): Unit = {
    wipe(root)
    val d = df.localCheckpoint(false) // bounds + stats + write share one materialization
    val Array(lo, hi) = d.agg(min("k"), max("k")).collect()(0) match {
      case r => Array(r.getLong(0), r.getLong(1))
    }
    val width = math.max(1L, (hi - lo) / nBuckets + 1)
    val path = s"${dataDir(root)}/v1"
    // Integer division (Spark `/` on longs is DOUBLE division, which
    // could misbucket near 2^53 — the verify-skill q249 gotcha).
    val bucketed = d.withColumn("__b",
      expr(s"CAST((k - ${lo}L) div ${width}L AS INT)"))
    // partitionBy moves __b into the directory name; reading one
    // subdir back yields exactly (k, st, c).
    bucketed.write.partitionBy("__b").mode("overwrite").parquet(path)
    val entries = bucketed.groupBy("__b")
      .agg(min("k").as("mn"), max("k").as("mx"), count(lit(1)).as("n"))
      .collect()
      .map(r => FileEntry(s"$path/__b=${r.getInt(0)}",
        r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_.min).toSeq
    tryCommit(root, Commit(1, entries, Seq.empty))
  }

  /** Exact per-file pruning: which live files contain at least one
    * delta key? One broadcast range join of the delta's keys against
    * the (metadata-sized) live-file ranges — file count is log-scale
    * even at 100 TB, so the ranges side always broadcasts; the delta
    * side streams distributed.
    */
  private def touchedFiles(s: SparkSession, delta: DataFrame,
                           live: Seq[FileEntry]): Set[String] = {
    import s.implicits._
    val ranges = live.map(f => (f.file, f.min, f.max)).toDF("f", "mn", "mx")
    delta.select(col("k"))
      .join(broadcast(ranges), col("k") >= col("mn") && col("k") <= col("mx"))
      .select("f").distinct().collect().map(_.getString(0)).toSet
  }

  /** Copy-on-write upsert: delta rows replace same-key rows, new keys
    * insert. Only live files that actually CONTAIN a delta key are
    * rewritten (exact per-file membership, not a global envelope); the
    * rest carry over. The rewritten output is re-split on the touched
    * files' own min-boundaries — one commit entry per touched bucket —
    * so chained merges preserve file granularity. Optimistically
    * commits version latest+1, retrying against the new snapshot on a
    * concurrent-writer collision. Returns (rewritten, carriedOver)
    * file counts for spec-level pruning assertions.
    */
  def merge(s: SparkSession, root: String, delta: DataFrame): (Int, Int) =
    // Upsert = MERGE INTO whose delete clause never fires; one copy of
    // the prune/rewrite/OCC loop to maintain. (delete() keeps its own
    // loop on purpose: its anti-join plan and touched-nothing
    // early-return are genuinely different shapes.)
    mergeInto(s, root, delta, deleteWhen = lit(false))

  /** Full MERGE INTO clause semantics in ONE atomic commit — what
    * [[merge]] (upsert-only) and [[delete]] compose as TWO commits,
    * collapsed into the single transaction real MERGE INTO is:
    *
    *  - WHEN MATCHED AND `deleteWhen`(delta row) THEN DELETE
    *  - WHEN MATCHED THEN UPDATE (delta wins)
    *  - WHEN NOT MATCHED THEN INSERT (delete-flagged delta rows with
    *    no match are a no-op, per the standard clause ordering)
    *
    * Same exact per-file pruning and per-bucket rewrite as [[merge]];
    * same optimistic-concurrency retry. A reader never observes the
    * intermediate "updated but not yet deleted" state two commits
    * would expose. Returns (rewritten, carriedOver) file counts.
    *
    * @param deleteWhen predicate over the DELTA row's columns
    *                   (k/st/c), the WHEN MATCHED AND … THEN DELETE
    *                   condition
    */
  def mergeInto(s: SparkSession, root: String, delta: DataFrame,
                deleteWhen: org.apache.spark.sql.Column): (Int, Int) = {
    val d = delta.localCheckpoint(false)
    while (true) {
      val v = latestVersion(s, root) + 1
      val live = liveFiles(s, root)
      val hit = touchedFiles(s, d, live)
      val (touched, untouched) = live.partition(f => hit(f.file))
      val base =
        if (touched.isEmpty) null
        else s.read.parquet(touched.map(_.file): _*)
      // NULL condition = not satisfied (SQL MERGE semantics): without
      // the coalesce, a NULL predicate result would three-value its
      // way through !ddel into a SILENT DELETE of the matched row.
      val dd = d.select(col("k").as("dk"), col("st").as("dst"),
        col("c").as("dc"), coalesce(deleteWhen, lit(false)).as("ddel"))
      val merged =
        (if (base == null)
           dd.filter(!col("ddel"))
             .select(col("dk").as("k"), col("dst").as("st"), col("dc").as("c"))
         else base.join(dd, col("k") === col("dk"), "full_outer")
           // matched + delete-flagged rows drop here — atomically with
           // the updates and inserts of the same commit.
           .filter(col("k").isNull || col("dk").isNull || !col("ddel"))
           .filter(!(col("k").isNull && col("ddel"))) // unmatched delete = no-op
           .select(coalesce(col("dk"), col("k")).as("k"),
             coalesce(col("dst"), col("st")).as("st"),
             coalesce(col("dc"), col("c")).as("c")))
      val entries = writeBucketed(merged, root, v, touched.map(_.min).sorted)
      try {
        tryCommit(root, Commit(v, entries, touched.map(_.file)))
        maybeCheckpoint(s, root, v)
        return (touched.size, untouched.size)
      } catch {
        case _: CommitConflictException => () // loser: recompute against the new snapshot
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Copy-on-write DELETE by key: rows whose `k` appears in `keys`
    * are removed; only live files that actually CONTAIN a matching
    * key are rewritten (the same exact per-file pruning as [[merge]]),
    * re-split on the touched files' own boundaries. Optimistically
    * commits, retrying on a concurrent-writer collision. Returns
    * (rewritten, carriedOver) file counts.
    */
  def delete(s: SparkSession, root: String, keys: DataFrame): (Int, Int) = {
    val d = keys.select(col("k")).distinct().localCheckpoint(false)
    while (true) {
      val v = latestVersion(s, root) + 1
      val live = liveFiles(s, root)
      val hit = touchedFiles(s, d, live)
      val (touched, untouched) = live.partition(f => hit(f.file))
      if (touched.isEmpty) return (0, untouched.size)
      val remaining = s.read.parquet(touched.map(_.file): _*)
        .join(d, Seq("k"), "left_anti")
      val entries = writeBucketed(remaining, root, v, touched.map(_.min).sorted)
      try {
        tryCommit(root, Commit(v, entries, touched.map(_.file)))
        maybeCheckpoint(s, root, v)
        return (touched.size, untouched.size)
      } catch {
        case _: CommitConflictException => () // loser: recompute against the new snapshot
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Row-level CHANGE DATA FEED between two versions — what changed
    * from `vFrom` to `vTo`, reconstructed from the COW file diff (the
    * Delta CDF-without-CDC-files recipe): files live at `vTo` but not
    * `vFrom` hold every post-image, files live at `vFrom` but not
    * `vTo` every pre-image, and files live at BOTH are untouched and
    * provably change-free (the COW invariant: any changed key's file
    * was rewritten). So the feed reads ONLY touched files — at 100 TB
    * a narrow merge's feed scans two buckets, never two snapshots —
    * and a full-outer key join classifies: new-side-only = insert,
    * old-side-only = delete, both-identical = a carried-over row
    * inside a rewritten file (filtered out), and
    * both-with-different-payload emits TWO rows — `update_pre` (the
    * pre-image) and `update_post` (the post-image), the Delta CDF
    * pair. Pre-images are what make the feed ALGEBRAIC: a downstream
    * aggregate is maintained by adding insert/update_post rows and
    * subtracting delete/update_pre rows (incremental view
    * maintenance, q349) — a post-only feed cannot retract the old
    * contribution. The pair is emitted by exploding a per-match
    * 1-or-2-element array, so classification stays a single pass over
    * the join (no second scan, no checkpoint).
    */
  def changeFeed(s: SparkSession, root: String,
                 vFrom: Int, vTo: Int): DataFrame = {
    require(vFrom < vTo, s"changeFeed needs vFrom < vTo (got $vFrom, $vTo)")
    val before = liveFiles(s, root, vFrom).map(_.file).toSet
    val after = liveFiles(s, root, vTo).map(_.file).toSet
    def rd(fs: Seq[String]) =
      if (fs.nonEmpty) s.read.parquet(fs: _*)
      // Zero-file side (pure-insert or pure-delete window): an empty
      // frame with the table schema keeps the join well-typed.
      else s.range(0).select(col("id").as("k"),
        lit("").as("st"), col("id").as("c"))
    val o = rd((before -- after).toSeq.sorted).select(
      col("k").as("ok"), col("st").as("ost"), col("c").as("oc"))
    val n = rd((after -- before).toSeq.sorted).select(
      col("k").as("nk"), col("st").as("nst"), col("c").as("nc"))
    def ev(ct: String, k: org.apache.spark.sql.Column,
           st: org.apache.spark.sql.Column, c: org.apache.spark.sql.Column) =
      struct(lit(ct).as("change_type"), k.as("k"), st.as("st"), c.as("c"))
    o.join(n, col("ok") === col("nk"), "full_outer")
      .select(explode(
        when(col("ok").isNull,
          array(ev("insert", col("nk"), col("nst"), col("nc"))))
        .when(col("nk").isNull,
          array(ev("delete", col("ok"), col("ost"), col("oc"))))
        .when(col("ost") <=> col("nst") && col("oc") <=> col("nc"),
          array().cast(
            "array<struct<change_type:string,k:bigint,st:string,c:bigint>>"))
        .otherwise(array(
          ev("update_pre", col("ok"), col("ost"), col("oc")),
          ev("update_post", col("nk"), col("nst"), col("nc"))))).as("e"))
      .select(col("e.change_type"), col("e.k"), col("e.st"), col("e.c"))
  }

  /** Idempotent streaming append: commit `df` as new files keyed by
    * (writer identity, micro-batch id). A replayed batch (same pair
    * already in the log) is a no-op — the exactly-once contract for a
    * foreachBatch sink (Delta's txnAppId/txnVersion pattern; the txn
    * scan reads the full raw log, KBs of driver metadata, because a
    * batch may predate the newest checkpoint). Returns true iff this
    * call committed.
    */
  def appendBatch(s: SparkSession, root: String, appId: String,
                  batchId: Long, df: DataFrame): Boolean = {
    def seen() = commits(s, root)
      .exists(c => c.txnApp.contains(appId) && c.batchId.contains(batchId))
    if (seen()) return false
    val d = df.localCheckpoint(false)
    while (true) {
      val v = latestVersion(s, root) + 1
      val entries = writeFile(d, root, v, freshToken(), idx = 0).toSeq
      try {
        tryCommit(root, Commit(v, entries, Seq.empty, Some(appId), Some(batchId)))
        maybeCheckpoint(s, root, v)
        return true
      } catch {
        case _: CommitConflictException =>
          // Re-check idempotency: the winner might have been THIS batch
          // from another attempt.
          if (seen()) return false
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Compaction (OPTIMIZE): bin-pack adjacent (by key range) live
    * files whose row counts sum to ≤ `targetRows` and rewrite each
    * multi-file group as one file, in one new commit. Pure layout —
    * the snapshot is bit-identical before/after; file count drops.
    * Returns (filesCompacted, filesProduced); (0, 0) when nothing
    * qualifies.
    */
  def optimize(s: SparkSession, root: String, targetRows: Long): (Int, Int) = {
    while (true) {
      val v = latestVersion(s, root) + 1
      val live = liveFiles(s, root).sortBy(f => (f.min, f.file))
      // Greedy adjacent packing: a group closes when adding the next
      // file would exceed the target. Only groups of ≥2 are rewritten.
      val groups = live.foldLeft(List.empty[List[FileEntry]]) {
        case (acc, f) => acc match {
          case g :: rest if g.map(_.rows).sum + f.rows <= targetRows =>
            (f :: g) :: rest
          case _ => List(f) :: acc
        }
      }.map(_.reverse).reverse.filter(_.size > 1)
      if (groups.isEmpty) return (0, 0)
      val token = freshToken()
      val entries = groups.zipWithIndex.flatMap { case (g, i) =>
        writeFile(s.read.parquet(g.map(_.file): _*), root, v, token, idx = i)
      }
      try {
        tryCommit(root, Commit(v, entries, groups.flatten.map(_.file)))
        maybeCheckpoint(s, root, v)
        return (groups.map(_.size).sum, entries.size)
      } catch {
        case _: CommitConflictException => () // recompute against the new snapshot
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Garbage collection (VACUUM): delete data files referenced by NO
    * snapshot within the newest `retainVersions` versions — both files
    * removed by old merges/compactions AND orphaned debris from failed
    * or losing optimistic writers (which never made it into the log at
    * all). Time travel to versions older than the retention window
    * stops working afterward — exactly Delta's retention contract; the
    * commit JSONs themselves are kept (driver-side KBs) so the log
    * remains auditable. Returns the number of paths deleted.
    */
  def vacuum(s: SparkSession, root: String, retainVersions: Int): Int = {
    require(retainVersions >= 1, "must retain at least the latest version")
    val latest = latestVersion(s, root)
    if (latest == 0) return 0
    val keepFrom = math.max(1, latest - retainVersions + 1)
    val referenced = (keepFrom to latest)
      .flatMap(v => liveFiles(s, root, v).map(_.file)).toSet
    // Dead logged files: every path the log ever added, minus the
    // retained snapshots' references.
    val deadLogged = commits(s, root).flatMap(_.add).map(_.file).toSet -- referenced
    // Orphan debris: dataDir children whose subtree contains no
    // referenced path AND that the log never recorded (a losing
    // writer's data files). Checked at child granularity so a parent
    // dir (create's v1/) holding live bucket subdirs is never touched.
    val dd = java.nio.file.Paths.get(dataDir(root))
    val orphans =
      if (!java.nio.file.Files.isDirectory(dd)) Seq.empty[String]
      else {
        import scala.jdk.CollectionConverters._
        val logged = commits(s, root).flatMap(_.add).map(_.file).toSet
        val st = java.nio.file.Files.list(dd)
        val children = try st.iterator().asScala.map(_.toString).toSeq
                       finally st.close()
        children.filter { c =>
          val covers = (p: String) => p == c || p.startsWith(c + "/")
          !referenced.exists(covers) && !logged.exists(covers)
        }
      }
    // Only count paths still on disk — dead LOG entries persist
    // forever (the log is append-only), so without this filter a
    // second vacuum would re-report the same long-gone files.
    val dead = (deadLogged ++ orphans).toSeq.distinct
      .filter(p => java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
    dead.foreach(p => wipe(p))
    dead.size
  }

  /** Per-writer uniquifier for data-file paths: two writers racing on
    * the same version number must never overwrite each other's
    * parquet (the loser's files become unreferenced debris, exactly
    * Delta's failed-txn semantics — collectable by [[vacuum]]).
    */
  private def freshToken(): String =
    java.util.UUID.randomUUID().toString.take(8)

  /** Write the merged output split on the touched buckets' own
    * min-boundaries — one data file (and commit entry) per non-empty
    * bucket, each with exact recomputed key stats. Rows below the
    * first boundary land in bucket 0, above the last in the final
    * bucket (inserts widen an envelope; they never lose rows). With
    * ≤1 boundary this degrades to a single file.
    */
  private def writeBucketed(part: DataFrame, root: String, version: Int,
                            boundaries: Seq[Long]): Seq[FileEntry] = {
    val token = freshToken()
    if (boundaries.size <= 1)
      return writeFile(part, root, version, token, idx = 0).toSeq
    // __b = number of interior boundaries ≤ k, giving 0..m-1 — a pure
    // comparison sum (codegen'd), no UDF.
    val bCol = boundaries.tail
      .map(b => when(col("k") >= lit(b), 1).otherwise(0))
      .reduce(_ + _)
    val bucketed = part.withColumn("__b", bCol).localCheckpoint(false)
    val path = s"${dataDir(root)}/v$version-$token"
    bucketed.write.partitionBy("__b").mode("overwrite").parquet(path)
    bucketed.groupBy("__b")
      .agg(min("k").as("mn"), max("k").as("mx"), count(lit(1)).as("n"))
      .collect()
      .map(r => FileEntry(s"$path/__b=${r.getInt(0)}",
        r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_.min).toSeq
  }

  /** One data file (a parquet directory) + its commit entry; empty
    * inputs produce no file, mirroring real commit protocols.
    */
  private def writeFile(part: DataFrame, root: String, version: Int,
                        token: String, idx: Int): Option[FileEntry] = {
    val stats = part.agg(count(lit(1)), min("k"), max("k")).collect()(0)
    if (stats.getLong(0) == 0L) None
    else {
      val path = s"${dataDir(root)}/v$version-$token-$idx.parquet"
      part.write.mode("overwrite").parquet(path)
      Some(FileEntry(path, stats.getLong(1), stats.getLong(2), stats.getLong(0)))
    }
  }

  def wipe(root: String): Unit = {
    val p = java.nio.file.Paths.get(root)
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val st = java.nio.file.Files.walk(p)
      try st.iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally st.close()
    }
  }
}
