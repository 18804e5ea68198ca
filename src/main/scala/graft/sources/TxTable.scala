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
  *  - **Copy-on-write MERGE with file pruning.** Each data file's
  *    commit entry records its key min/max. A merge rewrites ONLY the
  *    files whose [min,max] overlaps the delta's key envelope —
  *    non-overlapping files PROVABLY contain no delta key and carry
  *    over untouched (at 100 TB this is the difference between
  *    rewriting a partition and rewriting the table; the envelope is
  *    coarse — a false-positive overlap costs a rewrite, never
  *    correctness). Delta rows whose keys fall outside every live
  *    range are inserts and land in the rewritten output through the
  *    same full-outer merge.
  *  - **Atomicity by rename-into-place of the commit file** (the
  *    single-filesystem simplification of Delta's putIfAbsent): data
  *    files are written first, the commit json last, so a reader
  *    never sees a version whose files aren't complete.
  *
  * The log is driver-side metadata (KBs per thousand commits — exactly
  * the Delta regime); data reads stay fully distributed parquet scans.
  * Schema is fixed per table at create time: (k BIGINT, st STRING,
  * c BIGINT) generalizes to any payload by swapping the case class —
  * kept concrete so the commit statistics stay typed and exact.
  */
object TxTable {

  case class FileEntry(file: String, min: Long, max: Long, rows: Long)
  case class Commit(version: Int, add: Seq[FileEntry], remove: Seq[String])

  private def logDir(root: String) = s"$root/_log"
  private def dataDir(root: String) = s"$root/data"

  private def writeCommit(root: String, c: Commit): Unit = {
    import graft.JsonOut.q
    val adds = c.add.map(f =>
      s"""{"file":${q(f.file)},"min":${f.min},"max":${f.max},"rows":${f.rows}}""")
      .mkString("[", ",", "]")
    val rms = c.remove.map(q).mkString("[", ",", "]")
    val json = s"""{"version":${c.version},"add":$adds,"remove":$rms}"""
    val dir = java.nio.file.Paths.get(logDir(root))
    java.nio.file.Files.createDirectories(dir)
    // Write-then-rename: the commit becomes visible atomically, after
    // its data files exist.
    val tmp = dir.resolve(s".${c.version}.json.tmp")
    java.nio.file.Files.writeString(tmp, json)
    java.nio.file.Files.move(tmp, dir.resolve(s"${c.version}.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Replay the log up to `version` (Int.MaxValue = latest). */
  def commits(s: SparkSession, root: String,
              version: Int = Int.MaxValue): Seq[Commit] = {
    val dir = java.nio.file.Paths.get(logDir(root))
    if (!java.nio.file.Files.isDirectory(dir)) return Seq.empty
    import scala.jdk.CollectionConverters._
    val versions = java.nio.file.Files.list(dir).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toInt).filter(_ <= version).toSeq.sorted
    if (versions.isEmpty) return Seq.empty
    // The log is tiny driver-side metadata; Spark's own JSON reader
    // parses it (schema inferred from the commit shape).
    val df = s.read.json(versions.map(v => s"${logDir(root)}/$v.json"): _*)
    // An all-empty JSON array infers as array<string> (or drops), so
    // field access is guarded by the inferred schema, not assumed.
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
      Commit(r.getAs[Long]("version").toInt, adds, rms)
    }.sortBy(_.version)
  }

  /** Live file entries at `version`. */
  def liveFiles(s: SparkSession, root: String,
                version: Int = Int.MaxValue): Seq[FileEntry] = {
    val cs = commits(s, root, version)
    val removed = cs.flatMap(_.remove).toSet
    cs.flatMap(_.add).filterNot(f => removed(f.file))
  }

  /** Latest committed version (0 = no table). */
  def latestVersion(s: SparkSession, root: String): Int =
    commits(s, root).lastOption.map(_.version).getOrElse(0)

  /** Snapshot read at `version` — a plain distributed parquet scan of
    * exactly the live files (TIME TRAVEL: pass an older version).
    */
  def snapshot(s: SparkSession, root: String,
               version: Int = Int.MaxValue): DataFrame = {
    val files = liveFiles(s, root, version)
    require(files.nonEmpty, s"TxTable at $root has no live files at v$version")
    s.read.parquet(files.map(_.file): _*)
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
    writeCommit(root, Commit(1, entries, Seq.empty))
  }

  /** Copy-on-write upsert: delta rows replace same-key rows, new keys
    * insert. Only live files whose [min,max] overlaps the delta's key
    * envelope are rewritten; the rest carry over. Commits version
    * latest+1 and returns (rewritten, carriedOver) file counts for
    * spec-level pruning assertions.
    */
  def merge(s: SparkSession, root: String, delta: DataFrame): (Int, Int) = {
    val v = latestVersion(s, root) + 1
    val live = liveFiles(s, root)
    val d = delta.localCheckpoint(false)
    val Array(dlo, dhi) = d.agg(min("k"), max("k")).collect()(0) match {
      case r => Array(r.getLong(0), r.getLong(1))
    }
    val (touched, untouched) = live.partition(f => f.max >= dlo && f.min <= dhi)
    val base =
      if (touched.isEmpty) null
      else s.read.parquet(touched.map(_.file): _*)
    // Full-outer upsert: delta wins on key collision; base-only rows
    // carry; delta-only rows (including keys beyond every live range)
    // insert.
    val dd = d.select(col("k").as("dk"), col("st").as("dst"), col("c").as("dc"))
    val merged =
      (if (base == null) dd.select(col("dk").as("k"), col("dst").as("st"), col("dc").as("c"))
       else base.join(dd, col("k") === col("dk"), "full_outer")
         .select(coalesce(col("k"), col("dk")).as("k"),
           coalesce(col("dst"), col("st")).as("st"),
           coalesce(col("dc"), col("c")).as("c")))
    val entries = writeFile(merged, root, v, idx = 0).toSeq
    writeCommit(root, Commit(v, entries, touched.map(_.file)))
    (touched.size, untouched.size)
  }

  /** One data file (a parquet directory) + its commit entry; empty
    * partitions produce no file, mirroring real commit protocols.
    */
  private def writeFile(part: DataFrame, root: String, version: Int,
                        idx: Int): Option[FileEntry] = {
    val stats = part.agg(count(lit(1)), min("k"), max("k")).collect()(0)
    if (stats.getLong(0) == 0L) None
    else {
      val path = s"${dataDir(root)}/v$version-$idx.parquet"
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
