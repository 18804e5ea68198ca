package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Structured Streaming SOURCE over the [[TxTable]] commit log — the
  * read half of the lakehouse/streaming connection (q332 streams INTO
  * the table; this streams OUT of it, the Delta streaming-source
  * recipe). A DataSourceV2 [[MicroBatchStream]]:
  *
  *  - **Offsets are log versions.** `initialOffset` = startingVersion−1,
  *    `latestOffset` = the newest committed version; a micro-batch is
  *    the half-open version window (start, end]. Offsets land in the
  *    query checkpoint, and version → file mapping is immutable (the
  *    log is append-only), so restart resume is exactly-once by
  *    construction — the standard replayable-source contract.
  *  - **A batch reads ONLY the files its commits added** (never a
  *    snapshot): each data file in the window becomes one
  *    [[InputPartition]], read executor-side with the public
  *    parquet-hadoop `ParquetReader` — at 100 TB the per-trigger cost
  *    is the new appends, independent of table size.
  *  - **Change commits are rejected, not misread.** A commit with
  *    `remove` entries (merge/delete/OPTIMIZE) rewrites files whose
  *    rows are mostly OLD data; streaming them as fresh inserts would
  *    double-deliver. Default: fail the query (Delta's "detected a
  *    data update" error); `skipChangeCommits=true` skips them (the
  *    Delta option of the same name). Appends-after-a-skip still
  *    deliver.
  *  - Every row carries `commit_version` — the batch audit column.
  *
  * Options: `root` (required), `startingVersion` (first version
  * INCLUDED, default 1 — so the initial snapshot/create streams as the
  * first batch), `skipChangeCommits` (default false).
  *
  * Usage:
  * {{{
  *   spark.readStream.format("graft-txtable").option("root", root).load()
  * }}}
  */
class TxTableStreamSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-txtable"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TxTableStreamSource.StreamSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new TxStreamTable(properties)
}

object TxTableStreamSource {
  /** The TxTable row schema plus the per-row commit audit column. */
  val StreamSchema: StructType = new StructType()
    .add("k", LongType).add("st", StringType).add("c", LongType)
    .add("commit_version", LongType)

  private[sources] def required(props: JMap[String, String],
                                key: String): String = {
    val v = props.get(key)
    require(v != null && v.nonEmpty, s"graft-txtable needs option '$key'")
    v
  }

  /** Part files inside one committed data file (a parquet directory);
    * driver-side metadata listing, mirroring what a file index does.
    * Regular files only: TxTable data DIRECTORIES are themselves named
    * `*.parquet`, so a suffix filter alone would list the dir AND its
    * part files — every row delivered twice.
    */
  private[sources] def partFiles(dir: String): Seq[String] = {
    val p = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.isDirectory(p)) return Seq(dir)
    import scala.jdk.CollectionConverters._
    val st = java.nio.file.Files.walk(p)
    try st.iterator().asScala
      .filter(f => java.nio.file.Files.isRegularFile(f))
      .map(_.toString).filter(_.endsWith(".parquet")).toSeq.sorted
    finally st.close()
  }
}

private class TxStreamTable(props: JMap[String, String])
    extends Table with SupportsRead {
  private val root = TxTableStreamSource.required(props, "root")
  override def name(): String = s"graft_txtable_stream($root)"
  override def schema(): StructType = TxTableStreamSource.StreamSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new TxStreamScan(root,
        options.getBoolean("skipChangeCommits", false),
        options.getInt("startingVersion", 1),
        options.getInt("versionAsOf", Int.MaxValue))
    }
}

private class TxStreamScan(root: String, skipChangeCommits: Boolean,
                           startingVersion: Int, versionAsOf: Int)
    extends Scan {
  override def readSchema(): StructType = TxTableStreamSource.StreamSchema
  override def description(): String = s"graft-txtable $root"
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new TxTableMicroBatchStream(root, skipChangeCommits, startingVersion)
  // BATCH read with time travel (`versionAsOf`, default latest): the
  // snapshot's live files through the same partition/reader machinery
  // the stream uses — `spark.read.format("graft-txtable")` is the
  // connector surface a consumer actually points SQL at, and
  // commit_version labels each row with the commit that ADDED its
  // file (the log is the provenance, no per-row bookkeeping).
  override def toBatch(): Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val s = SparkSession.active
      val live = TxTable.liveFiles(s, root, versionAsOf).map(_.file).toSet
      // file → adding commit version, from the raw log (KBs).
      val addedBy = TxTable.commits(s, root, versionAsOf)
        .flatMap(c => c.add.map(f => f.file -> c.version)).toMap
      live.toSeq.sorted.flatMap(f =>
        TxTableStreamSource.partFiles(f)
          .map(p => TxFilePartition(p, addedBy(f)): InputPartition))
        .toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      TxReaderFactory
  }
}

/** A version-window offset; `json` is the bare version number. */
private[sources] case class TxOffset(v: Int) extends Offset {
  override def json(): String = v.toString
}

private[sources] class TxTableMicroBatchStream(
    root: String, skipChangeCommits: Boolean, startingVersion: Int)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private def session = SparkSession.active

  /** Trigger.AvailableNow contract: capture the newest version at
    * query start; every batch's end offset is clamped to it, so the
    * run drains exactly what existed when it was triggered and then
    * stops — commits landing mid-run wait for the next run.
    */
  private var availableNowTarget: Option[Int] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(TxTable.latestVersion(session, root))

  override def initialOffset(): Offset = TxOffset(startingVersion - 1)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val v = TxTable.latestVersion(session, root)
    TxOffset(availableNowTarget.fold(v)(t => math.min(v, t)))
  }
  override def latestOffset(): Offset =
    // Admission-control sources are driven through the 2-arg form.
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead")
  override def deserializeOffset(json: String): Offset = TxOffset(json.toInt)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (lo, hi) = (start.asInstanceOf[TxOffset].v, end.asInstanceOf[TxOffset].v)
    val window = TxTable.commits(session, root, hi).filter(_.version > lo)
    window.flatMap { c =>
      if (c.remove.nonEmpty) {
        if (!skipChangeCommits)
          throw new IllegalStateException(
            s"graft-txtable: version ${c.version} of $root is a CHANGE " +
            "commit (merge/delete/compaction rewrote files); streaming " +
            "it as inserts would double-deliver carried rows. Set " +
            "skipChangeCommits=true to skip change commits — note that " +
            "skipping loses rows the commit genuinely INSERTED too " +
            "(the whole commit is skipped, the Delta caveat) — or " +
            "stream row-level changes via TxTable.changeFeed.")
        Seq.empty // skipped WHOLE: carried rows AND any new inserts
      } else c.add.flatMap(f => TxTableStreamSource.partFiles(f.file)
        .map(p => TxFilePartition(p, c.version): InputPartition))
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = TxReaderFactory
}

private[sources] case class TxFilePartition(path: String, version: Int)
    extends InputPartition

/** Executor-side reader: one parquet part file → InternalRows, via the
  * public parquet-hadoop Group API (no Spark-internal reader needed —
  * the schema is the TxTable contract (k BIGINT, st STRING, c BIGINT),
  * so a 4-field row materializer covers every file the log can refer
  * to).
  */
private[sources] object TxReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[TxFilePartition]
    new PartitionReader[InternalRow] {
      private val reader = org.apache.parquet.hadoop.ParquetReader
        .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(),
          new org.apache.hadoop.fs.Path(p.path))
        .build()
      private var cur: org.apache.parquet.example.data.Group = _
      override def next(): Boolean = { cur = reader.read(); cur != null }
      // NULL-safe field access: the stream schema declares every
      // column nullable and nothing validates non-null on write, so a
      // NULL value must surface as a NULL row field, not a parquet
      // Group exception killing the query.
      private def longAt(f: String): Any =
        if (cur.getFieldRepetitionCount(f) == 0) null else cur.getLong(f, 0)
      private def stringAt(f: String): Any =
        if (cur.getFieldRepetitionCount(f) == 0) null
        else UTF8String.fromString(cur.getString(f, 0))
      override def get(): InternalRow = new GenericInternalRow(Array[Any](
        longAt("k"), stringAt("st"), longAt("c"), p.version.toLong))
      override def close(): Unit = reader.close()
    }
  }
}
