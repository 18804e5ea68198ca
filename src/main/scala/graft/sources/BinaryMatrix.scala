package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Raw headerless int32 matrix files — the reference's literal on-disk
  * format: `filecreation.c:26` writes the dense array row-major with
  * `fwrite(arr, sizeof(int), rows*cols, f)` (native endianness = little
  * on x86) into a file whose NAME carries the dimensions
  * (`Array_<rows>x<cols>_<k>.dat`, parsed by `program.c:34-43`).
  *
  * Scale shape: `binaryFile` is one task per file — a 100 TB corpus of
  * .dat files decodes embarrassingly parallel; a single unsplittable
  * blob is the reference's limitation, not the reader's. Dims come from
  * the path exactly as the reference's filename parse does, and the
  * byte slicing is genuine per-partition imperative work (the typed-API
  * carve-out of SURVEY §2.1) — ByteBuffer → (i, j, v) COO rows.
  */
object BinaryMatrix {

  /** Anchored on the 'Array_' filename prefix: an unanchored '_NxM_'
    * would match a data-dir segment earlier in the path
    * (regexp_extract takes the FIRST match) and poison the dims. */
  val DimsPattern = "Array_([0-9]+)x([0-9]+)_"

  /** Scan every `*.dat` under `dir` into COO `(i INT, j INT, v INT)`
    * rows, per-file dims from the filename. */
  def readCoo(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // pathGlobFilter, not a glob in the path: a glob path makes the
    // resolver's streaming-metadata probe log a spurious exception.
    s.read.format("binaryFile").option("pathGlobFilter", "*.dat").load(dir)
      .select(
        regexp_extract(col("path"), DimsPattern, 1).cast("int").as("rows"),
        regexp_extract(col("path"), DimsPattern, 2).cast("int").as("cols"),
        col("content"))
      .as[(Int, Int, Array[Byte])]
      .mapPartitions { (it: Iterator[(Int, Int, Array[Byte])]) =>
        it.flatMap { case (rows, cols, bytes) =>
          val ints = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN).asIntBuffer()
          Iterator.tabulate(rows * cols)(idx =>
            (idx / cols, idx % cols, ints.get(idx)))
        }
      }
      .toDF("i", "j", "v")
  }

  /** Write one matrix in the reference's exact format
    * (`filecreation.c:19-28`): headerless row-major int32,
    * little-endian, dims in the filename. `cell(id)` supplies the value
    * at flat row-major index id. */
  def write(outDir: String, rows: Int, cols: Int, tag: Int)(cell: Long => Int): java.nio.file.Path = {
    val bb = java.nio.ByteBuffer.allocate(rows * cols * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var id = 0L
    while (id < rows.toLong * cols) { bb.putInt(cell(id)); id += 1 }
    val parent = java.nio.file.Paths.get(outDir)
    java.nio.file.Files.createDirectories(parent)
    val p = parent.resolve(s"Array_${rows}x${cols}_$tag.dat")
    java.nio.file.Files.write(p, bb.array())
    p
  }

  /** Delete every `*.dat` under `dir` (stale fixtures from an earlier
    * run would be globbed in and union foreign rows into a read). */
  def clear(outDir: String): Unit = {
    val parent = java.nio.file.Paths.get(outDir)
    if (java.nio.file.Files.isDirectory(parent)) {
      val old = java.nio.file.Files.list(parent)
      try {
        import scala.jdk.CollectionConverters._
        old.iterator().asScala.filter(_.toString.endsWith(".dat"))
          .toSeq.foreach(java.nio.file.Files.deleteIfExists(_))
      } finally old.close()
    }
  }
}
