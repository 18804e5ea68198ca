package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: media as opaque `BINARY` plus typed metadata,
  * with decode / feature-extract as per-partition batch functions
  * (SURVEY.md §2.2 "multimodal columns").
  *
  * The Spark-side plumbing is real — schema, partition-batch iterator
  * shape, feature struct — while the actual codec is a clearly-marked
  * deterministic STUB ([[decodeStub]]): image/audio libraries aren't in
  * this container, and a codec is a library concern, not an engine one.
  * Swapping the stub for a real decoder changes zero plan shape: it
  * stays a narrow `mapPartitions` (one batch iterator per partition, the
  * Scala analog of `mapInPandas`), so decode parallelism = partition
  * count and no shuffle is introduced.
  */
object Multimodal {

  /** Feature row produced per media blob. */
  case class MediaFeatures(doc_id: Long, n_bytes: Int, width: Int, height: Int,
                           frames: Array[Long])

  /** STUB codec: deterministic pseudo-decode of a media blob.
    * Real implementation would parse the container format; the stub
    * derives "dimensions" from blob length and "frame hashes" from
    * byte slices, keeping every downstream operator testable.
    */
  def decodeStub(docId: Long, media: Array[Byte], frameCount: Int): MediaFeatures = {
    val n = media.length
    val frames = Array.tabulate(frameCount) { f =>
      val start = if (n == 0) 0 else (f * n / frameCount)
      val end = if (n == 0) 0 else math.min(n, start + math.max(1, n / frameCount))
      media.slice(start, end).foldLeft(7L)((acc, b) => acc * 131 + (b & 0xff))
    }
    MediaFeatures(docId, n, n % 1920, n % 1080, frames)
  }

  /** STUB resize: deterministic downscale of decoded dimensions to fit
    * a bounding box, preserving aspect ratio (integer math only). A
    * real implementation would resample pixels; the engine-relevant
    * part — a pure per-row transform that composes with
    * [[extractFeatures]] without adding a shuffle — is real.
    */
  def resizeStub(f: MediaFeatures, maxW: Int, maxH: Int): MediaFeatures = {
    val w = math.max(1, f.width); val h = math.max(1, f.height)
    if (w <= maxW && h <= maxH) f.copy(width = w, height = h) // never upscale
    else {
      val scaleNum = math.min(maxW.toLong * h, maxH.toLong * w)
      val scaleDen = w.toLong * h
      val nw = math.max(1, (w * scaleNum / scaleDen).toInt)
      val nh = math.max(1, (h * scaleNum / scaleDen).toInt)
      f.copy(width = math.min(nw, maxW), height = math.min(nh, maxH))
    }
  }

  /** Frame sampling: keep every `stride`-th frame hash (a video
    * pipeline keeps 1 frame/sec of a 30 fps stream). Pure per-row
    * transform — composes with [[extractFeatures]] shuffle-free.
    */
  def sampleFrames(f: MediaFeatures, stride: Int): MediaFeatures = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    f.copy(frames = f.frames.indices.collect {
      case i if i % stride == 0 => f.frames(i)
    }.toArray)
  }

  /** media table (doc_id, media BINARY) → features, as a narrow
    * per-partition batch pass.
    */
  def extractFeatures(media: DataFrame, frameCount: Int): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // Batch-at-a-time surface: a real codec would init once per
        // partition here (the expensive part), then stream the rows.
        batch.map { case (id, bytes) => decodeStub(id, bytes, frameCount) }
      }
  }
}
