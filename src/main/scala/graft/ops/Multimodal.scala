package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns: media as opaque `BINARY` plus typed metadata,
  * with decode / feature-extract as per-partition batch functions
  * (SURVEY.md §2.2 "multimodal columns").
  *
  * Round 13: the decode step is a REAL codec — a binary PPM (P6) parser
  * that reads the magic, `#` comments, dimensions, maxval, and the raw
  * RGB payload from actual bytes (the format is a public one-page spec:
  * netpbm's ppm(5)). PPM is chosen because it is headered, uncompressed,
  * and parseable without any image library — the sandbox has none — so
  * the width/height/channel stats below are genuinely decoded, not
  * derived from blob length as the pre-round-13 stub did. The matching
  * [[encodePpm]] writer doubles as the fixture generator (q327 encodes
  * each document's UTF-8 bytes as a tiled 8×8 image, decodes it back,
  * and the DuckDB oracle replays the channel sums from the text bytes —
  * proving the parser inverts the writer byte-for-byte).
  *
  * The engine-side plumbing is the point: decode stays a narrow
  * `mapPartitions` (one batch iterator per partition, the Scala analog
  * of `mapInPandas`), so decode parallelism = partition count and no
  * shuffle is introduced; swapping PPM for JPEG is a per-row function
  * change with zero plan impact.
  */
object Multimodal {

  /** Feature row produced per media blob: parsed header fields, exact
    * per-channel byte sums, and `frames` — one rolling hash per
    * horizontal band of the pixel payload (the frame-sample surface a
    * video pipeline would fill with per-frame embeddings).
    */
  case class MediaFeatures(doc_id: Long, width: Int, height: Int,
                           maxval: Int, n_bytes: Int,
                           sum_r: Long, sum_g: Long, sum_b: Long,
                           frames: Array[Long])

  /** Binary-PPM (P6) writer: `P6\n<w> <h>\n255\n` + w*h*3 raw RGB bytes,
    * pixels tiled from `payload` (byte i = payload(i mod len); all-zero
    * if the payload is empty). This is the media-fixture generator: a
    * deterministic, spec-conformant image derived from bytes both sides
    * of the oracle can see.
    */
  def encodePpm(payload: Array[Byte], width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    val n = width * height * 3
    val out = new Array[Byte](header.length + n)
    System.arraycopy(header, 0, out, 0, header.length)
    if (payload.nonEmpty) {
      var i = 0
      while (i < n) {
        out(header.length + i) = payload(i % payload.length)
        i += 1
      }
    }
    out
  }

  /** Real P6 parser: magic, whitespace, `#`-comments, three ASCII ints
    * (width, height, maxval), ONE whitespace byte, then w*h*3 raw bytes
    * (maxval ≤ 255 ⇒ 1 byte/sample). Malformed input throws — a codec
    * that silently invents dimensions is how the stub it replaces
    * worked, and exactly what this round removes.
    */
  def decodePpm(docId: Long, blob: Array[Byte], frameCount: Int): MediaFeatures = {
    var pos = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"doc $docId: malformed PPM — $msg")
    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\r' || b == '\t'
    def skipWsAndComments(): Unit = {
      var more = true
      while (more) {
        while (pos < blob.length && isWs(blob(pos))) pos += 1
        if (pos < blob.length && blob(pos) == '#') {
          while (pos < blob.length && blob(pos) != '\n') pos += 1
        } else more = false
      }
    }
    def readInt(what: String): Int = {
      skipWsAndComments()
      val start = pos
      var v = 0L
      while (pos < blob.length && blob(pos) >= '0' && blob(pos) <= '9') {
        v = v * 10 + (blob(pos) - '0'); pos += 1
        if (v > Int.MaxValue) fail(s"$what overflows int")
      }
      if (pos == start) fail(s"expected integer $what at byte $pos")
      v.toInt
    }
    if (blob.length < 2 || blob(0) != 'P' || blob(1) != '6')
      fail("missing P6 magic")
    pos = 2
    val w = readInt("width"); val h = readInt("height")
    val maxval = readInt("maxval")
    if (w <= 0 || h <= 0) fail(s"bad dims ${w}x$h")
    if (maxval <= 0 || maxval > 255) fail(s"unsupported maxval $maxval")
    // Exactly one whitespace byte separates maxval from the raster.
    if (pos >= blob.length || !isWs(blob(pos))) fail("missing raster separator")
    pos += 1
    val need = w.toLong * h * 3
    if (blob.length - pos < need) fail(s"raster truncated: need $need, have ${blob.length - pos}")
    var sr = 0L; var sg = 0L; var sb = 0L
    var i = 0
    val n = need.toInt
    while (i < n) {
      val v = blob(pos + i) & 0xff
      (i % 3: @annotation.switch) match {
        case 0 => sr += v
        case 1 => sg += v
        case _ => sb += v
      }
      i += 1
    }
    // Frame sampling surface: one rolling hash per horizontal band of
    // the raster (a real pipeline would emit per-frame features here).
    val frames = Array.tabulate(math.max(frameCount, 1)) { f =>
      val lo = pos + (f.toLong * n / math.max(frameCount, 1)).toInt
      val hi = pos + ((f + 1).toLong * n / math.max(frameCount, 1)).toInt
      var acc = 7L
      var j = lo
      while (j < hi) { acc = acc * 131 + (blob(j) & 0xff); j += 1 }
      acc
    }
    MediaFeatures(docId, w, h, maxval, blob.length, sr, sg, sb, frames)
  }

  /** Integer-exact aspect-preserving downscale of decoded dimensions to
    * fit a bounding box (never upscales, never returns 0). A pure
    * per-row transform that composes with [[extractFeatures]] without
    * adding a shuffle; resampling the pixels themselves is the same
    * shape with a heavier per-row function.
    */
  def resize(f: MediaFeatures, maxW: Int, maxH: Int): MediaFeatures = {
    val w = math.max(1, f.width); val h = math.max(1, f.height)
    if (w <= maxW && h <= maxH) f.copy(width = w, height = h)
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

  /** media table (doc_id, media BINARY containing a P6 PPM) → decoded
    * features, as a narrow per-partition batch pass.
    */
  def extractFeatures(media: DataFrame, frameCount: Int): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // Batch-at-a-time surface: a heavier codec would init once per
        // partition here (the expensive part), then stream the rows.
        batch.map { case (id, bytes) => decodePpm(id, bytes, frameCount) }
      }
  }
}
