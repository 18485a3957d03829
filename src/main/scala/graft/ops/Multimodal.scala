package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct; media decode /
  * feature-extract / resize / frame-sample run as per-partition batch
  * transforms (`mapPartitions` over an iterator — the Scala analogue of
  * arrow-batched Pandas UDFs).
  *
  * Image decode is REAL for the formats the JVM ships codecs for:
  * binary PPM (P6) via the pure-Scala parser below, and
  * PNG/JPEG/BMP/GIF/WBMP via `javax.imageio` (no external
  * dependencies). Payloads no installed codec recognizes (exotic
  * containers, audio, video) fall back to `fakeDecode`, a documented
  * deterministic stub with the same output contract — swap in
  * ffmpeg/JNI bindings there in production.
  */
object Multimodal {

  /** canonical multimodal schema fragment */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image|audio|video
    StructField("format", StringType),       // png|jpeg|wav|mp4|...
    StructField("byte_len", LongType),
  ))

  case class MediaRow(doc_id: Long, content: Array[Byte], media_type: String, format: String)
  case class DecodedImage(doc_id: Long, width: Int, height: Int, channels: Int,
      mean_intensity: Double)
  case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])
  case class MediaFeatures(doc_id: Long, features: Array[Float])
  case class MediaFeatureRow(doc_id: Long, feature_idx: Int, value: Double)

  /** Attach the metadata struct to a binary payload column. */
  def withMediaMeta(df: DataFrame, contentCol: String, mediaType: String,
      format: String): DataFrame =
    df.withColumn("media_meta", struct(
      lit(mediaType).as("media_type"), lit(format).as("format"),
      length(col(contentCol)).cast("long").as("byte_len")))

  /** REAL decoder for binary PPM (P6) — a pure-JVM parse, no external
    * libraries: ASCII header `P6 <w> <h> <maxval>` (with comments and
    * arbitrary whitespace), one whitespace byte, then w*h*3 raw pixel
    * bytes. Mean intensity is computed over the actual pixels. Returns
    * None for anything that is not a well-formed P6 payload. */
  private[ops] def decodeP6(bytes: Array[Byte]): Option[(Int, Int, Int, Double)] = {
    if (bytes.length < 2 || bytes(0) != 'P'.toByte || bytes(1) != '6'.toByte) return None
    var i = 2
    def skipWs(): Unit = {
      var go = true
      while (go && i < bytes.length) {
        val c = bytes(i)
        if (c == '#'.toByte) { while (i < bytes.length && bytes(i) != '\n'.toByte) i += 1 }
        else if (c == ' '.toByte || c == '\n'.toByte || c == '\r'.toByte || c == '\t'.toByte) i += 1
        else go = false
      }
    }
    def readInt(): Int = {
      skipWs()
      val st = i
      while (i < bytes.length && bytes(i) >= '0'.toByte && bytes(i) <= '9'.toByte) i += 1
      if (i == st) -1 else new String(bytes, st, i - st, "US-ASCII").toInt
    }
    val w = readInt(); val h = readInt(); val maxv = readInt()
    if (w <= 0 || h <= 0 || maxv <= 0 || maxv >= 65536) return None
    i += 1 // the single whitespace byte after maxval
    val n = w.toLong * h * 3
    if (n > Int.MaxValue || bytes.length - i < n) return None
    var s = 0L
    var j = i
    while (j < i + n.toInt) { s += (bytes(j) & 0xFF); j += 1 }
    Some((w, h, 3, s.toDouble / n))
  }

  /** REAL decoder for every format the JVM's `javax.imageio` registry
    * handles (PNG/JPEG/BMP/GIF/WBMP out of the box). Returns
    * (width, height, bands, mean) where mean is the average of ALL
    * raster samples across bands — the same definition as the P6 path.
    * None when no installed reader recognizes the payload. */
  private[ops] def decodeImageIO(bytes: Array[Byte]): Option[(Int, Int, Int, Double)] = {
    if (bytes.length < 4) return None
    // in-memory streams only: the default ImageIO path spills to a
    // disk-backed cache file per call, which executors must not do
    val stream = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(stream)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(stream, true, true)
        val decoded = reader.read(0)
        // palette formats (GIF, indexed PNG) raster-sample as palette
        // INDICES; expand to true RGB before measuring
        val img = decoded.getColorModel match {
          case _: java.awt.image.IndexColorModel =>
            val rgb = new java.awt.image.BufferedImage(decoded.getWidth,
              decoded.getHeight, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
            val g = rgb.createGraphics()
            g.drawImage(decoded, 0, 0, null)
            g.dispose()
            rgb
          case _ => decoded
        }
        val raster = img.getRaster
        val (w, h, bands) = (img.getWidth, img.getHeight, raster.getNumBands)
        var sum = 0L
        val row = new Array[Int](w * bands)
        var y = 0
        while (y < h) {
          raster.getPixels(0, y, w, 1, row)
          var i = 0
          while (i < row.length) { sum += row(i); i += 1 }
          y += 1
        }
        Some((w, h, bands, sum.toDouble / (w.toLong * h * bands)))
      } finally reader.dispose()
    } catch { case _: Exception => None }
    finally stream.close()
  }

  // ---- STUB: audio/video/exotic containers only (see scaladoc) ----
  private def fakeDecode(bytes: Array[Byte]): (Int, Int, Int, Double) = {
    // deterministic pseudo-decode from the byte sum; real signature,
    // fake pixels. Integer byte-sum base keeps it cross-engine
    // verifiable (an external oracle can recompute it exactly).
    var s = 0L
    var i = 0
    while (i < bytes.length) { s += (bytes(i) & 0xFF); i += 1 }
    val w = 32 + (s % 97).toInt
    val ht = 32 + ((s / 97) % 89).toInt
    val mean = if (bytes.isEmpty) 0.0 else s.toDouble / bytes.length
    (w, ht, 3, mean)
  }

  /** Batched image decode: real mapPartitions plumbing; PPM (P6) and
    * every `javax.imageio` format (PNG/JPEG/BMP/GIF/WBMP) decode for
    * REAL (true dims + pixel mean); only payloads no installed codec
    * recognizes fall back to the documented stub. */
  def decodeImages(ds: Dataset[MediaRow]): Dataset[DecodedImage] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // per-partition init (codec contexts, model handles)
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val (w, h, c, mean) = decodeP6(r.content)
          .orElse(decodeImageIO(r.content))
          .getOrElse(fakeDecode(r.content))
        DecodedImage(r.doc_id, w, h, c, mean)
      }
    }
  }

  /** Frame sampling: every `stride`-th fixed-size chunk of the payload
    * stands in for a video frame (stub chunker, real explode shape). */
  def sampleFrames(ds: Dataset[MediaRow], stride: Int = 4,
      frameBytes: Int = 256): Dataset[Frame] = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      r.content.grouped(frameBytes).zipWithIndex
        .collect { case (chunk, i) if i % stride == 0 => Frame(r.doc_id, i, chunk) }
    }
  }

  /** Fixed-dim feature extraction (stub: byte histogram folded to
    * `dim`); batch shape matches an embedding-model UDF. */
  def extractFeatures(ds: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        val acc = new Array[Float](dim)
        var i = 0
        while (i < r.content.length) {
          acc(i % dim) += (r.content(i) & 0xFF) / 255.0f
          i += 1
        }
        MediaFeatures(r.doc_id, acc)
      }
    }
  }

  /** Feature extraction in driver-comparable shape: one row per
    * (doc_id, feature_idx) with an exact integer byte-sum per bucket
    * divided once at the end — deterministic regardless of partitioning
    * or accumulation order, so results hash-compare across engines.
    * Same mapPartitions batch contract as [[extractFeatures]]. */
  def featureRows(ds: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatureRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.flatMap { r =>
        val acc = new Array[Long](dim)
        var i = 0
        while (i < r.content.length) {
          acc(i % dim) += (r.content(i) & 0xFF)
          i += 1
        }
        Iterator.tabulate(dim)(j => MediaFeatureRow(r.doc_id, j, acc(j) / 255.0))
      }
    }
  }

  /** Column-level resize stub: keeps the binary contract (truncate/pad),
    * documenting where a real resampler plugs in. */
  def resizeStub(content: org.apache.spark.sql.Column, targetBytes: Int): org.apache.spark.sql.Column =
    substring(content, 1, targetBytes)
}
