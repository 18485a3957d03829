package graft

import graft.ops.Multimodal
import graft.ops.Multimodal._
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    MediaRow(1L, Array.tabulate(1024)(_.toByte), "image", "png"),
    MediaRow(2L, Array.tabulate(2048)(i => (i * 3).toByte), "video", "mp4"),
    MediaRow(3L, Array.empty[Byte], "image", "png"),
  ).toDS()

  test("media metadata struct rides alongside the binary payload") {
    val df = Multimodal.withMediaMeta(media.toDF(), "content", "image", "png")
    val row = df.filter($"doc_id" === 1).select("media_meta.*").collect()(0)
    assert(row.getAs[String]("media_type") == "image")
    assert(row.getAs[Long]("byte_len") == 1024L)
  }

  test("decode stub is deterministic and batch-shaped") {
    val a = Multimodal.decodeImages(media).collect().sortBy(_.doc_id)
    val b = Multimodal.decodeImages(media).collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq) // deterministic
    assert(a.forall(d => d.width > 0 && d.height > 0 && d.channels == 3))
    assert(a.find(_.doc_id == 3).get.mean_intensity == 0.0)
  }

  test("PPM (P6) payloads decode for real: header dims + true pixel mean") {
    // 2x2 RGB, pixels 0..11 -> mean (0+...+11)/12 = 5.5; comment in header
    val header = "P6\n# test image\n2 2\n255\n".getBytes("US-ASCII")
    val pixels = Array.tabulate[Byte](12)(_.toByte)
    val ppm = header ++ pixels
    val out = decodeImages(Seq(MediaRow(1L, ppm, "image", "ppm")).toDS()).collect()(0)
    assert(out == DecodedImage(1L, 2, 2, 3, 5.5))
    // truncated pixel data or non-P6 bytes fall back to the stub, not a crash
    val bad = decodeImages(Seq(
      MediaRow(2L, header ++ pixels.take(5), "image", "ppm"),
      MediaRow(3L, "not an image at all".getBytes, "image", "png")).toDS()).collect()
    assert(bad.length == 2 && bad.forall(d => d.width >= 32 && d.channels == 3))
  }

  // deterministic w x h image: sample (x,y,band) = base*(band+1) + x
  private def makeImage(w: Int, h: Int, base: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((base + x) << 16) | ((base * 2 + x) << 8) | (base * 3 + x))
    img
  }

  private def encode(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt writer")
    out.toByteArray
  }

  test("PNG/BMP/GIF decode for real: true dims + pixel mean") {
    // 4x3, base 10: per-row samples r=10..13, g=20..23, b=30..33
    // sum per row = (10+11+12+13)+(20+...)+(30+...) = 46+86+126 = 258... let
    // the test compute it exactly
    val (w, h, base) = (4, 3, 10)
    val perRow = (0 until w).map(x => (base + x) + (base * 2 + x) + (base * 3 + x)).sum
    val mean = (perRow.toLong * h).toDouble / (w.toLong * h * 3)
    // the JDK GIF writer quantizes truecolor input to a web-safe
    // palette; hand it an indexed image with the exact colors instead.
    // NB the JDK writer also emits this INTERLACED with a 4-entry
    // (2-bit-packed) palette — exactly the shape the JDK *reader*
    // mis-decodes (it zeroes skipped interlace rows in packed rasters),
    // which is why decodeImages routes GIF through the pure-Scala
    // decodeGif. This assertion is bit-exact through our decoder.
    val palette = (0 until w)
      .map(x => ((base + x) << 16) | ((base * 2 + x) << 8) | (base * 3 + x)).toArray
    val icm = new java.awt.image.IndexColorModel(8, palette.length, palette, 0,
      false, -1, java.awt.image.DataBuffer.TYPE_BYTE)
    val indexed = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until h; x <- 0 until w) indexed.setRGB(x, y, palette(x))
    val rows = Seq(
      MediaRow(1L, encode(makeImage(w, h, base), "png"), "image", "png"),
      MediaRow(2L, encode(makeImage(w, h, base), "bmp"), "image", "bmp"),
      MediaRow(3L, encode(indexed, "gif"), "image", "gif"),
    ).toDS()
    val out = decodeImages(rows).collect().sortBy(_.doc_id)
    out.foreach { d =>
      assert(d.width == w && d.height == h && d.channels == 3, d)
      assert(d.mean_intensity == mean, s"$d vs expected mean $mean")
    }
    // the GIF fixture really is interlaced (sanity-check the premise)
    val gifBytes = encode(indexed, "gif")
    val descIdx = gifBytes.indexOf(0x2C.toByte)
    assert(descIdx > 0 && (gifBytes(descIdx + 9) & 0x40) != 0, "fixture not interlaced")
  }

  test("RGBA PNG normalizes to 3 channels; opaque alpha leaves the mean exact") {
    val (w, h, base) = (4, 3, 10)
    val rgba = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until h; x <- 0 until w)
      rgba.setRGB(x, y, (255 << 24) | ((base + x) << 16) | ((base * 2 + x) << 8) | (base * 3 + x))
    val perRow = (0 until w).map(x => (base + x) + (base * 2 + x) + (base * 3 + x)).sum
    val mean = (perRow.toLong * h).toDouble / (w.toLong * h * 3)
    val d = decodeImages(Seq(MediaRow(1L, encode(rgba, "png"), "image", "png")).toDS())
      .collect()(0)
    // without alpha normalization this would report channels=4 and a
    // mean dragged toward 255 by the opaque alpha band
    assert(d.channels == 3 && d.mean_intensity == mean, d)
  }

  test("16-bit PNG rescales the mean to the 0..255 scale") {
    val gray16 = new java.awt.image.BufferedImage(4, 2,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    val raster = gray16.getRaster
    for (y <- 0 until 2; x <- 0 until 4) raster.setSample(x, y, 0, 0x8000)
    val d = decodeImages(Seq(MediaRow(1L, encode(gray16, "png"), "image", "png")).toDS())
      .collect()(0)
    assert(d.channels == 1, d)
    // 0x8000/0xFFFF * 255 = 127.50097...
    assert(math.abs(d.mean_intensity - 0x8000.toDouble * 255 / 0xFFFF) < 1e-9, d)
  }

  test("pure-Scala GIF decoder handles non-interlaced and KwKwK streams") {
    // single-color run exercises the LZW KwKwK case (repeat-of-previous
    // code referencing the not-yet-defined entry); indexed input keeps
    // the writer from quantizing the color
    val pal = Array((40 << 16) | (80 << 8) | 120, 0xFFFFFF)
    val icm2 = new java.awt.image.IndexColorModel(8, 2, pal, 0, false, -1,
      java.awt.image.DataBuffer.TYPE_BYTE)
    val solid = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm2)
    for (y <- 0 until 16; x <- 0 until 16) solid.setRGB(x, y, pal(0))
    val d = Multimodal.decodeGif(encode(solid, "gif"))
    assert(d.contains((16, 16, 3, (40 + 80 + 120) / 3.0)), d)
    // garbage in → None, not a crash
    assert(Multimodal.decodeGif("GIF89a but not really".getBytes).isEmpty)
    assert(Multimodal.decodeGif(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("JPEG decodes real dims (lossy: mean only approximate)") {
    val bytes = encode(makeImage(16, 9, 40), "jpg")
    val d = decodeImages(Seq(MediaRow(1L, bytes, "image", "jpeg")).toDS()).collect()(0)
    assert(d.width == 16 && d.height == 9)
    // true mean = 40*2 + mean(x) = 80 + 7.5 = 87.5; JPEG must land nearby,
    // which the fake byte-sum decode never would
    assert(math.abs(d.mean_intensity - 87.5) < 5.0, d.mean_intensity)
  }

  test("frame sampling: every stride-th chunk") {
    val frames = Multimodal.sampleFrames(media.filter(_.doc_id == 2L),
      stride = 2, frameBytes = 256).collect()
    // 2048 bytes -> 8 chunks -> indices 0,2,4,6
    assert(frames.map(_.frame_idx).sorted.toSeq == Seq(0, 2, 4, 6))
    assert(frames.forall(_.frame.length == 256))
  }

  test("feature extraction: fixed dim, deterministic") {
    val feats = Multimodal.extractFeatures(media, dim = 16).collect()
    assert(feats.forall(_.features.length == 16))
    assert(feats.find(_.doc_id == 3).get.features.forall(_ == 0.0f))
  }
}
