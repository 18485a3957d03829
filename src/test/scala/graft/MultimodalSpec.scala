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
