package graft

import graft.ops.Multimodal

import org.scalatest.concurrent.TimeLimits.failAfter
import org.scalatest.time.{Seconds, Span}

/** Adversarial-input robustness: every pure-Scala media decoder must
  * DECLINE malformed payloads (None / stub fallback) — never hang,
  * throw through, or balloon memory. A 100 TB corpus of scraped
  * binary columns WILL contain truncated, bit-flipped and
  * header-lying payloads; the decode tier's contract is that they
  * cost a bounded parse attempt, not an executor.
  *
  * Deterministic xorshift fuzz (seeded — failures reproduce), three
  * shapes per decoder family: pure noise (all-None asserted), valid
  * magics + noise tails (crash/hang safety — a lucky header CAN
  * legitimately parse), and truncations of VALID payloads at EVERY
  * byte boundary. Each test runs under a hard time limit so a
  * non-advancing parse loop fails the suite instead of hanging it. */
class MediaFuzzSpec extends SparkSpec {

  private def limited[T](f: => T): T = failAfter(Span(120, Seconds))(f)

  private def rng(seed0: Long): Iterator[Long] =
    Iterator.iterate(seed0) { s0 =>
      var s = s0; s ^= s << 13; s ^= s >>> 7; s ^= s << 17; s
    }.drop(1)

  private def noise(seed: Long, n: Int): Array[Byte] = {
    val it = rng(seed)
    Array.fill(n)((it.next() & 0xFF).toByte)
  }

  private def withMagic(magic: Array[Byte], seed: Long, n: Int): Array[Byte] =
    magic ++ noise(seed, n)

  /** Every decoder entry point → (name, declined?). A decoder that
    * throws fails the test via the exception itself; callers assert
    * declines where the input makes acceptance impossible. */
  private def decodeAll(payload: Array[Byte]): Seq[(String, Boolean)] = Seq(
    "p6" -> Multimodal.decodeP6(payload).isEmpty,
    "gif" -> Multimodal.decodeGif(payload).isEmpty,
    "gifFrames" -> Multimodal.gifFrames(payload).isEmpty,
    "gifComposited" -> Multimodal.gifFramesComposited(payload).isEmpty,
    "wav" -> Multimodal.decodeWav(payload).isEmpty,
    "aiff" -> Multimodal.decodeAiff(payload).isEmpty,
    "au" -> Multimodal.decodeAu(payload).isEmpty,
    "mp3L1" -> Multimodal.decodeMp3Layer1(payload).isEmpty,
    "mp3L2" -> Multimodal.decodeMp3Layer2(payload).isEmpty,
    "mp3L3" -> Multimodal.decodeMp3Layer3(payload).isEmpty,
    "aac" -> Multimodal.decodeAacLc(payload).isEmpty,
    "aacMp4" -> Multimodal.aacFromMp4(payload).isEmpty,
    "h264Mp4" -> Multimodal.h264FromMp4(payload).isEmpty,
    "h264" -> Multimodal.decodeH264IPcm(payload).isEmpty,
    "mp3Meta" -> Multimodal.mp3Meta(payload).isEmpty,
    "mp4Meta" -> Multimodal.mp4Meta(payload).isEmpty,
    "aviMeta" -> Multimodal.aviMeta(payload).isEmpty,
    "aviFrames" -> Multimodal.aviMjpegFrames(payload).isEmpty,
    // the JDK dispatch path (PNG/JPEG/BMP/WBMP/TIFF): crash-safety
    // only in the noise test — WBMP has NO magic bytes, so its reader
    // can legitimately accept rare noise (type 0, fixheader 0,
    // plausible dims) and the all-decline assertion exempts it
    "imageIO" -> Multimodal.decodeImageIO(payload).isEmpty)

  /** Which ImageIO reader claims this payload (lowercase format name),
    * if any — lets the noise test exempt ONLY the WBMP reader (no magic
    * bytes) instead of the whole PNG/JPEG/BMP/TIFF dispatch. */
  private def imageIOClaimant(bytes: Array[Byte]): Option[String] = {
    val stream = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val rs = javax.imageio.ImageIO.getImageReaders(stream)
      if (rs.hasNext) Some(rs.next().getFormatName.toLowerCase) else None
    } finally stream.close()
  }

  test("pure noise at assorted sizes: every decoder DECLINES, none throws") {
    limited {
      for (size <- Seq(0, 1, 7, 64, 1024, 65536); trial <- 0 until 8) {
        val payload = noise(size * 1000003L + trial + 1, size)
        val accepted = decodeAll(payload).filterNot(_._2).map(_._1)
          // WBMP alone may legitimately accept rare noise (no magic
          // bytes: type 0, fixheader 0, plausible dims); every other
          // ImageIO format has a signature and must keep declining
          .filterNot(n => n == "imageIO" &&
            imageIOClaimant(payload).contains("wbmp"))
        assert(accepted.isEmpty,
          s"noise(size=$size, trial=$trial) accepted by: $accepted")
      }
    }
  }

  test("valid magics with noise bodies: parsers walk garbage structure safely") {
    val magics = Seq(
      "GIF89a".getBytes("ISO-8859-1"),
      "RIFF".getBytes("ISO-8859-1") ++ Array[Byte](0, 1, 0, 0) ++
        "WAVE".getBytes("ISO-8859-1"),
      "RIFF".getBytes("ISO-8859-1") ++ Array[Byte](0, 1, 0, 0) ++
        "AVI ".getBytes("ISO-8859-1"),
      "FORM".getBytes("ISO-8859-1") ++ Array[Byte](0, 1, 0, 0) ++
        "AIFF".getBytes("ISO-8859-1"),
      ".snd".getBytes("ISO-8859-1"),
      Array[Byte](0xFF.toByte, 0xFB.toByte), // MP3 sync
      Array[Byte](0xFF.toByte, 0xF1.toByte), // ADTS sync
      Array[Byte](0, 0, 0, 32) ++ "ftyp".getBytes("ISO-8859-1"),
      Array[Byte](0, 0, 0, 1, 0x67), // Annex-B SPS start
      Array[Byte]('I', 'I', 42, 0),  // TIFF little-endian
      Array[Byte]('M', 'M', 0, 42))  // TIFF big-endian
    // crash/hang safety only: a lucky noise body after a real magic
    // CAN legitimately parse (e.g. an MP3 header completed by noise),
    // so acceptance is not asserted here — the noise test covers that
    limited {
      for (m <- magics; trial <- 0 until 12)
        decodeAll(withMagic(m, m.length * 7919L + trial + 1, 512))
    }
  }

  test("byte-level truncations of VALID payloads: every prefix declines or decodes") {
    import graft.tools.MediaFixtures
    val valids = Seq(
      MediaFixtures.adtsFrame(4, 1, MediaFixtures.aacSilenceRawFrame(true, 10)),
      MediaFixtures.mp4Aac(4, 1,
        Seq(MediaFixtures.aacSilenceRawFrame(true, 5))),
      {
        val out = new java.io.ByteArrayOutputStream()
        MediaFixtures.h264Nal(out, 3, 7)(MediaFixtures.h264Sps(_, 1, 1))
        MediaFixtures.h264Nal(out, 3, 8)(MediaFixtures.h264Pps(_))
        MediaFixtures.h264Nal(out, 3, 5) { w =>
          MediaFixtures.h264IdrSliceHeader(w, 0)
          MediaFixtures.h264IpcmMb(w, _ => 128)
        }
        out.toByteArray
      },
      MediaFixtures.mjpegAvi(Seq(MediaFixtures.solidJpeg(8, 8, 0x336699))),
      MediaFixtures.tiffRgb(5, 3, (x, y) => (x * 40 << 16) | (y * 80 << 8) | 7),
      MediaFixtures.compositedGif(8, 4, 3, 0x112233)(f => 0x445566 + f),
      { // minimal valid AIFF: mono 16-bit, 4 frames @ 8000 Hz
        val o = new java.io.ByteArrayOutputStream()
        def b32(v: Long): Unit = { o.write((v >> 24).toInt & 0xFF); o.write((v >> 16).toInt & 0xFF)
          o.write((v >> 8).toInt & 0xFF); o.write(v.toInt & 0xFF) }
        def b16(v: Int): Unit = { o.write((v >> 8) & 0xFF); o.write(v & 0xFF) }
        o.write("FORM".getBytes); b32(4 + 26 + 16 + 8); o.write("AIFF".getBytes)
        o.write("COMM".getBytes); b32(18); b16(1); b32(4); b16(16)
        b16(16383 + 12); b32(8000L << 19); b32(0) // 8000 = 0.97656*2^13
        o.write("SSND".getBytes); b32(8 + 8); b32(0); b32(0)
        Seq(100, -200, 300, -400).foreach(b16)
        o.toByteArray
      },
      { // minimal valid AU: mono u-law, 6 samples @ 8000 Hz
        val o = new java.io.ByteArrayOutputStream()
        def b32(v: Long): Unit = { o.write((v >> 24).toInt & 0xFF); o.write((v >> 16).toInt & 0xFF)
          o.write((v >> 8).toInt & 0xFF); o.write(v.toInt & 0xFF) }
        o.write(".snd".getBytes); b32(24); b32(6); b32(1); b32(8000); b32(1)
        Seq(0x00, 0x7F, 0x80, 0xFF, 0x35, 0xCA).foreach(o.write)
        o.toByteArray
      },
      { // minimal valid A-law WAV (fmt 6), mono, 4 samples @ 8000 Hz
        val o = new java.io.ByteArrayOutputStream()
        def le32(v: Long): Unit = { o.write(v.toInt & 0xFF); o.write((v >> 8).toInt & 0xFF)
          o.write((v >> 16).toInt & 0xFF); o.write((v >> 24).toInt & 0xFF) }
        def le16(v: Int): Unit = { o.write(v & 0xFF); o.write((v >> 8) & 0xFF) }
        o.write("RIFF".getBytes); le32(40); o.write("WAVE".getBytes)
        o.write("fmt ".getBytes); le32(16); le16(6); le16(1); le32(8000)
        le32(8000); le16(1); le16(8)
        o.write("data".getBytes); le32(4)
        Seq(0x55, 0xD5, 0x2A, 0xAA).foreach(o.write)
        o.toByteArray
      },
      { // minimal valid float32 WAV (fmt 3), mono, 3 samples @ 8000 Hz
        val o = new java.io.ByteArrayOutputStream()
        def le32(v: Long): Unit = { o.write(v.toInt & 0xFF); o.write((v >> 8).toInt & 0xFF)
          o.write((v >> 16).toInt & 0xFF); o.write((v >> 24).toInt & 0xFF) }
        def le16(v: Int): Unit = { o.write(v & 0xFF); o.write((v >> 8) & 0xFF) }
        o.write("RIFF".getBytes); le32(48); o.write("WAVE".getBytes)
        o.write("fmt ".getBytes); le32(16); le16(3); le16(1); le32(8000)
        le32(32000); le16(4); le16(32)
        o.write("data".getBytes); le32(12)
        Seq(0.25f, -0.5f, 0.0f).foreach(v => le32(java.lang.Float.floatToIntBits(v) & 0xFFFFFFFFL))
        o.toByteArray
      },
      { // minimal valid A-law AIFC, mono, 4 samples @ 8000 Hz
        val o = new java.io.ByteArrayOutputStream()
        def b32(v: Long): Unit = { o.write((v >> 24).toInt & 0xFF); o.write((v >> 16).toInt & 0xFF)
          o.write((v >> 8).toInt & 0xFF); o.write(v.toInt & 0xFF) }
        def b16(v: Int): Unit = { o.write((v >> 8) & 0xFF); o.write(v & 0xFF) }
        o.write("FORM".getBytes); b32(4 + 32 + 16 + 4); o.write("AIFC".getBytes)
        o.write("COMM".getBytes); b32(24); b16(1); b32(4); b16(8)
        b16(16383 + 12); b32(8000L << 19); b32(0)
        o.write("alaw".getBytes); b16(0)
        o.write("SSND".getBytes); b32(8 + 4); b32(0); b32(0)
        Seq(0x55, 0xD5, 0x2A, 0xAA).foreach(o.write)
        o.toByteArray
      })
    limited {
      for (v <- valids; cut <- 0 to v.length)
        decodeAll(v.take(cut))
    }
  }

  test("header-declared sizes cannot balloon memory: lying P6/GIF/MP4 headers decline") {
    // P6 with an over-Int digit run must decline, not NumberFormat-throw
    assert(Multimodal.decodeP6("P6 99999999999 1 255 ".getBytes("US-ASCII")).isEmpty)
    // GIF declaring a 16000x16000 logical screen with a tiny body
    val gif = new java.io.ByteArrayOutputStream()
    gif.write("GIF89a".getBytes("ISO-8859-1"))
    gif.write(Array[Byte](0x80.toByte, 0x3E, 0x80.toByte, 0x3E, 0, 0, 0)) // 16000x16000
    gif.write(0x2C); gif.write(new Array[Byte](9)); gif.write(2)
    gif.write(0) // empty LZW
    gif.write(0x3B)
    assert(Multimodal.gifFramesComposited(gif.toByteArray).isEmpty,
      "oversized declared canvas must decline, not allocate")
    // MP4 stco declaring 2^31 chunks in a 100-byte box
    val huge = graft.tools.MediaFixtures.mp4Aac(4, 1,
      Seq(graft.tools.MediaFixtures.aacSilenceRawFrame(true, 3)))
    val idx = {
      // find the stco box and corrupt its entry count
      var i = -1
      var p = 0
      while (i < 0 && p + 4 < huge.length) {
        if (huge(p) == 's' && huge(p + 1) == 't' && huge(p + 2) == 'c' &&
            huge(p + 3) == 'o') i = p
        p += 1
      }
      i
    }
    assert(idx > 0)
    huge(idx + 8) = 0x7F.toByte // entry_count -> 0x7FXXXXXX
    assert(Multimodal.aacFromMp4(huge).isEmpty,
      "lying stco count must decline before allocating")
    // MP4 stsz declaring a sample size >= 2^31: u32-to-Int wrap would
    // go negative and silently SKIP the sample (wrong n_frames), so
    // the whole table must decline instead
    val wrap = graft.tools.MediaFixtures.mp4Aac(4, 1,
      Seq(graft.tools.MediaFixtures.aacSilenceRawFrame(true, 3)))
    val szIdx = {
      var i = -1
      var p = 0
      while (i < 0 && p + 4 < wrap.length) {
        if (wrap(p) == 's' && wrap(p + 1) == 't' && wrap(p + 2) == 's' &&
            wrap(p + 3) == 'z') i = p
        p += 1
      }
      i
    }
    assert(szIdx > 0)
    // payload: version/flags(4) uniform(4) count(4) entry0(4)
    wrap(szIdx + 16) = 0x80.toByte // entry0 -> 0x80XXXXXX (>= 2^31)
    assert(Multimodal.aacFromMp4(wrap).isEmpty,
      "wrapping stsz sample size must decline, not drop the sample")
  }
}
