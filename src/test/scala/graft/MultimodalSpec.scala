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

  private def wavBytes(channels: Int, rate: Int, bits: Int,
      samples: Array[Int]): Array[Byte] = {
    // hand-rolled canonical RIFF/WAVE: fmt + data
    val bytesPerSample = bits / 8
    val dataLen = samples.length * bytesPerSample
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
      out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF) }
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write("RIFF".getBytes); w32(36 + dataLen); out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); w32(16); w16(1); w16(channels); w32(rate)
    w32(rate * channels * bytesPerSample); w16(channels * bytesPerSample); w16(bits)
    out.write("data".getBytes); w32(dataLen)
    samples.foreach { s =>
      if (bits == 8) out.write(s & 0xFF)
      else w16(s) // 16-bit signed LE
    }
    out.toByteArray
  }

  test("WAV PCM decodes for real: fmt fields + exact sample mean") {
    // 8-bit unsigned: samples 0..99 -> mean_level = (sum/100)/255
    val s8 = Array.tabulate(100)(identity)
    val mean8 = s8.sum.toDouble / 100 / 255.0
    val a8 = Multimodal.decodeWav(wavBytes(1, 8000, 8, s8)).get
    assert(a8.channels == 1 && a8.rate == 8000 && a8.nSamples == 100)
    assert(math.abs(a8.durationMs - 100.0 * 1000 / 8000) < 1e-9)
    assert(math.abs(a8.meanLevel - mean8) < 1e-12, a8)
    // 16-bit signed stereo: value v maps to (v+32768)/65535
    val s16 = Array(-32768, 0, 32767, 1000)
    val mean16 = s16.map(v => (v + 32768).toDouble / 65535).sum / 4
    val a16 = Multimodal.decodeWav(wavBytes(2, 44100, 16, s16)).get
    assert(a16.channels == 2 && a16.rate == 44100 && a16.nSamples == 4)
    assert(a16.durationMs == 2.0 * 1000 / 44100)
    assert(math.abs(a16.meanLevel - mean16) < 1e-12, a16)
    // cross-validate the parser against the JDK's own WAV writer
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
    val pcm = Array.tabulate(64)(i => (i * 512 - 16384).toShort)
    val raw = new Array[Byte](pcm.length * 2)
    pcm.zipWithIndex.foreach { case (v, i) =>
      raw(2 * i) = (v & 0xFF).toByte; raw(2 * i + 1) = ((v >> 8) & 0xFF).toByte }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, pcm.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val aj = Multimodal.decodeWav(bos.toByteArray).get
    assert(aj.channels == 1 && aj.rate == 16000 && aj.nSamples == 64)
    val expect = pcm.map(v => (v + 32768).toDouble / 65535).sum / 64
    assert(math.abs(aj.meanLevel - expect) < 1e-12, aj)
    // garbage and truncated payloads -> None, not a crash
    assert(Multimodal.decodeWav("RIFFxxxxWAVE but short".getBytes).isEmpty)
    assert(Multimodal.decodeWav(Array.fill[Byte](64)(0x41)).isEmpty)
  }

  test("audio decode dataset: WAV real, non-WAV falls to the stub") {
    val wav = wavBytes(1, 8000, 8, Array.fill(10)(128))
    val rows = Seq(
      MediaRow(1L, wav, "audio", "wav"),
      MediaRow(2L, Array.tabulate[Byte](100)(_.toByte), "audio", "mp3"),
    ).toDS()
    val out = Multimodal.decodeAudio(rows).collect().sortBy(_.doc_id)
    assert(out(0).sample_rate == 8000 && out(0).n_samples == 10)
    assert(math.abs(out(0).mean_level - 128.0 / 255) < 1e-12)
    assert(out(1).n_samples == 100) // stub contract: byte length
  }

  test("AVI metadata extracts for real from the avih header") {
    // minimal RIFF/AVI with a LIST hdrl containing avih
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
      out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF) }
    out.write("RIFF".getBytes); w32(4 + 8 + 4 + 8 + 56); out.write("AVI ".getBytes)
    out.write("LIST".getBytes); w32(4 + 8 + 56); out.write("hdrl".getBytes)
    out.write("avih".getBytes); w32(56)
    w32(33367) // usPerFrame ~= 29.97 fps
    w32(0); w32(0); w32(0)
    w32(901)   // totalFrames
    w32(0); w32(0); w32(0)
    w32(640); w32(480) // width, height
    (0 until 4).foreach(_ => w32(0))
    val m = Multimodal.aviMeta(out.toByteArray).get
    assert(m == ((640, 480, 901L, 1e6 / 33367)), m)
    assert(Multimodal.aviMeta("RIFF1234WAVEnot avi".getBytes).isEmpty)
    val vids = Multimodal.videoMeta(Seq(
      MediaRow(1L, out.toByteArray, "video", "avi")).toDS()).collect()(0)
    assert(vids.width == 640 && vids.total_frames == 901L)
  }

  test("MP3 frame headers parse for real: tables, ID3 skip, frame walk") {
    // 7 frames of CBR MPEG1 Layer III, 128 kbps, 44100 Hz, stereo,
    // behind an ID3v2 tag: frameLen = 144*128000/44100 = 417
    val out = new java.io.ByteArrayOutputStream()
    out.write("ID3".getBytes); out.write(3); out.write(0); out.write(0)
    out.write(0); out.write(0); out.write(0); out.write(5)
    (0 until 5).foreach(_ => out.write(0))
    (0 until 7).foreach { _ =>
      out.write(0xFF); out.write(0xFB)
      out.write((9 << 4) | (0 << 2)) // brIdx 9 = 128 kbps, srIdx 0 = 44100
      out.write(0x00)                // stereo
      (4 until 144 * 128000 / 44100).foreach(_ => out.write(0))
    }
    val m = Multimodal.mp3Meta(out.toByteArray).get
    assert(m.version == "MPEG1" && m.bitrate_kbps == 128 && m.sample_rate == 44100)
    assert(m.channels == 2 && m.n_frames == 7L)
    assert(math.abs(m.duration_ms - 7 * 1152 * 1000.0 / 44100) < 1e-9)
    // MPEG2 table: 0xF3 = MPEG2 Layer III; brIdx 9 = 80 kbps, srIdx 1 = 24000
    val m2 = Multimodal.mp3Meta(Array(0xFF, 0xF3, (9 << 4) | (1 << 2), 0xC0)
      .map(_.toByte)).get
    assert(m2.version == "MPEG2" && m2.bitrate_kbps == 80 &&
      m2.sample_rate == 24000 && m2.channels == 1)
    // junk and free-format (brIdx 0) refuse
    assert(Multimodal.mp3Meta("not audio at all".getBytes).isEmpty)
    assert(Multimodal.mp3Meta(Array(0xFF, 0xFB, 0x00, 0x00).map(_.toByte)).isEmpty)
  }

  test("MPEG-1 Layer I decodes for real: bit-exact subband requantization") {
    // one mono frame, 448 kbps / 32000 Hz -> frameLen = 672; every
    // subband allocated nb=3 bits, scalefactor idx=0 (sf=2.0), and all
    // sample codes = 5 -> s' = (2*5+1-8)/8 * 8/7 * 2 = 3/8*8/7*2 = 6/7
    val frameLen = (12 * 448 * 1000 / 32000) * 4
    val buf = new Array[Byte](frameLen)
    buf(0) = 0xFF.toByte; buf(1) = 0xFF.toByte
    buf(2) = ((14 << 4) | (2 << 2)).toByte; buf(3) = 0xC0.toByte
    var bit = 32
    def w(v: Int, n: Int): Unit = (n - 1 to 0 by -1).foreach { r =>
      if (((v >> r) & 1) == 1) buf(bit >> 3) =
        (buf(bit >> 3) | (1 << (7 - (bit & 7)))).toByte
      bit += 1
    }
    (0 until 32).foreach(_ => w(2, 4))  // alloc=2 -> nb=3
    (0 until 32).foreach(_ => w(0, 6))  // sf idx 0 -> 2.0
    (0 until 12 * 32).foreach(_ => w(5, 3))
    val a = Multimodal.decodeMp3Layer1(buf).get
    assert(a.channels == 1 && a.rate == 32000 && a.nSamples == 384L)
    assert(math.abs(a.durationMs - 12.0) < 1e-9)
    // mean |s'| / 2 = (6/7) / 2
    assert(math.abs(a.meanLevel - 6.0 / 7.0 / 2.0) < 1e-12, a.meanLevel)
    // Layer III payloads refuse (stay with the documented stub)
    val l3 = Array(0xFF, 0xFB, (9 << 4), 0x00).map(_.toByte)
    assert(Multimodal.decodeMp3Layer1(l3).isEmpty)
    // truncated payload refuses rather than mis-decoding
    assert(Multimodal.decodeMp3Layer1(buf.take(100)).isEmpty)
  }

  test("MPEG-1 Layer II decodes for real: alloc tables, scfsi, grouped codes") {
    def mkWriter(buf: Array[Byte]) = {
      var bit = 32
      (v: Int, n: Int) => (n - 1 to 0 by -1).foreach { r =>
        if (((v >> r) & 1) == 1) buf(bit >> 3) =
          (buf(bit >> 3) | (1 << (7 - (bit & 7)))).toByte
        bit += 1
      }
    }
    // --- Table B.2a path: mono, 192 kbps / 48000 Hz -> sblimit 27.
    // sb 0-2 alloc idx 2 (steps 7, ungrouped 3-bit codes), sb 3-26
    // alloc idx 1 (steps 3, GROUPED 5-bit triplets); scfsi=3 on every
    // subband (2 transmitted scalefactors, parts [a, b, b]) with
    // idx 0 -> sf 2.0 and idx 6 -> sf 0.5; ungrouped codes 5 ->
    // |s| = 4/7*sf, grouped v=5 -> digits (2,1,0) -> |s| sum 4/3*sf.
    // sumAbs = (3*3*4/7 + 24*4/3) * (4 granules*2.0 + 8*0.5)
    //        = 260/7 * 12
    val bufA = new Array[Byte](144 * 192 * 1000 / 48000)
    bufA(0) = 0xFF.toByte; bufA(1) = 0xFD.toByte // MPEG1 LayerII no CRC
    bufA(2) = ((10 << 4) | (1 << 2)).toByte      // 192 kbps, 48000 Hz
    bufA(3) = 0xC0.toByte                        // mono
    val wA = mkWriter(bufA)
    (0 until 3).foreach(_ => wA(2, 4))           // steps 7
    (3 until 11).foreach(_ => wA(1, 4))          // steps 3
    (11 until 23).foreach(_ => wA(1, 3))
    (23 until 27).foreach(_ => wA(1, 2))
    (0 until 27).foreach(_ => wA(3, 2))          // scfsi = 3
    (0 until 27).foreach { _ => wA(0, 6); wA(6, 6) } // sf 2.0 then 0.5
    (0 until 12).foreach { _ =>
      (0 until 3).foreach(_ => (0 until 3).foreach(_ => wA(5, 3)))
      (3 until 27).foreach(_ => wA(5, 5))
    }
    val a = Multimodal.decodeMp3Layer2(bufA).get
    assert(a.channels == 1 && a.rate == 48000 && a.nSamples == 1152L)
    assert(math.abs(a.durationMs - 24.0) < 1e-9)
    assert(math.abs(a.meanLevel - 260.0 / 7 * 12 / 1152 / 2) < 1e-12, a.meanLevel)
    // --- Table B.2c path: mono, 32 kbps / 44100 Hz -> sblimit 8.
    // alloc idx 2 everywhere = steps 5 (grouped 7-bit), scfsi=2 (one
    // scalefactor for all parts, idx 3 -> sf 1.0), v=7 -> digits
    // (2,1,0) -> |s| per triplet (0 + 2/5 + 4/5) = 1.2
    val bufC = new Array[Byte](144 * 32 * 1000 / 44100)
    bufC(0) = 0xFF.toByte; bufC(1) = 0xFD.toByte
    bufC(2) = ((1 << 4) | (0 << 2)).toByte       // 32 kbps, 44100 Hz
    bufC(3) = 0xC0.toByte
    val wC = mkWriter(bufC)
    (0 until 2).foreach(_ => wC(2, 4))
    (2 until 8).foreach(_ => wC(2, 3))
    (0 until 8).foreach(_ => wC(2, 2))           // scfsi = 2
    (0 until 8).foreach(_ => wC(3, 6))           // sf idx 3 -> 1.0
    (0 until 12).foreach(_ => (0 until 8).foreach(_ => wC(7, 7)))
    val c = Multimodal.decodeMp3Layer2(bufC).get
    assert(c.channels == 1 && c.rate == 44100 && c.nSamples == 1152L)
    assert(math.abs(c.meanLevel - 12 * 8 * 1.2 / 1152 / 2) < 1e-12, c.meanLevel)
    // Layer III and joint stereo refuse; truncation refuses
    assert(Multimodal.decodeMp3Layer2(
      Array(0xFF, 0xFB, (9 << 4), 0x00).map(_.toByte)).isEmpty)
    val joint = bufA.clone(); joint(3) = 0x40.toByte
    assert(Multimodal.decodeMp3Layer2(joint).isEmpty)
    assert(Multimodal.decodeMp3Layer2(bufA.take(50)).isEmpty)
  }

  test("MPEG-1 Layer III decodes for real: side info, Huffman, requant, reservoir") {
    // mono 320 kbps / 48000 Hz -> frameLen = 960, side info 17 bytes,
    // main data at byte 21. Granule 0: big_values=2 via Huffman table 1
    // (pair (1,1) then (0,1)), one count1 table-B quadruple (1,0,1,0),
    // part2_3_length = 15 bits; scalefac_compress=0 (slen 0/0 -> no
    // scalefactor bits), global_gain 210 -> 2^0, so every nonzero line
    // requantizes to exactly 1.0. Granule 1 silent (part2_3_length 0).
    def mkFrame(gg: Int, withGr0Data: Boolean): Array[Byte] = {
      val buf = new Array[Byte](960)
      buf(0) = 0xFF.toByte; buf(1) = 0xFB.toByte // MPEG1 LayerIII no CRC
      buf(2) = ((14 << 4) | (1 << 2)).toByte     // 320 kbps, 48000 Hz
      buf(3) = 0xC0.toByte                       // mono
      var bit = 32
      def w(v: Int, n: Int): Unit = (n - 1 to 0 by -1).foreach { r =>
        if (((v >> r) & 1) == 1) buf(bit >> 3) =
          (buf(bit >> 3) | (1 << (7 - (bit & 7)))).toByte
        bit += 1
      }
      w(if (withGr0Data) 0 else 4, 9) // main_data_begin
      w(0, 5)                         // private
      (0 until 4).foreach(_ => w(0, 1)) // scfsi
      // granule 0
      w(15, 12); w(2, 9); w(gg, 8); w(0, 4); w(0, 1)
      w(1, 5); w(1, 5); w(1, 5); w(3, 4); w(3, 3); w(0, 1); w(0, 1); w(1, 1)
      // granule 1: silent
      w(0, 12); w(0, 9); w(gg, 8); w(0, 4); w(0, 1)
      w(1, 5); w(1, 5); w(1, 5); w(0, 4); w(0, 3); w(0, 1); w(0, 1); w(1, 1)
      if (withGr0Data) writeGr0(buf, 21 * 8)
      buf
    }
    // the 15 granule-0 bits: (1,1)="000"+2 signs, (0,1)="001"+1 sign,
    // count1 quad (1,0,1,0) -> code ~1010=0101 + 2 signs
    def writeGr0(buf: Array[Byte], at: Int): Unit = {
      var bit = at
      def w(v: Int, n: Int): Unit = (n - 1 to 0 by -1).foreach { r =>
        if (((v >> r) & 1) == 1) buf(bit >> 3) =
          (buf(bit >> 3) | (1 << (7 - (bit & 7)))).toByte
        bit += 1
      }
      w(0, 3); w(0, 1); w(0, 1) // (1,1) + signs
      w(1, 3); w(0, 1)          // (0,1) + sign
      w(5, 4); w(0, 1); w(0, 1) // quad 1,0,1,0 + signs for v,x
    }
    // nonzero lines: 0,1 (pair 1), 3 (pair 2), 4,6 (quad) -> sum 5.0
    val one = mkFrame(210, withGr0Data = true)
    val a = Multimodal.decodeMp3Layer3(one).get
    assert(a.channels == 1 && a.rate == 48000 && a.nSamples == 1152L)
    assert(math.abs(a.durationMs - 24.0) < 1e-9)
    assert(math.abs(a.meanLevel - 5.0 / 1152 / 2) < 1e-12, a.meanLevel)
    // --- bit reservoir: frame B's granule bits live in the LAST 4
    // bytes of frame A's main data (main_data_begin=4); global_gain
    // 214 -> every line scales by 2^1, so frame B contributes 10.0
    val fa = mkFrame(210, withGr0Data = true)
    writeGr0(fa, 956 * 8) // frame A bytes 956..959 = reservoir tail
    val fb = mkFrame(214, withGr0Data = false)
    val stream = fa ++ fb
    val r = Multimodal.decodeMp3Layer3(stream).get
    assert(r.nSamples == 2304L && r.channels == 1)
    assert(math.abs(r.meanLevel - 15.0 / 2304 / 2) < 1e-12, r.meanLevel)
    // refusals: short blocks, unimplemented tables, joint stereo,
    // truncation, Layer II payloads
    val shortBlk = mkFrame(210, withGr0Data = true)
    // flip window_switching_flag of granule 0 (bit 18+12+9+8+4 = 51
    // past side start -> absolute bit 32+51 = 83)
    shortBlk(83 >> 3) = (shortBlk(83 >> 3) | (1 << (7 - (83 & 7)))).toByte
    assert(Multimodal.decodeMp3Layer3(shortBlk).isEmpty)
    val joint3 = one.clone(); joint3(3) = 0x40.toByte
    assert(Multimodal.decodeMp3Layer3(joint3).isEmpty)
    assert(Multimodal.decodeMp3Layer3(one.take(100)).isEmpty)
    // Layer II header refuses
    assert(Multimodal.decodeMp3Layer3(
      Array(0xFF, 0xFD, (14 << 4) | (1 << 2), 0xC0).map(_.toByte)).isEmpty)
  }

  // ---- H.264 I_PCM Annex-B builder: the SHARED fixture writer (the
  // same bytes the oracle planting emits — see tools.MediaFixtures) ----
  import graft.tools.MediaFixtures.{h264Nal, h264Sps, h264Pps,
    h264IdrSliceHeader, h264IpcmMb}
  private def h264IdrSlice(w: graft.tools.MediaFixtures.H264Bits,
      firstMb: Int, mbLuma: Seq[Array[Int]]): Unit = {
    h264IdrSliceHeader(w, firstMb)
    mbLuma.foreach(luma => h264IpcmMb(w, luma(_)))
  }

  test("H.264 I_PCM elementary streams decode for real: SPS dims + exact luma") {
    val out = new java.io.ByteArrayOutputStream()
    h264Nal(out, 3, 7)(h264Sps(_, 2, 1)) // 32x16
    h264Nal(out, 3, 8)(h264Pps(_))
    // SEI with a planted 00 00 03 00 emulation sequence must be skipped
    h264Nal(out, 0, 6)(w => Seq(0, 0, 0, 0x40).foreach(w.u(_, 8)))
    val luma = Array.tabulate(2)(m => Array.tabulate(256)(k => 16 + (m * 31 + k) % 200))
    h264Nal(out, 3, 5)(h264IdrSlice(_, 0, luma))
    val r = Multimodal.decodeH264IPcm(out.toByteArray).get
    assert(r.width == 32 && r.height == 16, r)
    assert(r.nFrames == 1 && r.nMbs == 2, r)
    val want = luma.flatten.map(_.toLong).sum.toDouble / 512.0
    assert(math.abs(r.meanLuma - want) < 1e-12, (r.meanLuma, want))
    assert(r.profileIdc == 66 && r.levelIdc == 30)

    // multi-slice frame: two IDR slices, first_mb 0 and 2, still ONE frame
    val out2 = new java.io.ByteArrayOutputStream()
    h264Nal(out2, 3, 7)(h264Sps(_, 2, 2)) // 4 MBs
    h264Nal(out2, 3, 8)(h264Pps(_))
    val l2 = Array.tabulate(4)(m => Array.fill(256)(40 + m))
    h264Nal(out2, 3, 5)(h264IdrSlice(_, 0, l2.take(2)))
    h264Nal(out2, 3, 5)(h264IdrSlice(_, 2, l2.drop(2)))
    val r2 = Multimodal.decodeH264IPcm(out2.toByteArray).get
    assert(r2.nFrames == 1 && r2.nMbs == 4, r2)
    assert(math.abs(r2.meanLuma - 41.5) < 1e-12, r2.meanLuma)

    // out-of-subset shapes refuse (fall to the documented stub):
    // CABAC PPS, truncated PCM payload, and garbage
    val cab = new java.io.ByteArrayOutputStream()
    h264Nal(cab, 3, 7)(h264Sps(_, 1, 1))
    h264Nal(cab, 3, 8)(h264Pps(_, cabac = true))
    h264Nal(cab, 3, 5)(h264IdrSlice(_, 0, Seq(Array.fill(256)(50))))
    assert(Multimodal.decodeH264IPcm(cab.toByteArray).isEmpty)
    val full = out.toByteArray
    assert(Multimodal.decodeH264IPcm(full.take(full.length - 40)).isEmpty)
    assert(Multimodal.decodeH264IPcm("not a video".getBytes).isEmpty)

    // videoMeta picks up the real dims + frame count for h264 payloads
    import spark.implicits._
    val vm = Multimodal.videoMeta(
      Seq(Multimodal.MediaRow(9L, full, "video", "h264")).toDS()).collect().head
    assert(vm.width == 32 && vm.height == 16 && vm.total_frames == 1L, vm)
  }

  test("sampleFrames: real animated-GIF frames, stride sampling, stub fallback") {
    import spark.implicits._
    // 3-frame animated GIF, frame f = solid color (10+40f, 20+40f, 30+40f)
    javax.imageio.ImageIO.setUseCache(false)
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for (f <- 0 until 3) {
      val c = ((10 + 40 * f) << 16) | ((20 + 40 * f) << 8) | (30 + 40 * f)
      val icm = new java.awt.image.IndexColorModel(8, 2, Array(c, c | 1), 0,
        false, -1, java.awt.image.DataBuffer.TYPE_BYTE)
      val img = new java.awt.image.BufferedImage(4, 2,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
      for (y <- 0 until 2; x <- 0 until 4) img.setRGB(x, y, c)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence(); writer.dispose(); ios.close()
    val rows = Seq(MediaRow(1L, bos.toByteArray, "image", "gif"),
      MediaRow(2L, Array.tabulate(600)(_.toByte), "video", "bin"))
    val frames = Multimodal.sampleFrames(rows.toDS(), stride = 2)
      .collect().sortBy(f => (f.doc_id, f.frame_idx))
    // gif: frames 0 and 2 sampled, decoded to P6 with the true colors
    val gifFrames = frames.filter(_.doc_id == 1L)
    assert(gifFrames.map(_.frame_idx).toSeq == Seq(0, 2))
    val decoded = Multimodal.decodeImages(gifFrames.map(f =>
      MediaRow(f.frame_idx.toLong, f.frame, "image", "ppm")).toSeq.toDS())
      .collect().sortBy(_.doc_id)
    assert(decoded.map(_.width).toSeq == Seq(4, 4))
    assert(decoded.map(_.mean_intensity).toSeq == Seq(20.0, 100.0)) // (10+20+30)/3, +80
    // non-decodable payloads keep the stub chunker
    val stub = frames.filter(_.doc_id == 2L)
    assert(stub.map(_.frame_idx).toSeq == Seq(0, 2) &&
      stub.map(_.frame.length).toSeq == Seq(256, 88)) // 600 = 256+256+88
  }

  test("sampleFrames: MJPEG-in-AVI chunks decode as real frames") {
    import spark.implicits._
    import graft.tools.MediaFixtures
    val jpegs = (0 until 3).map(f => MediaFixtures.solidJpeg(12, 8, 0x406080 + f * 0x101010))
    val avi = MediaFixtures.mjpegAvi(jpegs)
    val frames = Multimodal.sampleFrames(
      Seq(MediaRow(4L, avi, "video", "avi")).toDS(), stride = 2)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2))
    val dec = Multimodal.decodeImages(frames.map(f =>
      MediaRow(f.frame_idx.toLong, f.frame, "image", "ppm")).toSeq.toDS())
      .collect().sortBy(_.doc_id)
    assert(dec.forall(d => d.width == 12 && d.height == 8 && d.channels == 3), dec.toSeq)
    // frame 2 is brighter than frame 0 (decode-vs-decode of real JPEGs)
    assert(dec(1).mean_intensity > dec(0).mean_intensity, dec.toSeq)
    // a video chunk that is not an image refuses (falls to the chunker)
    val bad = MediaFixtures.mjpegAvi(Seq(jpegs.head, "junk".getBytes))
    val fb = Multimodal.sampleFrames(
      Seq(MediaRow(5L, bad, "video", "avi")).toDS(), stride = 1).collect()
    assert(fb.forall(f => !(new String(f.frame.take(2)) == "P6")), "must not mix real and stub")
  }

  test("sampleFrames deinterlaces: rows land at display positions, not storage order") {
    import spark.implicits._
    // 4x8 indexed image, ROW-coded colors; the JDK writer emits it
    // INTERLACED (storage order 0,4,2,6,1,3,5,7), so any frame
    // re-encode that skips deinterlacing misplaces 6 of 8 rows
    val (w, h) = (4, 8)
    val palette = Array.tabulate(h)(y => (10 * y + 5) * 0x010101)
    val icm = new java.awt.image.IndexColorModel(8, palette.length, palette, 0,
      false, -1, java.awt.image.DataBuffer.TYPE_BYTE)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, palette(y))
    val bytes = encode(img, "gif")
    val descIdx = bytes.indexOf(0x2C.toByte)
    assert(descIdx > 0 && (bytes(descIdx + 9) & 0x40) != 0, "fixture not interlaced")
    val frames = Multimodal.sampleFrames(
      Seq(MediaRow(1L, bytes, "image", "gif")).toDS(), stride = 1).collect()
    assert(frames.length == 1)
    val p6 = frames.head.frame
    val headerLen = s"P6\n$w $h\n255\n".length
    for (y <- 0 until h) {
      val v = p6(headerLen + y * w * 3) & 0xFF // red of first pixel in row y
      assert(v == 10 * y + 5, s"row $y has value $v (misplaced rows?)")
    }
  }

  test("resizeImages: real box-filter downscale, P6 re-encode, stub fallback") {
    import spark.implicits._
    // 4x2 P6: pixel (y,x,c) = (y*4+x)*3 + c; factor 2 -> 2x1
    val header = "P6\n4 2\n255\n".getBytes("US-ASCII")
    val px = Array.tabulate[Byte](24)(_.toByte)
    val rows = Seq(
      MediaRow(1L, header ++ px, "image", "ppm"),
      MediaRow(2L, "not an image".getBytes, "image", "png"))
    val out = Multimodal.resizeImages(rows.toDS(), factor = 2)
      .collect().sortBy(_.doc_id)
    // block (0,0): pixels 0,1 / 4,5 -> per-channel floor means
    val dec = Multimodal.decodeImages(
      Seq(out(0)).toDS()).collect().head
    assert(dec.width == 2 && dec.height == 1 && dec.channels == 3)
    // channel value of out pixel (0, x', c) = mean of 4 interleaved
    // samples: ((0x'c)+(0,x'+1,c)+(1,x',c)+(1,x'+1,c))/4
    def p(y: Int, x: Int, c: Int) = (y * 4 + x) * 3 + c
    val want = (for (x <- 0 until 2; c <- 0 until 3) yield
      (p(0, 2 * x, c) + p(0, 2 * x + 1, c) + p(1, 2 * x, c) + p(1, 2 * x + 1, c)) / 4)
    assert(dec.mean_intensity == want.sum.toDouble / want.size)
    // a real PNG through ImageIO decodes and downsizes too
    val img = makeImage(6, 4, 10)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = Multimodal.resizeImages(
      Seq(MediaRow(3L, baos.toByteArray, "image", "png")).toDS(), 2)
      .collect().head
    val pngDec = Multimodal.decodeImages(Seq(png).toDS()).collect().head
    assert(pngDec.width == 3 && pngDec.height == 2 && png.format == "ppm")
    // undecodable payloads keep the stub truncate contract
    assert(out(1).format == "bin" &&
      out(1).content.length == "not an image".length / 4)
  }

  test("resampleAudio: 8/16/24/32-bit PCM all decimate exactly") {
    import spark.implicits._
    // mono 8-bit, 8 frames of 0,10,20,...,70 -> factor 2 means 5,25,45,65
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
      out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF) }
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write("RIFF".getBytes); w32(36 + 8); out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); w32(16); w16(1); w16(1); w32(8000)
    w32(8000); w16(1); w16(8)
    out.write("data".getBytes); w32(8)
    (0 until 8).foreach(i => out.write(i * 10))
    val rows = Seq(Multimodal.MediaRow(1L, out.toByteArray, "audio", "wav")).toDS()
    val resampled = Multimodal.resampleAudio(rows, factor = 2).collect().head
    val dec = Multimodal.decodeAudio(Seq(resampled).toDS()).collect().head
    assert(dec.channels == 1 && dec.sample_rate == 4000 && dec.n_samples == 4, dec)
    assert(dec.mean_level == (5 + 25 + 45 + 65) / 4.0 / 255.0, dec)
    // 16-bit signed PCM: floor mean in the offset-binary domain
    val o16 = new java.io.ByteArrayOutputStream()
    def p16(v: Int): Unit = { o16.write(v & 0xFF); o16.write((v >> 8) & 0xFF) }
    o16.write("RIFF".getBytes)
    p16(36 + 8); p16(0); o16.write("WAVE".getBytes)
    o16.write("fmt ".getBytes); p16(16); p16(0); p16(1); p16(1)
    p16(8000); p16(0); p16(16000); p16(0); p16(2); p16(16)
    o16.write("data".getBytes); p16(8); p16(0)
    Seq(-100, 300, -50, 70).foreach(s => p16(s & 0xFFFF))
    val dec16 = Multimodal.decodeAudio(Multimodal.resampleAudio(
      Seq(Multimodal.MediaRow(2L, o16.toByteArray, "audio", "wav")).toDS(), 2)
      .map(identity)).collect().head
    // means of (-100,300) and (-50,70) -> signed 100 and 10
    assert(dec16.n_samples == 2 && dec16.sample_rate == 4000, dec16)
    assert(dec16.mean_level ==
      ((100 + 32768).toDouble + (10 + 32768)) / 2.0 / 65535.0, dec16)
    // 32-bit signed PCM decimates too (r13: all four PCM widths real)
    val o32 = new java.io.ByteArrayOutputStream()
    def q16(v: Int): Unit = { o32.write(v & 0xFF); o32.write((v >> 8) & 0xFF) }
    def q32(v: Int): Unit = { q16(v & 0xFFFF); q16((v >> 16) & 0xFFFF) }
    o32.write("RIFF".getBytes)
    q16(36 + 16); q16(0); o32.write("WAVE".getBytes)
    o32.write("fmt ".getBytes); q16(16); q16(0); q16(1); q16(1)
    q16(8000); q16(0); q16(32000); q16(0); q16(4); q16(32)
    o32.write("data".getBytes); q16(16); q16(0)
    Seq(100, 300, -50, 70).foreach(q32)
    val dec32 = Multimodal.decodeAudio(Multimodal.resampleAudio(
      Seq(Multimodal.MediaRow(3L, o32.toByteArray, "audio", "wav")).toDS(), 2)
      .map(identity)).collect().head
    assert(dec32.n_samples == 2 && dec32.sample_rate == 4000, dec32)
    assert(dec32.mean_level ==
      ((200.0 + (1L << 31)) + (10.0 + (1L << 31))) / 2.0 /
        ((1L << 32) - 1).toDouble, dec32)
    // and 24-bit: same offset-binary block means, 3-byte LE re-encode
    val o24 = new java.io.ByteArrayOutputStream()
    def r16(v: Int): Unit = { o24.write(v & 0xFF); o24.write((v >> 8) & 0xFF) }
    def r24(v: Int): Unit = { o24.write(v & 0xFF); o24.write((v >> 8) & 0xFF)
      o24.write((v >> 16) & 0xFF) }
    o24.write("RIFF".getBytes)
    r16(36 + 12); r16(0); o24.write("WAVE".getBytes)
    o24.write("fmt ".getBytes); r16(16); r16(0); r16(1); r16(1)
    r16(8000); r16(0); r16(24000); r16(0); r16(3); r16(24)
    o24.write("data".getBytes); r16(12); r16(0)
    Seq(-1000, 3000, 500, -700).foreach(r24)
    val dec24 = Multimodal.decodeAudio(Multimodal.resampleAudio(
      Seq(Multimodal.MediaRow(4L, o24.toByteArray, "audio", "wav")).toDS(), 2)
      .map(identity)).collect().head
    assert(dec24.n_samples == 2 && dec24.sample_rate == 4000, dec24)
    // block means: (-1000+3000)/2 = 1000, (500-700)/2 = -100
    assert(dec24.mean_level ==
      ((1000.0 + (1 << 23)) + (-100.0 + (1 << 23))) / 2.0 /
        ((1 << 24) - 1).toDouble, dec24)
  }

  test("WAV bitrate reflects the real sample width") {
    // 16-bit stereo 8000 Hz -> 8000*2*16/1000 = 256 kbps (was 2-4x
    // under-reported when 8 bits was assumed for every width)
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Int): Unit = { w16(v & 0xFFFF); w16((v >> 16) & 0xFFFF) }
    out.write("RIFF".getBytes); w32(36 + 8); out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); w32(16)
    w16(1); w16(2); w32(8000); w32(8000 * 2 * 2); w16(4); w16(16)
    out.write("data".getBytes); w32(8)
    (0 until 4).foreach(_ => w16(0))
    import spark.implicits._
    val meta = Multimodal.audioMeta(
      Seq(Multimodal.MediaRow(1L, out.toByteArray, "audio", "wav")).toDS())
      .collect().head
    assert(meta.codec == "pcm" && meta.bitrate_kbps == 256, meta)
  }

  test("audioMeta labels AIFF and AU containers with their own codecs") {
    import spark.implicits._
    // minimal mono 16-bit AIFF, 2 frames @ 8000 Hz
    val oa = new java.io.ByteArrayOutputStream()
    def b32(v: Long): Unit = { oa.write((v >> 24).toInt & 0xFF); oa.write((v >> 16).toInt & 0xFF)
      oa.write((v >> 8).toInt & 0xFF); oa.write(v.toInt & 0xFF) }
    def b16(v: Int): Unit = { oa.write((v >> 8) & 0xFF); oa.write(v & 0xFF) }
    oa.write("FORM".getBytes); b32(4 + 26 + 16 + 4); oa.write("AIFF".getBytes)
    oa.write("COMM".getBytes); b32(18); b16(1); b32(2); b16(16)
    b16(16383 + 12); b32(8000L << 19); b32(0)
    oa.write("SSND".getBytes); b32(8 + 4); b32(0); b32(0)
    Seq(1000, -1000).foreach(b16)
    // minimal mono u-law AU, 4 samples @ 8000 Hz
    val ou = new java.io.ByteArrayOutputStream()
    def a32(v: Long): Unit = { ou.write((v >> 24).toInt & 0xFF); ou.write((v >> 16).toInt & 0xFF)
      ou.write((v >> 8).toInt & 0xFF); ou.write(v.toInt & 0xFF) }
    ou.write(".snd".getBytes); a32(24); a32(4); a32(1); a32(8000); a32(1)
    Seq(0x00, 0x7F, 0x80, 0xFF).foreach(ou.write)
    val metas = Multimodal.audioMeta(Seq(
      Multimodal.MediaRow(1L, oa.toByteArray, "audio", "aiff"),
      Multimodal.MediaRow(2L, ou.toByteArray, "audio", "au")).toDS())
      .collect().sortBy(_.doc_id)
    assert(metas(0).codec == "aiff" && metas(0).sample_rate == 8000 &&
      metas(0).n_frames == 2 && metas(0).bitrate_kbps == 8000 * 16 / 1000, metas(0))
    // u-law expands to 16-bit linear, so the bitrate reports the
    // DECODED width (8000*1*16/1000 = 128 kbps)
    assert(metas(1).codec == "au" && metas(1).n_frames == 4 &&
      metas(1).bitrate_kbps == 128, metas(1))
  }

  test("MP4 moov/mvhd/tkhd metadata parses for real") {
    val out = new java.io.ByteArrayOutputStream()
    def be32(v: Int): Unit = { out.write((v >> 24) & 0xFF); out.write((v >> 16) & 0xFF)
      out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    def box(name: String, payloadLen: Int): Unit = {
      be32(8 + payloadLen); out.write(name.getBytes("ISO-8859-1")) }
    box("ftyp", 8); out.write("isom".getBytes); be32(0)
    box("moov", 108 + 100 + 100)
    box("mvhd", 100)
    be32(0); be32(0); be32(0); be32(600); be32(3000) // timescale 600, dur 3000
    (0 until 20).foreach(_ => be32(0))
    def tkhd(w: Int, h: Int): Unit = {
      box("trak", 92); box("tkhd", 84)
      (0 until 19).foreach(_ => be32(0)); be32(w << 16); be32(h << 16)
    }
    tkhd(1280, 720); tkhd(0, 0) // video + audio track
    val m = Multimodal.mp4Meta(out.toByteArray).get
    assert(m.width == 1280 && m.height == 720)
    assert(m.timescale == 600L && math.abs(m.duration_ms - 5000.0) < 1e-9)
    assert(m.n_tracks == 2)
    assert(Multimodal.mp4Meta("RIFF not a movie".getBytes).isEmpty)
    // videoMeta dataset path picks the MP4 branch
    val v = Multimodal.videoMeta(Seq(
      MediaRow(9L, out.toByteArray, "video", "mp4")).toDS()).collect()(0)
    assert(v.width == 1280 && v.height == 720 && v.total_frames == 0L)
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

  test("audioFingerprint: hand-checked loudness bits, non-PCM empty") {
    def wav(samples: Array[Int]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def w32(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
        out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF) }
      def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
      out.write("RIFF".getBytes); w32(36 + samples.length); out.write("WAVE".getBytes)
      out.write("fmt ".getBytes); w32(16); w16(1); w16(1); w32(8000)
      w32(8000); w16(1); w16(8)
      out.write("data".getBytes); w32(samples.length)
      samples.foreach(s => out.write(s & 0xFF))
      out.toByteArray
    }
    // 130 samples strictly ascending -> every window louder than the
    // last -> all 64 bits set
    val asc = wav(Array.tabulate(130)(identity))
    val flat = wav(Array.fill(130)(42))
    val rows = Seq(
      MediaRow(1L, asc, "audio", "wav"),
      MediaRow(2L, flat, "audio", "wav"),
      MediaRow(3L, Array[Byte](9, 9, 9), "audio", "junk")).toDS()
    val got = Multimodal.audioFingerprint(rows).collect().map(r => r.doc_id -> r).toMap
    assert(got(1L).afp_bits == "1" * 64 && got(1L).afp == -1L, got(1L).toString)
    assert(got(2L).afp_bits == "0" * 64 && got(2L).afp == 0L)
    assert(got(3L).afp_bits == "")
    // identical audio -> identical fingerprint, pairs at hamming 0
    val dup = Seq(MediaRow(1L, asc, "audio", "wav"),
      MediaRow(100L, asc, "audio", "wav")).toDS()
    val hashes = Multimodal.audioFingerprint(dup).toDF()
    val pairs = graft.ops.Dedup.hash64NearDups(hashes, "doc_id", "afp", maxHamming = 0)
      .collect()
    assert(pairs.length == 1 && pairs(0).getLong(0) == 1L && pairs(0).getLong(1) == 100L)
  }

  test("dHash: hand-checked bits, codec-invariant, undecodable empty") {
    // 9x8 gradient: gray strictly increases left-to-right -> all bits 1
    def ppm(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
      val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
      header ++ Array.tabulate[Byte](w * h * 3) { j =>
        val p = j / 3; px(p % w, p / w).toByte
      }
    }
    val grad = ppm(9, 8, (x, _) => x * 20)
    val flat = ppm(9, 8, (_, _) => 7)
    val rows = Seq(
      MediaRow(1L, grad, "image", "ppm"),
      MediaRow(2L, flat, "image", "ppm"),
      MediaRow(3L, Array[Byte](1, 2, 3), "image", "junk")).toDS()
    val got = Multimodal.imageDHash(rows).collect().map(r => r.doc_id -> r).toMap
    assert(got(1L).dhash_bits == "1" * 64 && got(1L).dhash == -1L,
      s"monotone gradient must set every bit: ${got(1L)}")
    assert(got(2L).dhash_bits == "0" * 64 && got(2L).dhash == 0L)
    assert(got(3L).dhash_bits == "" && got(3L).dhash == 0L)
    // codec invariance: the same pixels through PNG (ImageIO path)
    // hash identically to the P6 path
    val img = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 9)
      img.setRGB(x, y, (x * 20 << 16) | (x * 20 << 8) | (x * 20))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = Seq(MediaRow(9L, baos.toByteArray, "image", "png")).toDS()
    assert(Multimodal.imageDHash(png).head().dhash == got(1L).dhash,
      "PNG and PPM of identical pixels must hash identically")
  }

  // ---- AAC-LC (ADTS) zero-codebook subset: frames come from the
  // SHARED MediaFixtures writers (one byte layout for oracles + specs)

  private def aacSilenceFrame(channels: Int, sfi: Int, maxSfb: Int): Array[Byte] =
    graft.tools.MediaFixtures.adtsFrame(sfi, channels,
      graft.tools.MediaFixtures.aacSilenceRawFrame(channels == 1, maxSfb))

  test("AAC-LC zero-codebook subset: silence decodes sample-exact; anything else declines") {
    // mono long-window, 3 frames at 44100
    val mono = (0 until 3).map(_ => aacSilenceFrame(1, 4, 20))
      .reduce(_ ++ _)
    val d1 = Multimodal.decodeAacLc(mono).get
    assert(d1.channels == 1 && d1.rate == 44100 && d1.nSamples == 3 * 1024L)
    assert(d1.meanLevel == 0.0)
    assert(math.abs(d1.durationMs - 3 * 1024000.0 / 44100) < 1e-9)
    // stereo CPE eight-short with grouping + MS mask, 2 frames at 48000
    val st = (0 until 2).map(_ => aacSilenceFrame(2, 3, 5)).reduce(_ ++ _)
    val d2 = Multimodal.decodeAacLc(st).get
    assert(d2.channels == 2 && d2.rate == 48000 && d2.nSamples == 2 * 2 * 1024L)
    // max_sfb = 0 (no sections at all) is legal silence too
    assert(Multimodal.decodeAacLc(aacSilenceFrame(1, 11, 0)).get.rate == 8000)
    // a frame whose section codebook is nonzero must DECLINE, not fake
    val nz = aacSilenceFrame(1, 4, 20)
    // SCE starts right after the 7-byte header; sect_cb is bits 17-20
    // of the payload (3+4+8+1+2+1+6+1 = 26 bits in, i.e. payload bits
    // 26..29) - flip one bit inside the sect_cb field
    val bitIndex = 7 * 8 + 26
    nz(bitIndex / 8) = (nz(bitIndex / 8) | (1 << (7 - (bitIndex % 8)))).toByte
    assert(Multimodal.decodeAacLc(nz).isEmpty,
      "non-zero codebook must fall to the documented fallback")
    // non-LC profile declines
    val lt = aacSilenceFrame(1, 4, 20)
    lt(2) = (lt(2) & 0x3F).toByte // profile 0 (Main)
    assert(Multimodal.decodeAacLc(lt).isEmpty)
    // and the decodeAudio chain routes ADTS through the real decoder
    val ds = Seq(MediaRow(1L, mono, "audio", "aac")).toDS()
    val row = Multimodal.decodeAudio(ds).head()
    assert(row.channels == 1 && row.sample_rate == 44100 &&
      row.n_samples == 3 * 1024L && row.mean_level == 0.0)
  }
}
