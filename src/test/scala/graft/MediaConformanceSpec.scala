package graft

import graft.ops.Multimodal

/** Conformance of the pure-Scala media decoders against INDEPENDENT
  * implementations, on files produced by third-party encoders (see
  * src/test/resources/fixtures/README.md). This closes the structural
  * blind spot of the planted `media_*` oracles: there, the same closed
  * form plants and re-derives the payload, so a decoder bug mirrored
  * in the planter would be invisible; here, neither the file bytes nor
  * the reference decoder share anything with our code. */
class MediaConformanceSpec extends SparkSpec {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    assert(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  // ---- GIF: our LZW/interlace decoder vs the JDK ImageIO GIF reader

  /** ImageIO frame-0 pixels as (argb, w, h). */
  private def imageIoPixels(bytes: Array[Byte]): (Array[Int], Int, Int) = {
    javax.imageio.ImageIO.setUseCache(false)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO could not read fixture")
    val (w, h) = (img.getWidth, img.getHeight)
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { px(y * w + x) = img.getRGB(x, y); x += 1 }
      y += 1
    }
    (px, w, h)
  }

  private def gifConformance(name: String): Unit = {
    val bytes = fixture(name)
    val ours = Multimodal.gifFrames(bytes)
    assert(ours.isDefined, s"$name: gifFrames declined a real single-frame GIF")
    val Seq((_, w, h, rgb)) = ours.get
    val (ref, rw, rh) = imageIoPixels(bytes)
    assert((w, h) == (rw, rh), s"$name: size ${(w, h)} vs ImageIO ${(rw, rh)}")
    var mismatches = 0
    var compared = 0
    var i = 0
    while (i < rgb.length) {
      val alpha = (ref(i) >>> 24) & 0xFF
      // transparent pixels have no defined standalone RGB (they mean
      // "show what's behind"); our renderer paints the palette entry,
      // ImageIO reports alpha=0 — only opaque pixels are comparable
      if (alpha == 0xFF) {
        compared += 1
        if ((ref(i) & 0xFFFFFF) != rgb(i)) mismatches += 1
      }
      i += 1
    }
    assert(compared > (w * h) / 2, s"$name: too few opaque pixels ($compared)")
    assert(mismatches == 0,
      s"$name: $mismatches of $compared opaque pixels differ from ImageIO")
  }

  test("GIF conformance: non-interlaced third-party files decode pixel-equal to ImageIO") {
    gifConformance("logo64.gif")
    gifConformance("logo100.gif")
    gifConformance("redhat.gif")
  }

  test("GIF conformance: transparency fixture (python.gif) matches on opaque pixels") {
    gifConformance("python.gif")
  }

  test("GIF conformance: interlaced fixture (tai-ku.gif) matches ImageIO") {
    gifConformance("tai-ku.gif")
  }

  // ---- WAV: our RIFF/PCM reader vs javax.sound.sampled

  /** Independent decode: AudioSystem frames -> normalized [0,1] mean
    * over all interleaved samples, plus the stream layout. */
  private def audioSystemDecode(bytes: Array[Byte])
      : (Int, Int, Int, Long, Double) = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = in.getFormat
    val data = in.readAllBytes()
    in.close()
    val bits = fmt.getSampleSizeInBits
    val channels = fmt.getChannels
    val bytesPer = bits / 8
    val nSamples = data.length.toLong / bytesPer
    val full = (1L << bits) - 1
    var sum = 0.0
    var i = 0
    while (i + bytesPer <= data.length) {
      // little-endian raw value
      var v = 0L
      var b = 0
      while (b < bytesPer) { v |= (data(i + b) & 0xFFL) << (8 * b); b += 1 }
      // 8-bit WAV is unsigned; wider widths are signed two's
      // complement, mapped to the same unsigned 0..2^bits-1 scale our
      // decoder uses
      val u = if (bits == 8) v
        else {
          val shift = 64 - bits
          val signed = (v << shift) >> shift
          signed + (1L << (bits - 1))
        }
      sum += u.toDouble / full
      i += bytesPer
    }
    (channels, fmt.getSampleRate.toInt, bits, nSamples, sum / nSamples)
  }

  private def wavConformance(name: String): Unit = {
    val bytes = fixture(name)
    val ours = Multimodal.decodeWav(bytes)
    assert(ours.isDefined, s"$name: decodeWav declined a real PCM WAV")
    val d = ours.get
    val (channels, rate, bits, nSamples, mean) = audioSystemDecode(bytes)
    assert(d.channels == channels, s"$name channels ${d.channels} vs $channels")
    assert(d.rate == rate, s"$name rate ${d.rate} vs $rate")
    assert(d.bits == bits, s"$name bits ${d.bits} vs $bits")
    assert(d.nSamples == nSamples, s"$name samples ${d.nSamples} vs $nSamples")
    assert(math.abs(d.meanLevel - mean) < 1e-9,
      s"$name mean ${d.meanLevel} vs AudioSystem $mean")
  }

  test("WAV conformance: pluck fixtures at 8/16/24/32-bit match javax.sound") {
    wavConformance("pluck-pcm8.wav")
    wavConformance("pluck-pcm16.wav")
    wavConformance("pluck-pcm24.wav")
    wavConformance("pluck-pcm32.wav")
  }
}
