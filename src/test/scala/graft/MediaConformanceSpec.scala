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

  // ---- Animated GIF compositing: the JDK GIF *writer* is an
  // independent third-party ENCODER — it builds its own LZW streams,
  // sub-block layout and GCE metadata. We feed it known rasters with
  // sub-rect offsets, transparency and disposal methods, then check
  // gifFramesComposited reproduces the reference composite of those
  // known rasters pixel-for-pixel.

  /** Write an animated GIF via ImageIO: frames of (left, top, raster
    * w x h of palette indices) with per-frame disposal. Palette:
    * index 0 black, 1 red, 2 green, 3 blue; index 3 is declared
    * TRANSPARENT on frames beyond the first. */
  private def jdkAnimatedGif(screenW: Int, screenH: Int,
      frames: Seq[(Int, Int, Int, Int, Array[Byte], String)]): Array[Byte] = {
    import javax.imageio.{ImageIO, IIOImage, ImageTypeSpecifier}
    import javax.imageio.metadata.IIOMetadataNode
    val cmap = Array(0xFF000000, 0xFFFF0000, 0xFF00FF00, 0xFF0000FF)
    val out = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.zipWithIndex.foreach { case ((left, top, w, h, data, disposal), i) =>
      val transIdx = if (i == 0) -1 else 3
      val icm = new java.awt.image.IndexColorModel(2, 4,
        cmap.map(c => ((c >> 16) & 0xFF).toByte),
        cmap.map(c => ((c >> 8) & 0xFF).toByte),
        cmap.map(c => (c & 0xFF).toByte),
        transIdx)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
      var p = 0
      while (p < data.length) { img.getRaster.setSample(p % w, p / w, 0, data(p)); p += 1 }
      val meta = writer.getDefaultImageMetadata(
        new ImageTypeSpecifier(img), writer.getDefaultWriteParam)
      val fmt = meta.getNativeMetadataFormatName
      val root = meta.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
      def child(name: String): IIOMetadataNode = {
        val kids = root.getElementsByTagName(name)
        if (kids.getLength > 0) kids.item(0).asInstanceOf[IIOMetadataNode]
        else { val n = new IIOMetadataNode(name); root.appendChild(n); n }
      }
      val gce = child("GraphicControlExtension")
      gce.setAttribute("disposalMethod", disposal)
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", if (transIdx >= 0) "TRUE" else "FALSE")
      gce.setAttribute("delayTime", "10")
      gce.setAttribute("transparentColorIndex", if (transIdx >= 0) "3" else "0")
      val desc = child("ImageDescriptor")
      desc.setAttribute("imageLeftPosition", left.toString)
      desc.setAttribute("imageTopPosition", top.toString)
      desc.setAttribute("imageWidth", w.toString)
      desc.setAttribute("imageHeight", h.toString)
      desc.setAttribute("interlaceFlag", "FALSE")
      if (i == 0) { // pin the logical screen on the stream metadata
        val smeta = writer.getDefaultStreamMetadata(writer.getDefaultWriteParam)
        val sroot = smeta.getAsTree(smeta.getNativeMetadataFormatName)
          .asInstanceOf[IIOMetadataNode]
        val lsd = sroot.getElementsByTagName("LogicalScreenDescriptor").item(0)
          .asInstanceOf[IIOMetadataNode]
        lsd.setAttribute("logicalScreenWidth", screenW.toString)
        lsd.setAttribute("logicalScreenHeight", screenH.toString)
        smeta.setFromTree(smeta.getNativeMetadataFormatName, sroot)
        writer.prepareWriteSequence(smeta)
      }
      meta.setFromTree(fmt, root)
      writer.writeToSequence(new IIOImage(img, null, meta),
        writer.getDefaultWriteParam)
    }
    writer.endWriteSequence()
    ios.close()
    out.toByteArray
  }

  test("animated GIF compositing: JDK-encoded sub-rect/transparent/disposal frames") {
    val W = 8; val H = 6
    val cmap = Array(0x000000, 0xFF0000, 0x00FF00, 0x0000FF)
    // frame 0: full screen, all red
    val f0 = Array.fill[Byte](W * H)(1)
    // frame 1: 3x2 green patch at (2,1), rest transparent (index 3);
    //          disposal none -> patch persists
    val f1 = Array.tabulate[Byte](4 * 3)(p => if (p % 4 < 3 && p / 4 < 2) 2 else 3)
    // frame 2: 2x2 blue-ish patch at (5,3) declared restoreToBackground
    val f2 = Array.fill[Byte](2 * 2)(2)
    // frame 3: single green pixel at (0,0) — checks frame 2's rect was
    //          cleared to background before this frame
    val f3 = Array.fill[Byte](1)(2)
    val gif = jdkAnimatedGif(W, H, Seq(
      (0, 0, W, H, f0, "none"),
      (2, 1, 4, 3, f1, "doNotDispose"),
      (5, 3, 2, 2, f2, "restoreToBackgroundColor"),
      (0, 0, 1, 1, f3, "doNotDispose")))

    // the fast path must decline (composited), the compositor decode
    assert(Multimodal.gifFrames(gif).isEmpty)
    val got = Multimodal.gifFramesComposited(gif).get
    assert(got.length == 4 && got.forall(f => f._2 == W && f._3 == H))

    // reference composite from the KNOWN input rasters
    val bgOfStream = {
      // JDK writer picks the background index itself; read it back
      // from the emitted logical screen descriptor
      val bgIdx = gif(11) & 0xFF
      cmap(bgIdx & 3)
    }
    val canvas = Array.fill(W * H)(bgOfStream)
    def draw(left: Int, top: Int, w: Int, h: Int, data: Array[Byte],
        trans: Int): Unit = {
      var p = 0
      while (p < data.length) {
        val x = left + p % w; val y = top + p / w
        if (x < W && y < H && data(p) != trans) canvas(y * W + x) = cmap(data(p))
        p += 1
      }
    }
    draw(0, 0, W, H, f0, -1)
    assert(got(0)._4.toSeq == canvas.toSeq, "frame 0 composite")
    draw(2, 1, 4, 3, f1, 3)
    assert(got(1)._4.toSeq == canvas.toSeq, "frame 1 composite (transparency)")
    val before2 = canvas.clone()
    draw(5, 3, 2, 2, f2, 3)
    assert(got(2)._4.toSeq == canvas.toSeq, "frame 2 composite")
    // disposal 2: frame 2's rect restored to background before frame 3
    System.arraycopy(before2, 0, canvas, 0, canvas.length)
    for (y <- 3 until 5; x <- 5 until 7) canvas(y * W + x) = bgOfStream
    draw(0, 0, 1, 1, f3, 3)
    assert(got(3)._4.toSeq == canvas.toSeq, "frame 3 after restore-to-background")
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

  /** AIFF/AU conformance vs javax.sound: decode via our pure-Scala
    * parser and via AudioSystem (converting G.711 to 16-bit linear
    * through the JDK's own codec), compare layout exactly and the
    * offset-binary mean to 1e-9. */
  private def auAiffConformance(name: String): Unit = {
    val bytes = fixture(name)
    val ours = (if (name.endsWith(".au")) Multimodal.decodeAu(bytes)
      else Multimodal.decodeAiff(bytes))
    assert(ours.isDefined, s"$name: decoder declined a real payload")
    val d = ours.get
    val in0 = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val f0 = in0.getFormat
    // G.711 sources convert through the JDK codec to 16-bit linear —
    // the same expansion our formula-based decoder performs
    val (in, fmt) =
      if (f0.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          f0.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED)
        (in0, f0)
      else {
        val target = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          f0.getSampleRate, 16, f0.getChannels, 2 * f0.getChannels,
          f0.getSampleRate, true)
        (javax.sound.sampled.AudioSystem.getAudioInputStream(target, in0), target)
      }
    val data = in.readAllBytes()
    in.close()
    val bits = fmt.getSampleSizeInBits
    val bytesPer = bits / 8
    val nSamples = data.length.toLong / bytesPer
    val big = fmt.isBigEndian
    val full = (1L << bits) - 1
    var sum = 0.0
    var i = 0
    while (i + bytesPer <= data.length) {
      var v = 0L
      var b = 0
      while (b < bytesPer) {
        val by = data(i + (if (big) b else bytesPer - 1 - b)) & 0xFFL
        v = (v << 8) | by; b += 1
      }
      val shift = 64 - bits
      val signed = (v << shift) >> shift
      sum += (signed + (1L << (bits - 1))).toDouble / full
      i += bytesPer
    }
    assert(d.channels == fmt.getChannels, s"$name ch ${d.channels}")
    assert(d.rate == fmt.getSampleRate.toInt, s"$name rate ${d.rate}")
    assert(d.nSamples == nSamples, s"$name samples ${d.nSamples} vs $nSamples")
    assert(math.abs(d.meanLevel - sum / nSamples) < 1e-9,
      s"$name mean ${d.meanLevel} vs javax.sound ${sum / nSamples}")
  }

  test("AIFF conformance: pluck fixtures at 8/16/24-bit match CPython aifc") {
    // the JDK AiffFileReader rejects these files (it chokes on the
    // NAME/AUTH annotation chunks), so the independent reference here
    // is CPython's aifc module — these constants are its exact output
    // (channels, rate, sample count, offset-binary mean) computed from
    // the same fixture bytes; see fixtures README
    val expect = Map(
      "pluck-pcm8.aiff" -> (2, 11025, 6614L, 0.49892207260890364),
      "pluck-pcm16.aiff" -> (2, 11025, 6614L, 0.4989381714076337),
      "pluck-pcm24.aiff" -> (2, 11025, 6614L, 0.4989306066175265))
    expect.foreach { case (name, (ch, rate, n, mean)) =>
      val d = Multimodal.decodeAiff(fixture(name)).getOrElse(
        fail(s"$name: decoder declined a real AIFF"))
      assert(d.channels == ch && d.rate == rate && d.nSamples == n,
        s"$name layout: $d")
      assert(math.abs(d.meanLevel - mean) < 1e-12,
        s"$name mean ${d.meanLevel} vs aifc $mean")
    }
    // G.711 A-law AIFC decodes for REAL: constants are CPython
    // aifc+audioop's exact output on the same fixture bytes (the JDK
    // reader rejects the file outright; audioop's A-law table equals
    // our formula byte-for-byte — verified over all 256 codes)
    val alaw = Multimodal.decodeAiff(fixture("pluck-alaw.aifc")).getOrElse(
      fail("pluck-alaw.aifc: decoder declined a real A-law AIFC"))
    assert(alaw.channels == 2 && alaw.rate == 11025 && alaw.nSamples == 6614,
      s"alaw layout: $alaw")
    assert(math.abs(alaw.meanLevel - 0.49892715971857604) < 1e-12,
      s"alaw mean ${alaw.meanLevel} vs audioop 0.49892715971857604")
  }

  test("WAV G.711 + IEEE-float conformance: JDK-encoded pluck round-trips") {
    import javax.sound.sampled._
    val src = fixture("pluck-pcm16.wav")
    def stream() = AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(src))
    val f = stream().getFormat

    // G.711: the JDK writes the µ-law/A-law WAV (fmt 7/6) and also
    // serves as the reference decoder back to 16-bit linear — full
    // independence from our parser AND our expansion formulas
    for (enc <- Seq(AudioFormat.Encoding.ULAW, AudioFormat.Encoding.ALAW)) {
      val tgt = new AudioFormat(enc, f.getSampleRate, 8, f.getChannels,
        f.getChannels, f.getSampleRate, false)
      val bo = new java.io.ByteArrayOutputStream()
      AudioSystem.write(AudioSystem.getAudioInputStream(tgt, stream()),
        AudioFileFormat.Type.WAVE, bo)
      val wav = bo.toByteArray
      val ours = Multimodal.decodeWav(wav).getOrElse(
        fail(s"$enc WAV: decoder declined a JDK-encoded file"))
      // JDK reference: decode the G.711 wav back to PCM16 via its codec
      val lin = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        f.getSampleRate, 16, f.getChannels, 2 * f.getChannels, f.getSampleRate, false)
      val ref = AudioSystem.getAudioInputStream(lin,
        AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(wav)))
      val data = ref.readAllBytes(); ref.close()
      var sum = 0.0
      var i = 0
      while (i + 2 <= data.length) {
        val s = ((data(i) & 0xFF) | (data(i + 1) << 8)).toShort
        sum += (s + 32768).toDouble / 65535
        i += 2
      }
      val n = data.length / 2
      assert(ours.channels == f.getChannels && ours.rate == f.getSampleRate.toInt &&
        ours.nSamples == n, s"$enc layout: $ours vs n=$n")
      assert(ours.bits == 16, s"$enc reported bits ${ours.bits}")
      assert(math.abs(ours.meanLevel - sum / n) < 1e-9,
        s"$enc mean ${ours.meanLevel} vs JDK ${sum / n}")
    }

    // IEEE float 32/64: the JDK converts and writes (fmt 3); the
    // reference mean comes from the JDK's CONVERTED sample bytes read
    // via ByteBuffer — pins our header walk, data offset, and LE
    // sample extraction against the JDK writer
    for (bits <- Seq(32, 64)) {
      val tgt = new AudioFormat(AudioFormat.Encoding.PCM_FLOAT, f.getSampleRate,
        bits, f.getChannels, bits / 8 * f.getChannels, f.getSampleRate, false)
      val conv = AudioSystem.getAudioInputStream(tgt, stream())
      val raw = conv.readAllBytes(); conv.close()
      val bb = java.nio.ByteBuffer.wrap(raw).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var sum = 0.0
      val n = raw.length / (bits / 8)
      var i = 0
      while (i < n) {
        sum += ((if (bits == 32) bb.getFloat(i * 4).toDouble
                 else bb.getDouble(i * 8)) + 1.0) / 2.0
        i += 1
      }
      val bo = new java.io.ByteArrayOutputStream()
      AudioSystem.write(AudioSystem.getAudioInputStream(tgt, stream()),
        AudioFileFormat.Type.WAVE, bo)
      val ours = Multimodal.decodeWav(bo.toByteArray).getOrElse(
        fail(s"float$bits WAV: decoder declined a JDK-encoded file"))
      assert(ours.channels == f.getChannels && ours.rate == f.getSampleRate.toInt &&
        ours.nSamples == n && ours.bits == bits, s"float$bits layout: $ours vs n=$n")
      assert(math.abs(ours.meanLevel - sum / n) < 1e-9,
        s"float$bits mean ${ours.meanLevel} vs JDK ${sum / n}")
    }
  }

  test("AU conformance: PCM widths + G.711 u-law match javax.sound") {
    auAiffConformance("pluck-pcm8.au")
    auAiffConformance("pluck-pcm16.au")
    auAiffConformance("pluck-pcm32.au")
    auAiffConformance("pluck-ulaw.au")
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
    // WAVE_FORMAT_EXTENSIBLE with a PCM SubFormat GUID — same LPCM
    // payload behind the 0xFFFE fmt header
    wavConformance("pluck-pcm24-ext.wav")
  }

  // ---- TIFF: our closed-form writer vs the JDK ImageIO TIFF reader
  // (shipped since Java 9; shares no code with the writer). The
  // conformance direction is writer→independent reader: a wrong IFD
  // layout, strip offset, or sample order in tiffRgb cannot survive
  // the JDK parsing it back pixel-exact.

  test("TIFF conformance: closed-form tiffRgb decodes pixel-exact under ImageIO") {
    for ((w, h) <- Seq((1, 1), (3, 2), (16, 9), (33, 7))) {
      def pixel(x: Int, y: Int): Int =
        (((x * 37 + y * 11) % 256) << 16) | (((x * 5 + y * 71) % 256) << 8) |
          ((x * 13 + y * 29) % 256)
      val bytes = graft.tools.MediaFixtures.tiffRgb(w, h, pixel)
      val (px, dw, dh) = imageIoPixels(bytes)
      assert((dw, dh) == (w, h), s"${w}x$h: ImageIO decoded ${dw}x$dh")
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val got = px(y * w + x) & 0xFFFFFF
          assert(got == pixel(x, y),
            f"${w}x$h ($x,$y): 0x$got%06x vs 0x${pixel(x, y)}%06x")
          x += 1
        }
        y += 1
      }
      // the media pipeline dispatch REAL-decodes TIFF (falls through
      // to decodeImageIO, never the stub): meta must be exact
      val d = Multimodal.decodeImageIO(bytes)
      assert(d.isDefined, s"${w}x$h: pipeline declined a valid TIFF")
      val (mw, mh, mc, _) = d.get
      assert((mw, mh, mc) == (w, h, 3), s"${w}x$h meta: ($mw,$mh,$mc)")
    }
  }
}
