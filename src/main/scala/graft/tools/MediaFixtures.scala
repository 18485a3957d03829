package graft.tools

/** Shared media fixture builders used by BOTH the oracle planting in
  * `SparkEntry` and the specs — one byte layout, never two copies
  * that can silently diverge (an emulation-prevention edge fixed in
  * one writer must reach the other by construction).
  *
  * These are ENCODERS for spec-valid test payloads, not part of the
  * decode surface; they live in main so executor-side oracle planting
  * closures can reach them. */
object MediaFixtures {

  // ---------------------------------------------- H.264 Annex-B writer

  /** MSB-first bit buffer with Exp-Golomb encoders (ITU-T H.264
    * §9.1) and byte alignment for I_PCM payloads. */
  final class H264Bits {
    val bits = scala.collection.mutable.ArrayBuffer.empty[Int]
    def u(v: Int, n: Int): Unit = {
      var r = n - 1
      while (r >= 0) { bits += ((v >> r) & 1); r -= 1 }
    }
    def ue(v: Int): Unit = {
      val z = 31 - Integer.numberOfLeadingZeros(v + 1)
      u(0, z); u(v + 1, z + 1) // z leading zeros then (v+1) in z+1 bits
    }
    def se(v: Int): Unit = ue(if (v > 0) 2 * v - 1 else -2 * v)
    def align(): Unit = while (bits.length % 8 != 0) bits += 0
  }

  /** One NAL: 4-byte start code, header byte, rbsp from `body` with
    * the stop bit, byte alignment and emulation-prevention insertion
    * (0x0000 followed by a byte <= 3 gets the 0x03 escape). */
  def h264Nal(out: java.io.ByteArrayOutputStream, refIdc: Int, typ: Int)(
      body: H264Bits => Unit): Unit = {
    out.write(0); out.write(0); out.write(0); out.write(1)
    out.write((refIdc << 5) | typ)
    val w = new H264Bits
    body(w)
    w.u(1, 1) // rbsp_stop_one_bit
    w.align()
    var zeros = 0
    var i = 0
    while (i < w.bits.length) {
      var b = 0; var k = 0
      while (k < 8) { b = (b << 1) | w.bits(i + k); k += 1 }
      if (zeros >= 2 && b <= 3) { out.write(3); zeros = 0 } // emu prevention
      out.write(b); zeros = if (b == 0) zeros + 1 else 0
      i += 8
    }
  }

  /** Baseline-66 SPS: poc_type 2, frame_mbs_only, no crop/VUI. */
  def h264Sps(w: H264Bits, wMbs: Int, hMbs: Int): Unit = {
    w.u(66, 8); w.u(0, 8); w.u(30, 8); w.ue(0)
    w.ue(0) // log2_max_frame_num_minus4 -> 4 bits
    w.ue(2) // pic_order_cnt_type
    w.ue(0); w.u(0, 1) // max_num_ref_frames, gaps
    w.ue(wMbs - 1); w.ue(hMbs - 1)
    w.u(1, 1); w.u(0, 1); w.u(0, 1); w.u(0, 1) // frame_mbs_only, direct8x8, crop, vui
  }

  /** CAVLC PPS, one slice group, no deblock-control/redundant-count. */
  def h264Pps(w: H264Bits, cabac: Boolean = false): Unit = {
    w.ue(0); w.ue(0); w.u(if (cabac) 1 else 0, 1); w.u(0, 1); w.ue(0)
    w.ue(0); w.ue(0); w.u(0, 1); w.u(0, 2); w.se(0); w.se(0); w.se(0)
    w.u(0, 1); w.u(0, 1); w.u(0, 1)
  }

  /** IDR slice header (I slice, frame_num 0, poc_type-2 layout). */
  def h264IdrSliceHeader(w: H264Bits, firstMb: Int, idrPicId: Int = 0): Unit = {
    w.ue(firstMb); w.ue(7); w.ue(0); w.u(0, 4); w.ue(idrPicId)
    w.u(0, 1); w.u(0, 1) // dec_ref_pic_marking
    w.se(0) // slice_qp_delta
  }

  /** One I_PCM macroblock: mb_type 25, alignment, 256 luma samples
    * from `luma(k)`, constant-128 chroma planes. */
  def h264IpcmMb(w: H264Bits, luma: Int => Int): Unit = {
    w.ue(25); w.align()
    var k = 0
    while (k < 256) { w.u(luma(k), 8); k += 1 }
    k = 0
    while (k < 128) { w.u(128, 8); k += 1 } // Cb + Cr planes
  }

  // ------------------------------------------------- MJPEG-in-AVI shell

  /** Minimal RIFF/AVI container around independent JPEG frames: one
    * `movi` LIST of `00dc` chunks (word-aligned), which is all the
    * frame walk consumes. */
  def mjpegAvi(frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = {
      out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
      out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
    }
    val moviSz = 4 + frames.map(f => 8 + f.length + (f.length & 1)).sum
    out.write("RIFF".getBytes("ISO-8859-1")); le32(4 + 8 + moviSz)
    out.write("AVI ".getBytes("ISO-8859-1"))
    out.write("LIST".getBytes("ISO-8859-1")); le32(moviSz)
    out.write("movi".getBytes("ISO-8859-1"))
    frames.foreach { f =>
      out.write("00dc".getBytes("ISO-8859-1")); le32(f.length); out.write(f)
      if ((f.length & 1) == 1) out.write(0)
    }
    out.toByteArray
  }

  /** Solid-color JPEG via ImageIO (the MJPEG frame payload). */
  def solidJpeg(w: Int, h: Int, rgb: Int): Array[Byte] = {
    javax.imageio.ImageIO.setUseCache(false)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", bos)
    bos.toByteArray
  }

  // ------------------------------------------- animated GIF via ImageIO

  /** Multi-frame GIF through the JDK sequence writer: frame f is a
    * `w` x `h` indexed image whose pixel (x, y) takes `color(f, x, y)`
    * (packed 0xRRGGBB; each frame's DISTINCT color set must fit one
    * 256-entry palette). */
  def animatedGif(w: Int, h: Int, nFrames: Int)(
      color: (Int, Int, Int) => Int): Array[Byte] = {
    javax.imageio.ImageIO.setUseCache(false)
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for (f <- 0 until nFrames) {
      val palette = (for (y <- 0 until h; x <- 0 until w)
        yield color(f, x, y)).distinct.toArray
      val icm = new java.awt.image.IndexColorModel(8, palette.length, palette, 0,
        false, -1, java.awt.image.DataBuffer.TYPE_BYTE)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, color(f, x, y)); x += 1 }
        y += 1
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence(); writer.dispose(); ios.close()
    bos.toByteArray
  }

  /** Minimal ISO-BMFF (MP4) wrapper around raw AVC NALs: `mdat` first
    * (so stco carries real absolute offsets), then
    * moov/trak/mdia/minf/stbl with stsd(avc1(avcC carrying SPS+PPS)),
    * stsz (per-sample sizes), a TWO-RUN stsc (chunk 1 holds two
    * samples, later chunks one each — exercising the run walk), and
    * stco. Each element of `samples` is one raw slice NAL;
    * length-prefixing uses `lengthSize` bytes. */
  private def mp4be32(v: Int) = Array[Byte](
    ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
    ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def mp4be16(v: Int) = Array[Byte](((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def mp4box(name: String, payload: Array[Byte]): Array[Byte] =
    mp4be32(8 + payload.length) ++ name.getBytes("ISO-8859-1") ++ payload

  /** Shared container shell: ftyp + mdat(framed samples) + moov with
    * the given stsd sample entry, per-sample stsz, a TWO-RUN stsc
    * (chunk 1 holds two samples, later chunks one each) and absolute
    * stco offsets. */
  private def mp4Container(sampleEntry: Array[Byte],
      framed: Seq[Array[Byte]]): Array[Byte] = {
    val ftyp = mp4box("ftyp", "isom".getBytes("ISO-8859-1") ++ mp4be32(0))
    val mdat = mp4box("mdat", framed.flatten.toArray)
    val firstChunkN = math.min(2, framed.length)
    val chunkSizes: Seq[Int] =
      (if (firstChunkN > 0) Seq(framed.take(firstChunkN).map(_.length).sum) else Nil) ++
        framed.drop(firstChunkN).map(_.length)
    val dataStart = ftyp.length + 8
    val chunkOffsets = chunkSizes.scanLeft(dataStart)(_ + _).dropRight(1)
    val stsd = mp4box("stsd", mp4be32(0) ++ mp4be32(1) ++ sampleEntry)
    val stsz = mp4box("stsz", mp4be32(0) ++ mp4be32(0) ++ mp4be32(framed.length) ++
      framed.flatMap(f => mp4be32(f.length)).toArray)
    val stscRuns =
      if (framed.length > firstChunkN) Seq((1, firstChunkN), (2, 1))
      else Seq((1, math.max(firstChunkN, 1)))
    val stsc = mp4box("stsc", mp4be32(0) ++ mp4be32(stscRuns.length) ++
      stscRuns.flatMap { case (fc, n) => mp4be32(fc) ++ mp4be32(n) ++ mp4be32(1) }.toArray)
    val stco = mp4box("stco", mp4be32(0) ++ mp4be32(chunkOffsets.length) ++
      chunkOffsets.flatMap(mp4be32).toArray)
    val stbl = mp4box("stbl", stsd ++ stsz ++ stsc ++ stco)
    ftyp ++ mdat ++ mp4box("moov",
      mp4box("trak", mp4box("mdia", mp4box("minf", stbl))))
  }

  def mp4Avc(sps: Array[Byte], pps: Array[Byte],
      samples: Seq[Array[Byte]], lengthSize: Int = 4): Array[Byte] = {
    def beN(n: Int, v: Int): Array[Byte] =
      Array.tabulate(n)(i => ((v >> (8 * (n - 1 - i))) & 0xFF).toByte)
    val framed = samples.map(n => beN(lengthSize, n.length) ++ n)
    val avcC = mp4box("avcC", Array[Byte](1, 66, 0, 30,
        (0xFC | (lengthSize - 1)).toByte, 0xE1.toByte) ++
      mp4be16(sps.length) ++ sps ++ Array[Byte](1) ++ mp4be16(pps.length) ++ pps)
    mp4Container(mp4box("avc1", new Array[Byte](78) ++ avcC), framed)
  }

  // ------------------------------------------------ AAC-LC silence frames

  /** One zero-codebook AAC-LC raw_data_block (the decoder's documented
    * subset): mono = SCE with a long window and a single ZERO_HCB
    * section of `maxSfb` bands (maxSfb <= 30 so the 5-bit sect_len
    * never needs the escape); stereo = common-window CPE in
    * EIGHT_SHORT with grouping 0110011 (4 window groups), an all-ones
    * MS mask and per-group ZERO sections (maxSfb <= 6 for the 3-bit
    * sect_len). ONE writer for the ADTS and MP4 oracles AND the specs
    * — a syntax fix here reaches every consumer by construction. */
  def aacSilenceRawFrame(mono: Boolean, maxSfb: Int): Array[Byte] = {
    require(if (mono) maxSfb <= 30 else maxSfb <= 6, s"maxSfb $maxSfb")
    val bits = new scala.collection.mutable.ArrayBuffer[Byte]()
    var cur = 0; var nb = 0
    def w(v: Int, n: Int): Unit = { var r = n - 1; while (r >= 0) {
      cur = (cur << 1) | ((v >> r) & 1); nb += 1
      if (nb == 8) { bits += cur.toByte; cur = 0; nb = 0 }; r -= 1 } }
    if (mono) {
      w(0, 3); w(0, 4); w(100, 8)          // SCE, tag, global_gain
      w(0, 1); w(0, 2); w(1, 1)            // ics: reserved, ONLY_LONG, shape
      w(maxSfb, 6); w(0, 1)                // max_sfb, no predictor
      if (maxSfb > 0) { w(0, 4); w(maxSfb, 5) } // one ZERO_HCB section
      w(0, 1); w(0, 1); w(0, 1)            // pulse, tns, gain
    } else {
      w(1, 3); w(0, 4); w(1, 1)            // CPE, tag, common_window
      w(0, 1); w(2, 2); w(0, 1)            // ics: reserved, EIGHT_SHORT, shape
      w(maxSfb, 4); w(0x33, 7)             // grouping -> 4 groups
      w(1, 2)                              // ms_mask_present = 1
      var n = 4 * maxSfb; while (n > 0) { w(1, 1); n -= 1 }
      var c = 0
      while (c < 2) {
        w(90, 8)
        var g = 0
        while (g < 4) { if (maxSfb > 0) { w(0, 4); w(maxSfb, 3) }; g += 1 }
        w(0, 1); w(0, 1); w(0, 1)
        c += 1
      }
    }
    w(7, 3)                                // TERM
    while (nb != 0) w(0, 1)                // byte align
    bits.toArray
  }

  /** `payload` framed behind a 7-byte ADTS header (MPEG-4, AAC-LC,
    * protection absent, one raw data block). */
  def adtsFrame(sfi: Int, chanCfg: Int, payload: Array[Byte]): Array[Byte] = {
    val frameLen = 7 + payload.length
    val h = new Array[Byte](7)
    h(0) = 0xFF.toByte
    h(1) = 0xF1.toByte
    h(2) = ((1 << 6) | (sfi << 2) | ((chanCfg >> 2) & 1)).toByte
    h(3) = (((chanCfg & 3) << 6) | ((frameLen >> 11) & 3)).toByte
    h(4) = ((frameLen >> 3) & 0xFF).toByte
    h(5) = (((frameLen & 7) << 5) | 0x1F).toByte
    h(6) = 0xFC.toByte
    h ++ payload
  }

  /** AAC-in-MP4: mp4a sample entry with an esds descriptor chain
    * (ES→DecoderConfig(0x40)→DecSpecificInfo carrying the
    * AudioSpecificConfig) around raw AAC access units — NO ADTS
    * framing in the file; the decoder synthesizes it. */
  def mp4Aac(sfi: Int, chanCfg: Int, samples: Seq[Array[Byte]]): Array[Byte] = {
    val asc = Array[Byte](
      (((2 << 3) | (sfi >> 1)) & 0xFF).toByte,
      ((((sfi & 1) << 7) | (chanCfg << 3)) & 0xFF).toByte)
    val dsi = Array[Byte](0x05, asc.length.toByte) ++ asc
    // DecoderConfig payload = objTypeIndication(1) + streamType(1) +
    // bufferSizeDB(3) + maxBitrate(4) + avgBitrate(4) = 13 bytes
    val dcd = Array[Byte](0x04, (13 + dsi.length).toByte,
      0x40.toByte, 0x15) ++ new Array[Byte](11) ++ dsi
    val esd = Array[Byte](0x03, (3 + dcd.length).toByte, 0, 0, 0) ++ dcd
    val esds = mp4box("esds", mp4be32(0) ++ esd)
    mp4Container(mp4box("mp4a", new Array[Byte](28) ++ esds), samples)
  }

  /** One Annex-B NAL built by [[h264Nal]], returned WITHOUT its start
    * code — the raw NAL an MP4 sample carries. */
  def h264RawNal(refIdc: Int, typ: Int)(body: H264Bits => Unit): Array[Byte] = {
    val tmp = new java.io.ByteArrayOutputStream()
    h264Nal(tmp, refIdc, typ)(body)
    tmp.toByteArray.drop(4)
  }

  /** Inter-frame-OPTIMIZED animated GIF via the JDK writer (an
    * independent encoder): frame 0 is a full-screen solid `base`;
    * each later frame f is a 2x2 sub-rect at (2*(f-1), 0) drawing the
    * two diagonal pixels in `patch(f)` and leaving the anti-diagonal
    * TRANSPARENT — so rendering is only correct under real canvas
    * compositing (offsets + transparency), which is what
    * `gifFramesComposited` exists for. Deterministic composite:
    * frame f's canvas = base everywhere except the 2 diagonal pixels
    * of each rect 1..f. */
  def compositedGif(w: Int, h: Int, nFrames: Int, base: Int)(
      patch: Int => Int): Array[Byte] = {
    require(2 * (nFrames - 1) <= w && h >= 2 && nFrames >= 1)
    javax.imageio.ImageIO.setUseCache(false)
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for (f <- 0 until nFrames) {
      val (fw, fh, left) = if (f == 0) (w, h, 0) else (2, 2, 2 * (f - 1))
      val color = if (f == 0) base else patch(f)
      val transIdx = if (f == 0) -1 else 1
      val cmap = Array(0xFF000000 | color, 0xFF000000 | base)
      val icm = new java.awt.image.IndexColorModel(1, 2,
        cmap.map(c => ((c >> 16) & 0xFF).toByte),
        cmap.map(c => ((c >> 8) & 0xFF).toByte),
        cmap.map(c => (c & 0xFF).toByte), transIdx)
      val img = new java.awt.image.BufferedImage(fw, fh,
        java.awt.image.BufferedImage.TYPE_BYTE_BINARY, icm)
      for (y <- 0 until fh; x <- 0 until fw)
        img.getRaster.setSample(x, y, 0,
          if (f == 0) 0 else if (x == y) 0 else 1) // diagonal opaque
      val meta = writer.getDefaultImageMetadata(
        new javax.imageio.ImageTypeSpecifier(img), writer.getDefaultWriteParam)
      val fmt = meta.getNativeMetadataFormatName
      val root = meta.getAsTree(fmt)
        .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      def child(name: String) = {
        val kids = root.getElementsByTagName(name)
        if (kids.getLength > 0)
          kids.item(0).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        else {
          val n = new javax.imageio.metadata.IIOMetadataNode(name)
          root.appendChild(n); n
        }
      }
      val gce = child("GraphicControlExtension")
      gce.setAttribute("disposalMethod", "doNotDispose")
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", if (f == 0) "FALSE" else "TRUE")
      gce.setAttribute("delayTime", "10")
      gce.setAttribute("transparentColorIndex", if (f == 0) "0" else "1")
      val desc = child("ImageDescriptor")
      desc.setAttribute("imageLeftPosition", left.toString)
      desc.setAttribute("imageTopPosition", "0")
      desc.setAttribute("imageWidth", fw.toString)
      desc.setAttribute("imageHeight", fh.toString)
      desc.setAttribute("interlaceFlag", "FALSE")
      meta.setFromTree(fmt, root)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, meta),
        writer.getDefaultWriteParam)
    }
    writer.endWriteSequence(); writer.dispose(); ios.close()
    bos.toByteArray
  }

  // ---------------------------------------------- TIFF 6.0 writer

  /** Minimal baseline-TIFF 6.0 encoder: little-endian, uncompressed
    * chunky RGB, one strip, IFD after the pixel data (structural
    * container format — TIFF 6.0 spec §2, no entropy coding, so the
    * whole file is closed-form). `pix(x, y)` returns 0xRRGGBB. The
    * INDEPENDENT decoder for conformance is the JDK's ImageIO TIFF
    * reader (shipped since Java 9), which shares no code with this
    * writer — the same planter/decoder separation the GIF and WAV
    * fixtures get from third-party files. */
  def tiffRgb(w: Int, h: Int, pix: (Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0, s"tiffRgb ${w}x$h")
    val o = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { o.write(v & 0xFF); o.write((v >> 8) & 0xFF) }
    def le32(v: Int): Unit = { le16(v & 0xFFFF); le16((v >>> 16) & 0xFFFF) }
    val stripBytes = w * h * 3
    val stripOff = 8
    // pad the strip to even so the IFD starts word-aligned (spec: IFD
    // must begin on a word boundary)
    val pad = stripBytes % 2
    val ifdOff = stripOff + stripBytes + pad
    val nEntries = 10
    // BitsPerSample needs 3 SHORTs (6 bytes) — stored right after the
    // IFD's next-offset field
    val bpsOff = ifdOff + 2 + nEntries * 12 + 4
    // header
    o.write('I'); o.write('I'); le16(42); le32(ifdOff)
    // strip (chunky RGBRGB..., row-major)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = pix(x, y)
        o.write((p >> 16) & 0xFF); o.write((p >> 8) & 0xFF); o.write(p & 0xFF)
        x += 1
      }
      y += 1
    }
    if (pad == 1) o.write(0)
    // IFD — entries MUST be ascending by tag (spec §2). In a
    // little-endian file an inline SHORT value occupies the LOW bytes
    // of the 4-byte value field, which le32(v) already produces.
    def entry(tag: Int, typ: Int, count: Int, value: Int): Unit = {
      le16(tag); le16(typ); le32(count); le32(value)
    }
    val SHORT = 3; val LONG = 4
    le16(nEntries)
    entry(256, LONG, 1, w)            // ImageWidth
    entry(257, LONG, 1, h)            // ImageLength
    entry(258, SHORT, 3, bpsOff)      // BitsPerSample -> [8,8,8]
    entry(259, SHORT, 1, 1)           // Compression = none
    entry(262, SHORT, 1, 2)           // Photometric = RGB
    entry(273, LONG, 1, stripOff)     // StripOffsets
    entry(277, SHORT, 1, 3)           // SamplesPerPixel
    entry(278, LONG, 1, h)            // RowsPerStrip (single strip)
    entry(279, LONG, 1, stripBytes)   // StripByteCounts
    entry(284, SHORT, 1, 1)           // PlanarConfiguration = chunky
    le32(0)                           // no next IFD
    le16(8); le16(8); le16(8)         // BitsPerSample payload
    o.toByteArray
  }
}
