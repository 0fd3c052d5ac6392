package graft.multimodal

import graft.SparkTestBase
import graft.multimodal.MediaPipeline._

/** The REAL byte-level image decoder behind the MediaDecoder seam:
  * PPM P6 and uncompressed 24bpp BMP, plus nearest-neighbor resize.
  */
class ImageDecoderSpec extends SparkTestBase {
  private val dec = new ImageDecoder

  private def row(bytes: Array[Byte]) =
    MediaRow(7L, "image", bytes, "img", 0, 0, 0L)

  test("PPM encode/decode roundtrip preserves dimensions and pixels") {
    val px = Array.tabulate(8 * 8 * 3)(i => (i % 251).toByte)
    val frames = dec.decode(row(encodePpm(8, 8, px)))
    assert(frames.size === 1)
    val f = frames.head
    assert(f.width === 8 && f.height === 8)
    assert(f.pixels.toSeq === px.toSeq)
  }

  test("PPM header comments and flexible whitespace parse correctly") {
    val px = Array.tabulate(2 * 2 * 3)(_.toByte)
    val bytes = "P6\n# a comment\n2 # trailing\n2\n255\n".getBytes("US-ASCII") ++ px
    val f = dec.decode(row(bytes))
    assert(f.size === 1 && f.head.width === 2 && f.head.height === 2)
    assert(f.head.pixels.toSeq === px.toSeq)
  }

  test("truncated or non-image bytes decode to zero frames, never throw") {
    assert(dec.decode(row("P6\n8 8\n255\n".getBytes ++ Array[Byte](1, 2, 3))).isEmpty)
    assert(dec.decode(row("not an image at all".getBytes)).isEmpty)
    assert(dec.decode(row(Array[Byte]())).isEmpty)
  }

  test("PPM maxval not followed by whitespace is a miss, not shifted pixels") {
    // header runs straight into the raster (first raster byte is not
    // whitespace): decoding must refuse rather than shift every pixel
    val bytes = "P6 2 2 255".getBytes("US-ASCII") ++
      Array.tabulate(13)(i => (i + 1).toByte)
    assert(dec.decode(row(bytes)).isEmpty)
  }

  /** Minimal hand-built 2x2 24bpp bottom-up BMP. Rows pad to 4 bytes
    * (2*3=6 → 8); pixel storage is BGR. */
  private def bmp2x2: Array[Byte] = {
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    val rowBottom = Array[Byte](/*B,G,R*/ 3, 2, 1, 6, 5, 4, /*pad*/ 0, 0)
    val rowTop = Array[Byte](9, 8, 7, 12, 11, 10, 0, 0)
    val data = rowBottom ++ rowTop // bottom-up: file starts with the LAST row
    "BM".getBytes ++ le32(54 + data.length) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(2) ++ le32(2) ++ le16(1) ++ le16(24) ++ le32(0) ++
      le32(data.length) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0) ++ data
  }

  test("BMP 24bpp decodes bottom-up BGR into top-down RGB") {
    val f = dec.decode(row(bmp2x2))
    assert(f.size === 1)
    assert(f.head.width === 2 && f.head.height === 2)
    // top row first, each pixel as R,G,B
    assert(f.head.pixels.toSeq === Seq[Byte](7, 8, 9, 10, 11, 12, 1, 2, 3, 4, 5, 6))
  }

  test("nearest-neighbor resize picks the geometrically nearest source pixel") {
    val px = Array.tabulate(4 * 4 * 3)(i => (i / 3).toByte) // pixel p has value p
    val f = DecodedFrame(1L, 0, 4, 4, px)
    val half = dec.resize(f, 2, 2)
    // target (x,y) maps to source (2x, 2y): pixels 0, 2, 8, 10
    assert(half.pixels.grouped(3).map(_.head.toInt).toSeq === Seq(0, 2, 8, 10))
    val up = dec.resize(half, 4, 4)
    assert(up.width === 4 && up.pixels.length === 4 * 4 * 3)
  }

  // ---- baseline PNG (real zlib deflate/inflate + all 5 row filters) ----

  test("PNG roundtrips every spec row filter type bit-for-bit") {
    // gradient + noise-ish raster so Sub/Up/Average/Paeth all see
    // non-trivial predictions (a constant raster would pass trivially)
    val px = Array.tabulate(6 * 5 * 3)(i => ((i * 37 + i * i) % 256).toByte)
    (0 to 4).foreach { ft =>
      val frames = dec.decode(row(encodePng(6, 5, px, rowFilter = ft)))
      assert(frames.size === 1, s"filter $ft did not decode")
      assert(frames.head.width === 6 && frames.head.height === 5)
      assert(frames.head.pixels.toSeq === px.toSeq, s"filter $ft mismatch")
    }
  }

  test("PNG grayscale and RGBA color types normalize to packed RGB24") {
    // hand-build: reuse encodePng's chunk framing by post-editing is
    // fragile — build the variants directly with the JDK deflater
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val t = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32(); crc.update(t); crc.update(data)
      java.nio.ByteBuffer.allocate(12 + data.length)
        .putInt(data.length).put(t).put(data).putInt(crc.getValue.toInt).array()
    }
    def deflate(b: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      try {
        d.setInput(b); d.finish()
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        while (!d.finished()) out.write(buf, 0, d.deflate(buf))
        out.toByteArray
      } finally d.end()
    }
    def png(w: Int, h: Int, colorType: Int, scanlines: Array[Byte]) = {
      val ihdr = java.nio.ByteBuffer.allocate(13).putInt(w).putInt(h)
        .put(8.toByte).put(colorType.toByte)
        .put(0.toByte).put(0.toByte).put(0.toByte).array()
      Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte) ++
        chunk("IHDR", ihdr) ++ chunk("IDAT", deflate(scanlines)) ++
        chunk("IEND", Array.emptyByteArray)
    }
    // 2x2 gray, filter 0 rows: values 10,20 / 30,40 → replicated RGB
    val gray = png(2, 2, 0, Array[Byte](0, 10, 20, 0, 30, 40))
    val g = dec.decode(row(gray))
    assert(g.head.pixels.toSeq ===
      Seq[Byte](10, 10, 10, 20, 20, 20, 30, 30, 30, 40, 40, 40))
    // 1x2 RGBA, filter 0: alpha dropped
    val rgba = png(1, 2, 6,
      Array[Byte](0, 1, 2, 3, 99, 0, 4, 5, 6, 77))
    val a = dec.decode(row(rgba))
    assert(a.head.pixels.toSeq === Seq[Byte](1, 2, 3, 4, 5, 6))
  }

  test("PNG malformed inputs are decode misses, never exceptions") {
    val px = Array.tabulate(4 * 4 * 3)(_.toByte)
    val good = encodePng(4, 4, px)
    // truncated deflate stream
    assert(dec.decode(row(good.dropRight(20))).isEmpty)
    // corrupted IDAT byte (invalid deflate data mid-stream)
    val corrupt = good.clone()
    corrupt(good.length - 20) = (corrupt(good.length - 20) ^ 0x5a).toByte
    assert(dec.decode(row(corrupt)).isEmpty)
    // interlaced flag set: baseline decoder must refuse, not garble
    val interlaced = good.clone()
    interlaced(8 + 8 + 12) = 1 // IHDR interlace byte
    assert(dec.decode(row(interlaced)).isEmpty)
    // 16-bit depth flag
    val deep = good.clone()
    deep(8 + 8 + 8) = 16
    assert(dec.decode(row(deep)).isEmpty)
  }

  // ---- baseline JPEG (T.81 sequential DCT + Huffman, real bitstream) ----

  private def grayOf(f: DecodedFrame): Array[Int] =
    Array.tabulate(f.width * f.height)(i => f.pixels(3 * i) & 0xff)

  test("JPEG constant-block grayscale roundtrips exactly, with and without restarts") {
    // 16 constant 8x8 blocks covering the full signed-byte range: the
    // DC-only DCT path is integer-exact, so decode == source, bit-for-bit
    val blockVals = Array(0, 255, 128, 1, 254, 17, 200, 90, 33, 66, 99,
      240, 13, 180, 127, 129)
    val gray = new Array[Byte](32 * 32)
    for (y <- 0 until 32; x <- 0 until 32)
      gray(y * 32 + x) = blockVals((y / 8) * 4 + (x / 8)).toByte
    for (rst <- Seq(0, 3)) {
      val frames = dec.decode(row(Jpeg.encodeGray(32, 32, gray,
        restartInterval = rst)))
      assert(frames.size === 1, s"restartInterval=$rst did not decode")
      val f = frames.head
      assert(f.width === 32 && f.height === 32)
      assert(grayOf(f).toSeq === gray.map(_ & 0xff).toSeq,
        s"restartInterval=$rst mismatch")
    }
  }

  test("JPEG AC path matches the JDK's independent libjpeg decoder on our bytes") {
    // a busy gradient raster (every block has live AC coefficients),
    // dims not multiples of 8 so the MCU-crop path is exercised too;
    // both decoders read the SAME compressed bytes, so any disagreement
    // is in dequant/IDCT/crop — allow |diff| <= 1 for the spec's
    // permitted IDCT rounding latitude between implementations
    val w = 21; val h = 14
    val gray = Array.tabulate(w * h)(i =>
      ((i % w) * 11 + (i / w) * 29 + (i * i) % 31).toByte)
    val bytes = Jpeg.encodeGray(w, h, gray)
    val mine = dec.decode(row(bytes))
    assert(mine.size === 1)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null && img.getWidth === w && img.getHeight === h,
      "ImageIO could not decode our encoder's stream")
    val g = grayOf(mine.head)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      // raw raster sample: getRGB on a TYPE_BYTE_GRAY image would run
      // a gray→sRGB colorspace conversion and corrupt the comparison
      val ref = img.getRaster.getSample(x, y, 0)
      maxDiff = math.max(maxDiff, math.abs(g(y * w + x) - ref))
    }
    assert(maxDiff <= 1, s"max per-pixel diff vs ImageIO: $maxDiff")
  }

  test("JPEG decodes the JDK encoder's output (foreign tables, real-world stream)") {
    // ImageIO writes its own DQT/DHT (not our Annex-K constants) — this
    // proves the decoder consumes tables from the stream, not baked-in
    // ones. Constant-chroma input keeps the result invariant to the
    // chroma upsampling variant (box vs fancy), isolating IDCT + color
    // convert, where implementations may differ by a rounding step.
    val w = 24; val h = 16
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 9 + y * 13) % 256
      img.setRGB(x, y, (v << 16) | (v << 8) | v) // R=G=B: Cb=Cr constant
    }
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", baos))
    val bytes = baos.toByteArray
    val mine = dec.decode(row(bytes))
    assert(mine.size === 1, "decoder missed a JDK-encoded baseline JPEG")
    val f = mine.head
    assert(f.width === w && f.height === h)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val rgb = ref.getRGB(x, y)
      val rc = (rgb >> (16 - 8 * c)) & 0xff
      val mc = f.pixels((y * w + x) * 3 + c) & 0xff
      maxDiff = math.max(maxDiff, math.abs(mc - rc))
    }
    assert(maxDiff <= 2, s"max per-pixel diff vs ImageIO: $maxDiff")
  }

  test("JPEG 4:4:4 and 4:2:0 color roundtrip constant-chroma rasters exactly") {
    // per-8x8-block constant colors with ONE shared chroma: colors
    // differ by v·(1,1,1), which cancels EXACTLY in the fixed-point
    // chroma rows (−11059−21709+32768 = 0 and 32768−27439−5329 = 0),
    // so Cb/Cr are bit-identical across blocks while Y varies — the
    // 4:2:0 downsample+replicate leg becomes lossless and the expected
    // pixels are computable inline with the same fixed-point forms
    val colors = Array(0, 60, 120, 175).map(v => (80 + v, 40 + v, 10 + v))
    val w = 16; val h = 16
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = colors((y / 8) * 2 + (x / 8))
      val o = (y * w + x) * 3
      rgb(o) = r.toByte; rgb(o + 1) = g.toByte; rgb(o + 2) = b.toByte
    }
    def clamp(v: Long) = math.max(0, math.min(255, v)).toInt
    val expected = colors.map { case (r, g, b) =>
      val yy = (19595 * r + 38470 * g + 7471 * b + 32768) >> 16
      val cb = ((-11059 * r - 21709 * g + 32768 * b + 8421375) >> 16) - 128
      val cr = ((32768 * r - 27439 * g - 5329 * b + 8421375) >> 16) - 128
      (clamp(yy + ((91881L * cr + 32768) >> 16)),
        clamp(yy + ((-22554L * cb - 46802L * cr + 32768) >> 16)),
        clamp(yy + ((116130L * cb + 32768) >> 16)))
    }
    // constant chroma requirement of the 4:2:0 leg: all four colors
    // must map to the same (cb, cr) — verify the fixture upholds it
    val ccs = colors.map { case (r, g, b) =>
      (((-11059 * r - 21709 * g + 32768 * b + 8421375) >> 16),
        ((32768 * r - 27439 * g - 5329 * b + 8421375) >> 16))
    }
    assert(ccs.distinct.size === 1, s"fixture chroma not constant: ${ccs.toSeq}")
    for (subsample <- Seq(false, true)) {
      val frames = dec.decode(row(Jpeg.encodeColor(w, h, rgb, subsample)))
      assert(frames.size === 1, s"subsample=$subsample did not decode")
      val f = frames.head
      for (y <- 0 until h; x <- 0 until w) {
        val (er, eg, eb) = expected((y / 8) * 2 + (x / 8))
        val o = (y * w + x) * 3
        assert((f.pixels(o) & 0xff) === er, s"R at ($x,$y) subsample=$subsample")
        assert((f.pixels(o + 1) & 0xff) === eg, s"G at ($x,$y) subsample=$subsample")
        assert((f.pixels(o + 2) & 0xff) === eb, s"B at ($x,$y) subsample=$subsample")
      }
    }
  }

  test("JPEG SOF1 (extended sequential, 8-bit Huffman) decodes like baseline") {
    val gray = Array.tabulate(16 * 16)(i => (i * 11 + (i * i) % 17).toByte)
    val base = Jpeg.encodeGray(16, 16, gray)
    var i = 2; var sofAt = -1
    while (sofAt < 0) {
      if ((base(i) & 0xff) == 0xff && (base(i + 1) & 0xff) == 0xc0) sofAt = i
      else i += 1
    }
    val sof1 = base.clone(); sof1(sofAt + 1) = 0xc1.toByte
    val a = dec.decode(row(base)); val b = dec.decode(row(sof1))
    assert(a.size === 1 && b.size === 1, "SOF1 stream did not decode")
    assert(a.head.pixels.toSeq === b.head.pixels.toSeq)
  }

  test("JPEG malformed inputs are decode misses, never exceptions") {
    val gray = Array.tabulate(16 * 16)(i => (i * 7).toByte)
    val good = Jpeg.encodeGray(16, 16, gray)
    assert(dec.decode(row(good)).nonEmpty)
    // truncated entropy-coded segment
    assert(dec.decode(row(good.dropRight(12))).isEmpty)
    // missing EOI, stream otherwise complete (the PNG IEND rule)
    assert(dec.decode(row(good.dropRight(2))).isEmpty)
    // lossless SOF3 (patch the SOF0 marker): unsupported subset
    val sofAt = {
      var i = 2; var at = -1
      while (at < 0) {
        if ((good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xc0) at = i
        else i += 1
      }
      at
    }
    val lossless = good.clone(); lossless(sofAt + 1) = 0xc3.toByte
    assert(dec.decode(row(lossless)).isEmpty)
    // a SOF2 marker on a BASELINE scan script is structurally broken
    // (the baseline SOS header declares Ss=0, Se=63 — an illegal
    // progressive band): miss, not garbage
    val progressive = good.clone(); progressive(sofAt + 1) = 0xc2.toByte
    assert(dec.decode(row(progressive)).isEmpty)
    // 16-bit quant table (precision nibble of the first DQT entry)
    val deepQ = good.clone()
    // DQT is the first segment after SOI: FF DB len2 then Pq/Tq
    assert((deepQ(2) & 0xff) == 0xff && (deepQ(3) & 0xff) == 0xdb)
    deepQ(6) = 0x10.toByte
    assert(dec.decode(row(deepQ)).isEmpty)
    // lying SOF dimensions (more MCUs than entropy data)
    val wide = good.clone()
    wide(sofAt + 7) = 0x7f.toByte // width high byte
    assert(dec.decode(row(wide)).isEmpty)
    // bare SOI / garbage after SOI
    assert(dec.decode(row(Array[Byte](0xff.toByte, 0xd8.toByte))).isEmpty)
    assert(dec.decode(row(Array[Byte](0xff.toByte, 0xd8.toByte, 1, 2, 3))).isEmpty)
  }

  test("progressive JPEG constant blocks roundtrip exactly, with and without restarts") {
    // same fixture shape as the baseline exactness gate: the DC
    // successive-approximation split (Al=1 first + refinement bit)
    // must reassemble the quantized DC bit-for-bit, negatives included
    val blockVals = Array(0, 255, 128, 1, 254, 17, 200, 90, 33, 66, 99,
      240, 13, 180, 127, 129)
    val gray = new Array[Byte](32 * 32)
    for (y <- 0 until 32; x <- 0 until 32)
      gray(y * 32 + x) = blockVals((y / 8) * 4 + (x / 8)).toByte
    for (rst <- Seq(0, 3)) {
      val frames = dec.decode(row(Jpeg.encodeGrayProgressive(32, 32, gray,
        restartInterval = rst)))
      assert(frames.size === 1, s"restartInterval=$rst did not decode")
      val f = frames.head
      assert(f.width === 32 && f.height === 32)
      assert(grayOf(f).toSeq === gray.map(_ & 0xff).toSeq,
        s"restartInterval=$rst mismatch")
    }
  }

  test("progressive JPEG AC band matches the sequential decode of the same raster") {
    // busy gradient (live ACs in every block), non-multiple-of-8 dims:
    // the spectral-selection AC scan plus the DC split must land on
    // exactly the same quantized coefficients as the baseline encoder,
    // so the decoded rasters must be IDENTICAL, not just close
    val w = 21; val h = 14
    val gray = Array.tabulate(w * h)(i =>
      ((i % w) * 11 + (i / w) * 29 + (i * i) % 31).toByte)
    val seq = dec.decode(row(Jpeg.encodeGray(w, h, gray)))
    val prog = dec.decode(row(Jpeg.encodeGrayProgressive(w, h, gray)))
    assert(seq.size === 1 && prog.size === 1)
    assert(prog.head.pixels.toSeq === seq.head.pixels.toSeq)
  }

  test("progressive JPEG decodes the JDK encoder's multi-scan script") {
    // ImageIO's progressive writer emits libjpeg's simple-progression
    // script (spectral selection AND successive approximation for the
    // AC bands, DC refinement scan) with its own tables — the broadest
    // independent cross-check of the Annex-G path. Grayscale isolates
    // the scan machinery from chroma upsampling variants.
    val w = 29; val h = 23
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 7 + y * 17 + (x * y) % 23) % 256)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    val bytes = baos.toByteArray
    // belt-and-braces: confirm the writer actually emitted SOF2
    val hasSof2 = bytes.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2)
    assert(hasSof2, "ImageIO did not write a progressive stream")
    val mine = dec.decode(row(bytes))
    assert(mine.size === 1, "decoder missed a JDK-encoded progressive JPEG")
    val f = mine.head
    assert(f.width === w && f.height === h)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val rv = ref.getRaster.getSample(x, y, 0)
      maxDiff = math.max(maxDiff,
        math.abs((f.pixels((y * w + x) * 3) & 0xff) - rv))
    }
    assert(maxDiff <= 1, s"max per-pixel diff vs ImageIO: $maxDiff")
  }

  test("progressive JPEG decodes the JDK encoder's color multi-scan script") {
    val w = 24; val h = 16
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 9 + y * 13) % 256 // R=G=B keeps chroma constant
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    val bytes = baos.toByteArray
    val mine = dec.decode(row(bytes))
    assert(mine.size === 1, "decoder missed a JDK-encoded color progressive JPEG")
    val f = mine.head
    assert(f.width === w && f.height === h)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val rc = (ref.getRGB(x, y) >> (16 - 8 * c)) & 0xff
      val mc = f.pixels((y * w + x) * 3 + c) & 0xff
      maxDiff = math.max(maxDiff, math.abs(mc - rc))
    }
    assert(maxDiff <= 2, s"max per-pixel diff vs ImageIO: $maxDiff")
  }

  test("progressive JPEG malformed inputs are decode misses, never exceptions") {
    val gray = Array.tabulate(16 * 16)(i => (i * 7).toByte)
    val good = Jpeg.encodeGrayProgressive(16, 16, gray)
    assert(dec.decode(row(good)).nonEmpty)
    // truncated mid-scan / missing EOI
    assert(dec.decode(row(good.dropRight(12))).isEmpty)
    assert(dec.decode(row(good.dropRight(2))).isEmpty)
    // EOI with zero scans decoded (header only, straight to EOI)
    val sosAt = {
      var i = 2; var at = -1
      while (at < 0) {
        if ((good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xda) at = i
        else i += 1
      }
      at
    }
    val noScans = good.take(sosAt) ++ Array[Byte](0xff.toByte, 0xd9.toByte)
    assert(dec.decode(row(noScans)).isEmpty)
    // illegal band: patch the first SOS to Ss=0, Se=63 (DC band must
    // be (0,0) in a progressive frame)
    val badBand = good.clone()
    // SOS layout: FF DA len2 ns(1) comp(1) tables(1) Ss Se AhAl
    badBand(sosAt + 8) = 63.toByte
    assert(dec.decode(row(badBand)).isEmpty)
  }

  test("single-component frame with declared 2x2 sampling decodes as non-interleaved") {
    // T.81 A.2: a one-component scan is non-interleaved regardless of
    // the frame's declared sampling factors — the blocks are in raster
    // order over 8-pixel-padded dims, NOT h*v-per-MCU order. Patch the
    // SOF sampling byte of a normal gray stream from 0x11 to 0x22: the
    // entropy data is unchanged, so the decode must be too.
    val gray = Array.tabulate(24 * 24)(i => (i * 13 + (i * i) % 29).toByte)
    val base = Jpeg.encodeGray(24, 24, gray)
    var i = 2; var sofAt = -1
    while (sofAt < 0) {
      if ((base(i) & 0xff) == 0xff && (base(i + 1) & 0xff) == 0xc0) sofAt = i
      else i += 1
    }
    // SOF payload: FF C0 len2 prec h2 w2 nc, then per-comp id, HV, Tq
    val patched = base.clone()
    assert((patched(sofAt + 11) & 0xff) === 0x11, "fixture layout drifted")
    patched(sofAt + 11) = 0x22.toByte
    val a = dec.decode(row(base)); val b = dec.decode(row(patched))
    assert(a.size === 1 && b.size === 1,
      "declared-2x2 single-component stream did not decode")
    assert(b.head.pixels.toSeq === a.head.pixels.toSeq)
  }
}
