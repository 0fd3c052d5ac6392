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
}
