package graft.multimodal

/** JPEG codec — ITU-T T.81 (the public 1992 spec), DCT + Huffman
  * entropy coding. Decoder subset: SOF0 baseline / SOF1 extended
  * sequential / SOF2 progressive (spectral selection + successive
  * approximation, T.81 Annex G), 8-bit samples, 1 (gray) or 3
  * (YCbCr) components, sampling factors 1–2 per axis (4:4:4 /
  * 4:2:2 / 4:4:0 / 4:2:0), restart markers, multi-table DQT/DHT
  * segments, inter-scan DHT/DQT/DRI redefinition. Everything else —
  * arithmetic coding, 12-bit, hierarchical, 16-bit quant tables —
  * is a decode MISS (None), never an exception: the same never-throw
  * contract as the PPM/BMP/PNG/WAV/GVID parsers in
  * [[MediaPipeline]]. Baseline + progressive together are the formats
  * crawl images actually arrive in; the perceptual-dedup family runs
  * on real web bytes through this path.
  *
  * The inverse DCT is the fixed-point integer Loeffler–Ligtenberg–
  * Moshytz factorization (13-bit constants, two descaled passes —
  * the widely published "islow" arithmetic, spelled here in Long so a
  * hostile coefficient stream can't overflow), so decode output is a
  * deterministic integer function of the compressed bytes: the
  * `multimodal_jpeg` oracle gate pins reconstructed pixel sums
  * exactly, no float tolerance. Color conversion and downsampling use
  * the matching 16-bit fixed-point forms. The encoder exists for the
  * fixture/test side of the gate (and writes self-describing DHT/DQT
  * segments, so its streams stay decodable by any spec decoder even
  * if its built-in tables were swapped).
  *
  * Reference behavior modeled: etielle treats unreadable source
  * payloads as path misses, not hard errors (fluent.py's null-safe
  * traversal rule) — decode failure here yields zero frames the same
  * way.
  */
object Jpeg {

  /** Zigzag scan: index k in scan order → position in the natural
    * (row-major) 8×8 order. T.81 Figure A.6. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Decode miss — one stackless control exception so the hot decode
    * loop stays straight-line; every public entry catches it. */
  private object Miss extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def miss(): Nothing = throw Miss

  // ---------------------------------------------------------------------
  // Fixed-point 8×8 DCT (Loeffler–Ligtenberg–Moshytz factorization,
  // 13-bit "islow" constants — public algorithm; T.81 A.3.3 defines the
  // exact transform it approximates)
  // ---------------------------------------------------------------------

  private final val ConstBits = 13
  private final val Pass1Bits = 2
  private final val F_0_298631336 = 2446L
  private final val F_0_390180644 = 3196L
  private final val F_0_541196100 = 4433L
  private final val F_0_765366865 = 6270L
  private final val F_0_899976223 = 7373L
  private final val F_1_175875602 = 9633L
  private final val F_1_501321110 = 12299L
  private final val F_1_847759065 = 15137L
  private final val F_1_961570560 = 16069L
  private final val F_2_053119869 = 16819L
  private final val F_2_562915447 = 20995L
  private final val F_3_072711026 = 25172L

  private def descale(x: Long, n: Int): Long = (x + (1L << (n - 1))) >> n

  private def clamp255(v: Long): Int =
    if (v < 0) 0 else if (v > 255) 255 else v.toInt

  /** Integer inverse DCT of one dequantized block (natural order) into
    * level-shifted, clamped 0..255 samples. Two passes: columns at
    * +PASS1_BITS intermediate precision, then rows descaled to
    * samples. All-zero-AC fast paths produce the same values the full
    * butterfly would (the rounding terms cancel), so they are pure
    * speed. */
  private[multimodal] def idctBlock(coef: Array[Long],
      out: Array[Int]): Unit = {
    val ws = new Array[Long](64)
    // pass 1: columns
    var c = 0
    while (c < 8) {
      if (coef(8 + c) == 0 && coef(16 + c) == 0 && coef(24 + c) == 0 &&
        coef(32 + c) == 0 && coef(40 + c) == 0 && coef(48 + c) == 0 &&
        coef(56 + c) == 0) {
        val dc = coef(c) << Pass1Bits
        var r = 0
        while (r < 8) { ws(r * 8 + c) = dc; r += 1 }
      } else {
        var z2 = coef(16 + c); var z3 = coef(48 + c)
        var z1 = (z2 + z3) * F_0_541196100
        var tmp2 = z1 - z3 * F_1_847759065
        var tmp3 = z1 + z2 * F_0_765366865
        z2 = coef(c); z3 = coef(32 + c)
        var tmp0 = (z2 + z3) << ConstBits
        var tmp1 = (z2 - z3) << ConstBits
        val t10 = tmp0 + tmp3; val t13 = tmp0 - tmp3
        val t11 = tmp1 + tmp2; val t12 = tmp1 - tmp2
        tmp0 = coef(56 + c); tmp1 = coef(40 + c)
        tmp2 = coef(24 + c); tmp3 = coef(8 + c)
        z1 = tmp0 + tmp3; z2 = tmp1 + tmp2
        z3 = tmp0 + tmp2; var z4 = tmp1 + tmp3
        val z5 = (z3 + z4) * F_1_175875602
        tmp0 *= F_0_298631336; tmp1 *= F_2_053119869
        tmp2 *= F_3_072711026; tmp3 *= F_1_501321110
        z1 *= -F_0_899976223; z2 *= -F_2_562915447
        z3 = z3 * -F_1_961570560 + z5; z4 = z4 * -F_0_390180644 + z5
        tmp0 += z1 + z3; tmp1 += z2 + z4; tmp2 += z2 + z3; tmp3 += z1 + z4
        ws(c) = descale(t10 + tmp3, ConstBits - Pass1Bits)
        ws(56 + c) = descale(t10 - tmp3, ConstBits - Pass1Bits)
        ws(8 + c) = descale(t11 + tmp2, ConstBits - Pass1Bits)
        ws(48 + c) = descale(t11 - tmp2, ConstBits - Pass1Bits)
        ws(16 + c) = descale(t12 + tmp1, ConstBits - Pass1Bits)
        ws(40 + c) = descale(t12 - tmp1, ConstBits - Pass1Bits)
        ws(24 + c) = descale(t13 + tmp0, ConstBits - Pass1Bits)
        ws(32 + c) = descale(t13 - tmp0, ConstBits - Pass1Bits)
      }
      c += 1
    }
    // pass 2: rows, final descale + level shift
    val shift = ConstBits + Pass1Bits + 3
    var r = 0
    while (r < 8) {
      val o = r * 8
      if (ws(o + 1) == 0 && ws(o + 2) == 0 && ws(o + 3) == 0 &&
        ws(o + 4) == 0 && ws(o + 5) == 0 && ws(o + 6) == 0 &&
        ws(o + 7) == 0) {
        val dc = clamp255(descale(ws(o), Pass1Bits + 3) + 128)
        var x = 0
        while (x < 8) { out(o + x) = dc; x += 1 }
      } else {
        var z2 = ws(o + 2); var z3 = ws(o + 6)
        var z1 = (z2 + z3) * F_0_541196100
        var tmp2 = z1 - z3 * F_1_847759065
        var tmp3 = z1 + z2 * F_0_765366865
        var tmp0 = (ws(o) + ws(o + 4)) << ConstBits
        var tmp1 = (ws(o) - ws(o + 4)) << ConstBits
        val t10 = tmp0 + tmp3; val t13 = tmp0 - tmp3
        val t11 = tmp1 + tmp2; val t12 = tmp1 - tmp2
        tmp0 = ws(o + 7); tmp1 = ws(o + 5); tmp2 = ws(o + 3); tmp3 = ws(o + 1)
        z1 = tmp0 + tmp3; z2 = tmp1 + tmp2
        z3 = tmp0 + tmp2; var z4 = tmp1 + tmp3
        val z5 = (z3 + z4) * F_1_175875602
        tmp0 *= F_0_298631336; tmp1 *= F_2_053119869
        tmp2 *= F_3_072711026; tmp3 *= F_1_501321110
        z1 *= -F_0_899976223; z2 *= -F_2_562915447
        z3 = z3 * -F_1_961570560 + z5; z4 = z4 * -F_0_390180644 + z5
        tmp0 += z1 + z3; tmp1 += z2 + z4; tmp2 += z2 + z3; tmp3 += z1 + z4
        out(o) = clamp255(descale(t10 + tmp3, shift) + 128)
        out(o + 7) = clamp255(descale(t10 - tmp3, shift) + 128)
        out(o + 1) = clamp255(descale(t11 + tmp2, shift) + 128)
        out(o + 6) = clamp255(descale(t11 - tmp2, shift) + 128)
        out(o + 2) = clamp255(descale(t12 + tmp1, shift) + 128)
        out(o + 5) = clamp255(descale(t12 - tmp1, shift) + 128)
        out(o + 3) = clamp255(descale(t13 + tmp0, shift) + 128)
        out(o + 4) = clamp255(descale(t13 - tmp0, shift) + 128)
      }
      r += 1
    }
  }

  /** Integer forward DCT (same factorization run forward); input is
    * level-shifted samples (s − 128), output is the transform scaled
    * ×8 in natural order — the encoder's quantizer divides by
    * `q << 3` to undo the scale. */
  private[multimodal] def fdctBlock(d: Array[Long]): Array[Long] = {
    // pass 1: rows
    var r = 0
    while (r < 8) {
      val o = r * 8
      val tmp0 = d(o) + d(o + 7); val tmp7 = d(o) - d(o + 7)
      val tmp1 = d(o + 1) + d(o + 6); val tmp6 = d(o + 1) - d(o + 6)
      val tmp2 = d(o + 2) + d(o + 5); val tmp5 = d(o + 2) - d(o + 5)
      val tmp3 = d(o + 3) + d(o + 4); val tmp4 = d(o + 3) - d(o + 4)
      val t10 = tmp0 + tmp3; val t13 = tmp0 - tmp3
      val t11 = tmp1 + tmp2; val t12 = tmp1 - tmp2
      d(o) = (t10 + t11) << Pass1Bits
      d(o + 4) = (t10 - t11) << Pass1Bits
      var z1 = (t12 + t13) * F_0_541196100
      d(o + 2) = descale(z1 + t13 * F_0_765366865, ConstBits - Pass1Bits)
      d(o + 6) = descale(z1 - t12 * F_1_847759065, ConstBits - Pass1Bits)
      z1 = tmp4 + tmp7; var z2 = tmp5 + tmp6
      var z3 = tmp4 + tmp6; var z4 = tmp5 + tmp7
      val z5 = (z3 + z4) * F_1_175875602
      val u4 = tmp4 * F_0_298631336; val u5 = tmp5 * F_2_053119869
      val u6 = tmp6 * F_3_072711026; val u7 = tmp7 * F_1_501321110
      z1 *= -F_0_899976223; z2 *= -F_2_562915447
      z3 = z3 * -F_1_961570560 + z5; z4 = z4 * -F_0_390180644 + z5
      d(o + 7) = descale(u4 + z1 + z3, ConstBits - Pass1Bits)
      d(o + 5) = descale(u5 + z2 + z4, ConstBits - Pass1Bits)
      d(o + 3) = descale(u6 + z2 + z3, ConstBits - Pass1Bits)
      d(o + 1) = descale(u7 + z1 + z4, ConstBits - Pass1Bits)
      r += 1
    }
    // pass 2: columns
    var c = 0
    while (c < 8) {
      val tmp0 = d(c) + d(56 + c); val tmp7 = d(c) - d(56 + c)
      val tmp1 = d(8 + c) + d(48 + c); val tmp6 = d(8 + c) - d(48 + c)
      val tmp2 = d(16 + c) + d(40 + c); val tmp5 = d(16 + c) - d(40 + c)
      val tmp3 = d(24 + c) + d(32 + c); val tmp4 = d(24 + c) - d(32 + c)
      val t10 = tmp0 + tmp3; val t13 = tmp0 - tmp3
      val t11 = tmp1 + tmp2; val t12 = tmp1 - tmp2
      d(c) = descale(t10 + t11, Pass1Bits)
      d(32 + c) = descale(t10 - t11, Pass1Bits)
      var z1 = (t12 + t13) * F_0_541196100
      d(16 + c) = descale(z1 + t13 * F_0_765366865, ConstBits + Pass1Bits)
      d(48 + c) = descale(z1 - t12 * F_1_847759065, ConstBits + Pass1Bits)
      z1 = tmp4 + tmp7; var z2 = tmp5 + tmp6
      var z3 = tmp4 + tmp6; var z4 = tmp5 + tmp7
      val z5 = (z3 + z4) * F_1_175875602
      val u4 = tmp4 * F_0_298631336; val u5 = tmp5 * F_2_053119869
      val u6 = tmp6 * F_3_072711026; val u7 = tmp7 * F_1_501321110
      z1 *= -F_0_899976223; z2 *= -F_2_562915447
      z3 = z3 * -F_1_961570560 + z5; z4 = z4 * -F_0_390180644 + z5
      d(56 + c) = descale(u4 + z1 + z3, ConstBits + Pass1Bits)
      d(40 + c) = descale(u5 + z2 + z4, ConstBits + Pass1Bits)
      d(24 + c) = descale(u6 + z2 + z3, ConstBits + Pass1Bits)
      d(8 + c) = descale(u7 + z1 + z4, ConstBits + Pass1Bits)
      c += 1
    }
    d
  }

  // ---------------------------------------------------------------------
  // Huffman tables (T.81 Annex C code generation, Annex F decode)
  // ---------------------------------------------------------------------

  /** One Huffman table: `counts(l)` codes of length l+1, symbols in
    * code order. Builds both the decoder's MINCODE/MAXCODE/VALPTR
    * (F.2.2.3) and the encoder's symbol → (code, length) map (C.2). */
  private[multimodal] final class HuffTable(counts: Array[Int],
      symbols: Array[Int]) {
    require(counts.length == 16 && counts.sum == symbols.length,
      "Huffman spec: 16 counts summing to the symbol count")
    private val mincode = new Array[Int](17)
    private val maxcode = Array.fill(17)(-1)
    private val valptr = new Array[Int](17)
    private[multimodal] val encCode = new Array[Int](256)
    private[multimodal] val encLen = new Array[Int](256)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        if (counts(l - 1) > 0) {
          valptr(l) = k
          mincode(l) = code
          var i = 0
          while (i < counts(l - 1)) {
            val sym = symbols(k)
            require(sym >= 0 && sym <= 255, s"symbol out of range: $sym")
            encCode(sym) = code; encLen(sym) = l
            code += 1; k += 1; i += 1
          }
          maxcode(l) = code - 1
        }
        require(code <= (1 << l), "over-subscribed Huffman code space")
        code <<= 1
        l += 1
      }
    }

    /** Decode one symbol (F.2.2.3's DECODE). */
    def decode(in: BitReader): Int = {
      var l = 1
      var code = in.readBit()
      while (maxcode(l) < 0 || code > maxcode(l)) {
        code = (code << 1) | in.readBit()
        l += 1
        if (l > 16) miss()
      }
      symbols(valptr(l) + code - mincode(l))
    }
  }

  /** Entropy-segment bit reader: 0xFF00 byte unstuffing, restart-marker
    * consumption at byte-aligned MCU boundaries, any other marker mid-
    * stream = miss (truncated/corrupt scan). */
  private[multimodal] final class BitReader(b: Array[Byte], start: Int) {
    private var pos = start
    private var cur = 0
    private var nbits = 0

    def readBit(): Int = {
      if (nbits == 0) {
        if (pos >= b.length) miss()
        val by = b(pos) & 0xff; pos += 1
        if (by == 0xff) {
          if (pos >= b.length) miss()
          if ((b(pos) & 0xff) != 0x00) miss() // marker inside entropy data
          pos += 1
        }
        cur = by; nbits = 8
      }
      nbits -= 1
      (cur >> nbits) & 1
    }

    def receive(s: Int): Int = {
      var v = 0; var i = 0
      while (i < s) { v = (v << 1) | readBit(); i += 1 }
      v
    }

    def align(): Unit = nbits = 0

    /** Byte offset of the next unread byte — only meaningful after
      * [[align]]; lets the progressive marker walk resume after a
      * scan's entropy segment. */
    def position: Int = pos

    /** Consume RSTm at a byte boundary (nbits must be drained first). */
    def expectRestart(m: Int): Unit = {
      if (pos + 1 >= b.length || (b(pos) & 0xff) != 0xff ||
        (b(pos + 1) & 0xff) != (0xd0 + m)) miss()
      pos += 2
    }

    /** After the last MCU: optional 0xFF fill bytes, then EOI —
      * a scan with no EOI is truncated = miss (the PNG IEND rule). */
    def expectEoi(): Unit = {
      if (pos >= b.length || (b(pos) & 0xff) != 0xff) miss()
      while (pos + 1 < b.length && (b(pos + 1) & 0xff) == 0xff) pos += 1
      if (pos + 1 >= b.length || (b(pos + 1) & 0xff) != 0xd9) miss()
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  // ---------------------------------------------------------------------
  // Decoder
  // ---------------------------------------------------------------------

  private final case class Component(id: Int, h: Int, v: Int, tq: Int,
      var td: Int = 0, var ta: Int = 0)

  /** Decode baseline JPEG bytes to (width, height, packed RGB24);
    * anything outside the supported subset or structurally broken is
    * None. */
  def decode(b: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    try decodeImpl(b)
    catch {
      case Miss => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }

  private def decodeImpl(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None
    var i = 2
    val qt = new Array[Array[Int]](4)
    val dcTab = new Array[HuffTable](4)
    val acTab = new Array[HuffTable](4)
    var width = 0; var height = 0
    var comps: Array[Component] = null
    var restartInterval = 0
    // progressive (SOF2) state: per-component zigzag-order coefficient
    // buffers accumulated across scans, IDCT'd once at EOI
    var progressive = false
    var coefBufs: Array[Array[Int]] = null
    var quantLatched: Array[Array[Int]] = null // per-comp table at 1st SOS
    var scansDecoded = 0

    def u16(o: Int): Int = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

    while (true) {
      // marker: one or more 0xFF fill bytes then the code
      if (i + 1 >= b.length) miss()
      if ((b(i) & 0xff) != 0xff) miss()
      while (i + 1 < b.length && (b(i + 1) & 0xff) == 0xff) i += 1
      if (i + 1 >= b.length) miss()
      val m = b(i + 1) & 0xff
      i += 2
      m match {
        case 0xd9 => // EOI: terminal for progressive, premature otherwise
          if (!progressive || scansDecoded == 0) miss()
          return Some(reconstructProgressive(width, height, comps,
            coefBufs, quantLatched))
        case 0x01 => () // TEM, standalone
        case rst if rst >= 0xd0 && rst <= 0xd7 => () // stray RST, standalone
        case _ =>
          if (i + 1 >= b.length) miss()
          val len = u16(i)
          if (len < 2 || i + len > b.length) miss()
          val seg = i + 2
          val segEnd = i + len
          // a progressive SOS advances past its entropy data, not just
          // the marker segment; every other segment resumes at segEnd
          var scanEnd = segEnd
          m match {
            case 0xdb => // DQT, possibly several tables
              var p = seg
              while (p < segEnd) {
                val pq = (b(p) & 0xff) >> 4
                val tq = b(p) & 0x0f
                if (pq != 0 || tq > 3 || p + 65 > segEnd) miss() // 8-bit only
                val t = new Array[Int](64)
                var k = 0
                while (k < 64) { t(k) = b(p + 1 + k) & 0xff; k += 1 }
                qt(tq) = t
                p += 65
              }
              if (p != segEnd) miss()
            case 0xc4 => // DHT, possibly several tables
              var p = seg
              while (p < segEnd) {
                val tc = (b(p) & 0xff) >> 4
                val th = b(p) & 0x0f
                if (tc > 1 || th > 3 || p + 17 > segEnd) miss()
                val counts = Array.tabulate(16)(k => b(p + 1 + k) & 0xff)
                val n = counts.sum
                if (n == 0 || n > 256 || p + 17 + n > segEnd) miss()
                val syms = Array.tabulate(n)(k => b(p + 17 + k) & 0xff)
                val tbl =
                  try new HuffTable(counts, syms)
                  catch { case _: IllegalArgumentException => miss() }
                if (tc == 0) dcTab(th) = tbl else acTab(th) = tbl
                p += 17 + n
              }
              if (p != segEnd) miss()
            case 0xc0 | 0xc1 | 0xc2 => // SOF0 baseline / SOF1 / SOF2 progressive
              // SOF1 with 8-bit samples and Huffman coding decodes
              // byte-identically to baseline (T.81 Table B.1 — the
              // extension only admits 12-bit, which the precision
              // check below rejects); crawl JPEGs occasionally carry it.
              // SOF2 switches to the Annex-G multi-scan path.
              progressive = m == 0xc2
              if (comps != null || len < 11) miss()
              if ((b(seg) & 0xff) != 8) miss() // 8-bit samples
              height = u16(seg + 1); width = u16(seg + 3)
              val nc = b(seg + 5) & 0xff
              if (width <= 0 || height <= 0 || (nc != 1 && nc != 3) ||
                len != 8 + 3 * nc) miss()
              if (width.toLong * height * 3 > Int.MaxValue ||
                width.toLong * height > (1L << 26)) miss() // lying header cap
              comps = Array.tabulate(nc) { k =>
                val o = seg + 6 + 3 * k
                // a single-component frame's scans are non-interleaved by
                // definition (T.81 A.2: MCU = one data unit, raster order,
                // dims padded to 8), so declared sampling factors do not
                // shape the block layout — force 1x1 instead of decoding
                // a spec-legal gray frame with h=v=2 in the wrong order
                val hs = if (nc == 1) 1 else (b(o + 1) & 0xff) >> 4
                val vs = if (nc == 1) 1 else b(o + 1) & 0x0f
                val tqi = b(o + 2) & 0xff
                if (hs < 1 || hs > 2 || vs < 1 || vs > 2 || tqi > 3) miss()
                Component(b(o) & 0xff, hs, vs, tqi)
              }
              // MCU padding can exceed the raw-pixel cap (h=1 pads to a
              // full 8*vmax-row band): bound the padded plane area the
              // scan actually allocates, not just w*h
              val hm = comps.map(_.h).max; val vm = comps.map(_.v).max
              val mx = (width + 8 * hm - 1) / (8 * hm)
              val my = (height + 8 * vm - 1) / (8 * vm)
              if ((mx * 8L * hm) * (my * 8L * vm) > (1L << 26)) miss()
            case sof if (sof >= 0xc3 && sof <= 0xcf) && sof != 0xc4 &&
                sof != 0xc8 && sof != 0xcc =>
              miss() // lossless/arithmetic/hierarchical: unsupported
            case 0xdd => // DRI
              if (len != 4) miss()
              restartInterval = u16(seg)
            case 0xda => // SOS → entropy-coded scan
              if (comps == null || len < 8) miss()
              val ns = b(seg) & 0xff
              if (ns < 1 || len != 6 + 2 * ns) miss()
              if (!progressive && ns != comps.length) miss()
              val scanCis = new Array[Int](ns)
              var k = 0
              while (k < ns) {
                val cs = b(seg + 1 + 2 * k) & 0xff
                val ci = comps.indexWhere(_.id == cs)
                if (ci < 0) miss()
                scanCis(k) = ci
                comps(ci).td = (b(seg + 2 + 2 * k) & 0xff) >> 4
                comps(ci).ta = b(seg + 2 + 2 * k) & 0x0f
                if (comps(ci).td > 3 || comps(ci).ta > 3) miss()
                k += 1
              }
              val ss = b(segEnd - 3) & 0xff
              val se = b(segEnd - 2) & 0xff
              val ah = (b(segEnd - 1) & 0xff) >> 4
              val al = b(segEnd - 1) & 0x0f
              if (!progressive) {
                // baseline spectral selection: Ss=0, Se=63, Ah=Al=0
                if (ss != 0 || se != 63 || ah != 0 || al != 0) miss()
                return Some(decodeScan(b, segEnd, width, height, comps,
                  qt, dcTab, acTab, restartInterval))
              }
              // Annex-G scan-header constraints: a DC band is (0,0) and
              // may interleave; an AC band is within 1..63 and is
              // non-interleaved; successive approximation refines one
              // bit at a time (Ah = Al + 1); Al <= 13 for 8-bit frames
              if (ss == 0) { if (se != 0) miss() }
              else if (se < ss || se > 63 || ns != 1) miss()
              if (al > 13 || (ah != 0 && ah != al + 1)) miss()
              if (coefBufs == null) {
                // first scan: latch quant tables + size the buffers on
                // the MCU-padded grid (bounded by the SOF padded cap)
                quantLatched = comps.map { c =>
                  if (qt(c.tq) == null) miss()
                  qt(c.tq)
                }
                val hm = comps.map(_.h).max; val vm = comps.map(_.v).max
                val mx = (width + 8 * hm - 1) / (8 * hm)
                val my = (height + 8 * vm - 1) / (8 * vm)
                coefBufs = comps.map(c =>
                  new Array[Int](mx * c.h * my * c.v * 64))
              }
              scanEnd = decodeProgressiveScan(b, segEnd, width, height,
                comps, scanCis, dcTab, acTab, restartInterval, ss, se, ah,
                al, coefBufs)
              scansDecoded += 1
            case app if (app >= 0xe0 && app <= 0xef) || app == 0xfe => () // APPn/COM
            case _ => () // other length-carrying segments: skip
          }
          i = scanEnd
      }
    }
    None // unreachable
  }

  /** The interleaved MCU scan: Huffman → dequant → IDCT per block into
    * per-component planes, then upsample + color-convert the crop. */
  private def decodeScan(b: Array[Byte], start: Int, w: Int, h: Int,
      comps: Array[Component], qt: Array[Array[Int]],
      dcTab: Array[HuffTable], acTab: Array[HuffTable],
      restartInterval: Int): (Int, Int, Array[Byte]) = {
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    comps.foreach { c =>
      if (qt(c.tq) == null || dcTab(c.td) == null || acTab(c.ta) == null)
        miss()
    }
    val planeW = comps.map(c => mcusX * c.h * 8)
    val planeH = comps.map(c => mcusY * c.v * 8)
    val planes = comps.indices.map { ci =>
      if (planeW(ci).toLong * planeH(ci) > Int.MaxValue) miss()
      new Array[Int](planeW(ci) * planeH(ci))
    }.toArray
    val dcPred = new Array[Long](comps.length)
    val in = new BitReader(b, start)
    val coef = new Array[Long](64)
    val block = new Array[Int](64)
    var rstIdx = 0
    var mcu = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          in.align()
          in.expectRestart(rstIdx)
          rstIdx = (rstIdx + 1) % 8
          java.util.Arrays.fill(dcPred, 0L)
        }
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          val q = qt(c.tq)
          var bv = 0
          while (bv < c.v) {
            var bh = 0
            while (bh < c.h) {
              java.util.Arrays.fill(coef, 0L)
              // DC: category + DPCM diff (F.2.2.1). Baseline 8-bit
              // caps the category at 11 (|diff| <= 2047); the predictor
              // accumulates in Long so even a hostile stream pumping
              // max-magnitude diffs every block (padded-area cap bounds
              // blocks per component at 2^20 → |dcPred| < 2^31) cannot
              // wrap into deterministic garbage, and a hostile DHT
              // defining categories 12-15 is a miss outright.
              val t = dcTab(c.td).decode(in)
              if (t > 11) miss()
              dcPred(ci) += extend(in.receive(t), t)
              coef(0) = dcPred(ci) * q(0)
              // AC: run/size pairs, ZRL, EOB (F.2.2.2)
              var k = 1
              while (k < 64) {
                val rs = acTab(c.ta).decode(in)
                val run = rs >> 4; val size = rs & 15
                if (size == 0) {
                  if (run == 15) k += 16 else k = 64 // ZRL | EOB
                } else {
                  k += run
                  if (k > 63) miss()
                  coef(Zigzag(k)) =
                    extend(in.receive(size), size).toLong * q(k)
                  k += 1
                }
              }
              idctBlock(coef, block)
              val x0 = (mx * c.h + bh) * 8
              val y0 = (my * c.v + bv) * 8
              val plane = planes(ci); val pw = planeW(ci)
              var yy = 0
              while (yy < 8) {
                var xx = 0
                val rowO = (y0 + yy) * pw + x0
                while (xx < 8) {
                  plane(rowO + xx) = block(yy * 8 + xx); xx += 1
                }
                yy += 1
              }
              bh += 1
            }
            bv += 1
          }
          ci += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    in.align()
    in.expectEoi()
    planesToRgb(w, h, comps, planes, planeW, hmax, vmax)
  }

  /** Crop the MCU-padded component planes to (w, h) packed RGB24:
    * grayscale replication for 1 component, sample-replication
    * upsample + 16-bit fixed-point YCbCr→RGB for 3 (T.81 has no color
    * model; these are the JFIF/CCIR 601 constants). */
  private def planesToRgb(w: Int, h: Int, comps: Array[Component],
      planes: Array[Array[Int]], planeW: Array[Int], hmax: Int,
      vmax: Int): (Int, Int, Array[Byte]) = {
    val out = new Array[Byte](w * h * 3)
    if (comps.length == 1) {
      val p = planes(0); val pw = planeW(0)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = p(y * pw + x).toByte
          val o = (y * w + x) * 3
          out(o) = g; out(o + 1) = g; out(o + 2) = g
          x += 1
        }
        y += 1
      }
    } else {
      val c0 = comps(0); val c1 = comps(1); val c2 = comps(2)
      val p0 = planes(0); val p1 = planes(1); val p2 = planes(2)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val lum = p0((y * c0.v / vmax) * planeW(0) + (x * c0.h / hmax))
          val cb = p1((y * c1.v / vmax) * planeW(1) + (x * c1.h / hmax)) - 128
          val cr = p2((y * c2.v / vmax) * planeW(2) + (x * c2.h / hmax)) - 128
          val o = (y * w + x) * 3
          out(o) = clamp255(lum + ((91881L * cr + 32768) >> 16)).toByte
          out(o + 1) = clamp255(
            lum + ((-22554L * cb - 46802L * cr + 32768) >> 16)).toByte
          out(o + 2) = clamp255(lum + ((116130L * cb + 32768) >> 16)).toByte
          x += 1
        }
        y += 1
      }
    }
    (w, h, out)
  }

  // ---------------------------------------------------------------------
  // Progressive decoder (T.81 Annex G)
  // ---------------------------------------------------------------------

  /** Decode one progressive scan's entropy segment into the zigzag-
    * order coefficient buffers and return the byte offset of the next
    * marker. Four scan kinds (G.1.2): DC first (interleaved over MCUs
    * or raster for Ns=1), DC refinement (one raw bit per data unit),
    * AC first (EOB-run coded band), AC refinement (correction bits).
    * Restart markers reset the DC predictors AND the EOB run. */
  private def decodeProgressiveScan(b: Array[Byte], start: Int, w: Int,
      h: Int, comps: Array[Component], scanCis: Array[Int],
      dcTab: Array[HuffTable], acTab: Array[HuffTable],
      restartInterval: Int, ss: Int, se: Int, ah: Int, al: Int,
      coefBufs: Array[Array[Int]]): Int = {
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    val in = new BitReader(b, start)
    val dcPred = new Array[Long](comps.length)
    var eobrun = 0L
    var rstIdx = 0
    var unit = 0 // restart cadence: MCUs if interleaved, data units if not

    def restartIfDue(): Unit =
      if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
        in.align()
        in.expectRestart(rstIdx)
        rstIdx = (rstIdx + 1) % 8
        java.util.Arrays.fill(dcPred, 0L)
        eobrun = 0L
      }

    // one DC data unit at zigzag slot 0 of `base`
    def dcUnit(ci: Int, base: Int): Unit = {
      val buf = coefBufs(ci)
      if (ah == 0) {
        val t = dcTab(comps(ci).td).decode(in)
        if (t > 11) miss()
        dcPred(ci) += extend(in.receive(t), t)
        val v = dcPred(ci) << al
        if (v > Int.MaxValue || v < Int.MinValue) miss()
        buf(base) = v.toInt
      } else {
        // refinement: append bit Al of the DC value; two's complement
        // OR reproduces the arithmetic-shift history exactly for
        // negative values too ((-4 | 1) == -3)
        if (in.readBit() != 0) buf(base) |= 1 << al
      }
    }

    if (ss == 0) {
      // DC band scan — interleaved like a baseline scan when Ns > 1
      scanCis.foreach(ci => if (ah == 0 && dcTab(comps(ci).td) == null) miss())
      if (scanCis.length > 1) {
        var my = 0
        while (my < mcusY) {
          var mx = 0
          while (mx < mcusX) {
            restartIfDue()
            var k = 0
            while (k < scanCis.length) {
              val ci = scanCis(k); val c = comps(ci)
              val bw = mcusX * c.h
              var bv = 0
              while (bv < c.v) {
                var bh = 0
                while (bh < c.h) {
                  dcUnit(ci,
                    ((my * c.v + bv) * bw + (mx * c.h + bh)) * 64)
                  bh += 1
                }
                bv += 1
              }
              k += 1
            }
            unit += 1
            mx += 1
          }
          my += 1
        }
      } else {
        val ci = scanCis(0); val c = comps(ci)
        val bw = (((w * c.h + hmax - 1) / hmax) + 7) / 8
        val bh = (((h * c.v + vmax - 1) / vmax) + 7) / 8
        val paddedBW = mcusX * c.h
        var by = 0
        while (by < bh) {
          var bx = 0
          while (bx < bw) {
            restartIfDue()
            dcUnit(ci, (by * paddedBW + bx) * 64)
            unit += 1
            bx += 1
          }
          by += 1
        }
      }
    } else {
      // AC band scan — always non-interleaved (Ns == 1, checked by the
      // caller); data units in raster order over the component's own
      // (unpadded) block grid
      val ci = scanCis(0); val c = comps(ci)
      if (acTab(c.ta) == null) miss()
      val ac = acTab(c.ta)
      val buf = coefBufs(ci)
      val bw = (((w * c.h + hmax - 1) / hmax) + 7) / 8
      val bh = (((h * c.v + vmax - 1) / vmax) + 7) / 8
      val paddedBW = mcusX * c.h
      val p1 = 1 << al; val m1 = -1 << al
      var by = 0
      while (by < bh) {
        var bx = 0
        while (bx < bw) {
          restartIfDue()
          val base = (by * paddedBW + bx) * 64
          if (ah == 0) {
            // first pass over this band (G.1.2.2): run/size with EOBn
            if (eobrun > 0) eobrun -= 1
            else {
              var k = ss
              while (k <= se) {
                val rs = ac.decode(in)
                val r = rs >> 4; val s = rs & 15
                if (s == 0) {
                  if (r == 15) k += 16 // ZRL
                  else {
                    eobrun = (1L << r) - 1
                    if (r > 0) eobrun += in.receive(r)
                    k = se + 1
                  }
                } else {
                  k += r
                  if (k > se) miss()
                  buf(base + k) = extend(in.receive(s), s) << al
                  k += 1
                }
              }
            }
          } else {
            // refinement pass (G.1.2.3): newly-nonzero ±1 values plus
            // one correction bit per already-nonzero coefficient; the
            // (coef & p1) test is exact because scan history keeps the
            // low Al+1 bits zero until this scan's correction lands
            var k = ss
            if (eobrun == 0) {
              var atEob = false
              while (k <= se && !atEob) {
                val rs = ac.decode(in)
                var r = rs >> 4; val s = rs & 15
                var newVal = 0
                if (s == 0) {
                  if (r != 15) { // EOBn: current block joins the run
                    eobrun = (1L << r)
                    if (r > 0) eobrun += in.receive(r)
                    atEob = true
                  }
                  // r == 15: ZRL — skip 16 zero-history slots below
                } else {
                  if (s != 1) miss() // refinement admits only ±1
                  newVal = if (in.readBit() != 0) p1 else m1
                }
                if (!atEob) {
                  var placed = false
                  while (k <= se && !placed) {
                    val idx = base + k
                    if (buf(idx) != 0) {
                      if (in.readBit() != 0 && (buf(idx) & p1) == 0)
                        buf(idx) += (if (buf(idx) >= 0) p1 else m1)
                    } else if (r == 0) {
                      if (newVal != 0) buf(idx) = newVal
                      placed = true
                    } else r -= 1
                    k += 1
                  }
                }
              }
            }
            if (eobrun > 0) {
              // inside an EOB run only correction bits appear
              while (k <= se) {
                val idx = base + k
                if (buf(idx) != 0) {
                  if (in.readBit() != 0 && (buf(idx) & p1) == 0)
                    buf(idx) += (if (buf(idx) >= 0) p1 else m1)
                }
                k += 1
              }
              eobrun -= 1
            }
          }
          unit += 1
          bx += 1
        }
        by += 1
      }
    }
    in.align()
    in.position
  }

  /** After EOI: dequantize + IDCT every buffered block into sample
    * planes, then crop/upsample/color-convert like the baseline path. */
  private def reconstructProgressive(w: Int, h: Int,
      comps: Array[Component], coefBufs: Array[Array[Int]],
      quant: Array[Array[Int]]): (Int, Int, Array[Byte]) = {
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    val planeW = comps.map(c => mcusX * c.h * 8)
    val planeH = comps.map(c => mcusY * c.v * 8)
    val planes = comps.indices.map(ci =>
      new Array[Int](planeW(ci) * planeH(ci))).toArray
    val coef = new Array[Long](64)
    val block = new Array[Int](64)
    var ci = 0
    while (ci < comps.length) {
      val c = comps(ci); val buf = coefBufs(ci); val q = quant(ci)
      val bw = mcusX * c.h; val bh = mcusY * c.v
      val plane = planes(ci); val pw = planeW(ci)
      var by = 0
      while (by < bh) {
        var bx = 0
        while (bx < bw) {
          val base = (by * bw + bx) * 64
          var k = 0
          while (k < 64) {
            coef(Zigzag(k)) = buf(base + k).toLong * q(k)
            k += 1
          }
          idctBlock(coef, block)
          val x0 = bx * 8; val y0 = by * 8
          var yy = 0
          while (yy < 8) {
            val rowO = (y0 + yy) * pw + x0
            var xx = 0
            while (xx < 8) {
              plane(rowO + xx) = block(yy * 8 + xx); xx += 1
            }
            yy += 1
          }
          bx += 1
        }
        by += 1
      }
      ci += 1
    }
    planesToRgb(w, h, comps, planes, planeW, hmax, vmax)
  }

  // ---------------------------------------------------------------------
  // Encoder (fixture/test side of the oracle gate)
  // ---------------------------------------------------------------------

  /** Flat all-ones quantization table (zigzag order): DCT roundtrip
    * error only, no quantization loss — the exactness fixtures' table. */
  val FlatQuant: Array[Int] = Array.fill(64)(1)

  // Annex K.3 typical tables (public spec constants)
  private val StdDcLumCounts =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val StdDcLumSyms = (0 to 11).toArray
  private val StdDcChrCounts =
    Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val StdDcChrSyms = (0 to 11).toArray
  private val StdAcLumCounts =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val StdAcLumSyms = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)
  private val StdAcChrCounts =
    Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val StdAcChrSyms = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  private lazy val DcLum = new HuffTable(StdDcLumCounts, StdDcLumSyms)
  private lazy val DcChr = new HuffTable(StdDcChrCounts, StdDcChrSyms)
  private lazy val AcLum = new HuffTable(StdAcLumCounts, StdAcLumSyms)
  private lazy val AcChr = new HuffTable(StdAcChrCounts, StdAcChrSyms)

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def write(code: Int, len: Int): Unit = {
      // a symbol the table doesn't define has len 0 — writing nothing
      // would silently corrupt the stream; fail loud at the seam
      require(len > 0, "symbol not present in the Huffman table")
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (T.81 F.1.2.3). */
    def flush(): Unit = if (nbits > 0) {
      acc = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
      out.write(acc)
      if (acc == 0xff) out.write(0x00)
      acc = 0; nbits = 0
    }
  }

  private def bitCategory(v: Int): Int =
    if (v == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** fDCT + quantize one 8×8 sample block → zigzag-order coefficients.
    * Divisor is q<<3 (the fDCT's ×8 scale), rounding half away from
    * zero. Quantized ACs clamp to ±1023: baseline AC size categories
    * stop at 10 (T.81 Table F.1 / the Annex K tables carry no size-11
    * symbols), and with an all-ones table a high-contrast block's AC
    * gain (≈1.27× per axis) can push past 1023 — the clamp loses at
    * most 1 LSB of one coefficient and keeps the stream encodable by
    * ANY baseline table set. DC stays unclamped: 8·mean ∈ [−1024,
    * 1016], so DPCM diffs fit category 11 by construction. */
  private def forwardBlock(samples: Array[Long], q: Array[Int]): Array[Int] = {
    val f = fdctBlock(samples)
    val zz = new Array[Int](64)
    var k = 0
    while (k < 64) {
      val v = f(Zigzag(k))
      val d = q(k).toLong << 3
      val qv = (if (v >= 0) (v + d / 2) / d else -((-v + d / 2) / d)).toInt
      zz(k) =
        if (k == 0) qv
        else if (qv > 1023) 1023 else if (qv < -1023) -1023 else qv
      k += 1
    }
    zz
  }

  private def writeBlock(bw: BitWriter, zz: Array[Int], dcPred: Int,
      dc: HuffTable, ac: HuffTable): Int = {
    val diff = zz(0) - dcPred
    val s = bitCategory(diff)
    bw.write(dc.encCode(s), dc.encLen(s))
    if (s > 0) bw.write(if (diff < 0) diff + (1 << s) - 1 else diff, s)
    var run = 0
    var k = 1
    while (k < 64) {
      if (zz(k) == 0) run += 1
      else {
        while (run > 15) { bw.write(ac.encCode(0xf0), ac.encLen(0xf0)); run -= 16 }
        val sz = bitCategory(zz(k))
        val sym = (run << 4) | sz
        bw.write(ac.encCode(sym), ac.encLen(sym))
        bw.write(if (zz(k) < 0) zz(k) + (1 << sz) - 1 else zz(k), sz)
        run = 0
      }
      k += 1
    }
    if (run > 0) bw.write(ac.encCode(0x00), ac.encLen(0x00)) // EOB
    zz(0)
  }

  private def u16be(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >> 8) & 0xff); out.write(v & 0xff)
  }

  private def segment(out: java.io.ByteArrayOutputStream, marker: Int,
      payload: Array[Int]): Unit = {
    out.write(0xff); out.write(marker)
    u16be(out, payload.length + 2)
    payload.foreach(out.write)
  }

  private def dhtPayload(tc: Int, th: Int, counts: Array[Int],
      syms: Array[Int]): Array[Int] =
    Array((tc << 4) | th) ++ counts ++ syms

  /** Extract one 8×8 block from a plane with edge replication (so the
    * encoder accepts any positive dimensions, matching the decoder's
    * crop). Output is level-shifted for the fDCT. */
  private def extractBlock(plane: Array[Int], pw: Int, ph: Int,
      x0: Int, y0: Int): Array[Long] = {
    val d = new Array[Long](64)
    var y = 0
    while (y < 8) {
      val sy = math.min(y0 + y, ph - 1)
      var x = 0
      while (x < 8) {
        val sx = math.min(x0 + x, pw - 1)
        d(y * 8 + x) = plane(sy * pw + sx) - 128L
        x += 1
      }
      y += 1
    }
    d
  }

  /** Encode 8-bit grayscale as baseline JPEG. `quant` is the luma
    * table in zigzag order ([[FlatQuant]] = lossless-but-for-DCT
    * rounding). `restartInterval` > 0 emits DRI + RSTn markers. */
  def encodeGray(w: Int, h: Int, gray: Array[Byte],
      quant: Array[Int] = FlatQuant, restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0, s"need positive dimensions, got ${w}x$h")
    require(gray.length == w * h, s"need ${w * h} bytes, got ${gray.length}")
    require(quant.length == 64 && quant.forall(q => q >= 1 && q <= 255),
      "quant: 64 entries in 1..255")
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    segment(out, 0xdb, Array(0x00) ++ quant)
    segment(out, 0xc0,
      Array(8, (h >> 8) & 0xff, h & 0xff, (w >> 8) & 0xff, w & 0xff,
        1, 1, 0x11, 0))
    segment(out, 0xc4, dhtPayload(0, 0, StdDcLumCounts, StdDcLumSyms))
    segment(out, 0xc4, dhtPayload(1, 0, StdAcLumCounts, StdAcLumSyms))
    if (restartInterval > 0)
      segment(out, 0xdd,
        Array((restartInterval >> 8) & 0xff, restartInterval & 0xff))
    segment(out, 0xda, Array(1, 1, 0x00, 0, 63, 0))
    val plane = Array.tabulate(w * h)(i => gray(i) & 0xff)
    val bw = new BitWriter(out)
    val mcusX = (w + 7) / 8; val mcusY = (h + 7) / 8
    var dcPred = 0
    var rstIdx = 0
    var mcu = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flush()
          out.write(0xff); out.write(0xd0 + rstIdx)
          rstIdx = (rstIdx + 1) % 8
          dcPred = 0
        }
        val zz = forwardBlock(extractBlock(plane, w, h, mx * 8, my * 8), quant)
        dcPred = writeBlock(bw, zz, dcPred, DcLum, AcLum)
        mcu += 1
        mx += 1
      }
      my += 1
    }
    bw.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Encode 8-bit grayscale as PROGRESSIVE (SOF2) JPEG with a
    * three-scan script that exercises every Annex-G decoder path the
    * oracle gate needs: DC first with successive approximation
    * (Ah=0, Al=1), DC refinement (Ah=1, Al=0, raw bits), then the
    * whole AC band by spectral selection in one pass (Ss=1, Se=63,
    * EOB-run coded). The DC split uses the spec's arithmetic-shift
    * point transform, so the decoder's two's-complement OR refinement
    * reassembles the quantized DC bit-for-bit — with [[FlatQuant]] and
    * constant blocks the roundtrip stays integer-exact, which is what
    * lets the `multimodal_jpeg_progressive` oracle pin pixel sums with
    * no tolerance. `restartInterval` > 0 emits DRI + per-scan RSTn. */
  def encodeGrayProgressive(w: Int, h: Int, gray: Array[Byte],
      quant: Array[Int] = FlatQuant, restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0, s"need positive dimensions, got ${w}x$h")
    require(gray.length == w * h, s"need ${w * h} bytes, got ${gray.length}")
    require(quant.length == 64 && quant.forall(q => q >= 1 && q <= 255),
      "quant: 64 entries in 1..255")
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    segment(out, 0xdb, Array(0x00) ++ quant)
    segment(out, 0xc2, // SOF2
      Array(8, (h >> 8) & 0xff, h & 0xff, (w >> 8) & 0xff, w & 0xff,
        1, 1, 0x11, 0))
    segment(out, 0xc4, dhtPayload(0, 0, StdDcLumCounts, StdDcLumSyms))
    segment(out, 0xc4, dhtPayload(1, 0, StdAcLumCounts, StdAcLumSyms))
    if (restartInterval > 0)
      segment(out, 0xdd,
        Array((restartInterval >> 8) & 0xff, restartInterval & 0xff))
    // quantize every block once; the scans re-walk the same data
    val plane = Array.tabulate(w * h)(i => gray(i) & 0xff)
    val bX = (w + 7) / 8; val bY = (h + 7) / 8
    val blocks = Array.tabulate(bY * bX) { bi =>
      forwardBlock(
        extractBlock(plane, w, h, (bi % bX) * 8, (bi / bX) * 8), quant)
    }
    // per-scan entropy segments share this restart/flush shape
    def scanUnits(emit: (BitWriter, Int) => Unit, reset: () => Unit): Unit = {
      val bw = new BitWriter(out)
      var rstIdx = 0
      var bi = 0
      while (bi < blocks.length) {
        if (restartInterval > 0 && bi > 0 && bi % restartInterval == 0) {
          bw.flush()
          out.write(0xff); out.write(0xd0 + rstIdx)
          rstIdx = (rstIdx + 1) % 8
          reset()
        }
        emit(bw, bi)
        bi += 1
      }
      bw.flush()
    }
    // scan 1: DC first, Al=1 — DPCM of the point-transformed DC
    segment(out, 0xda, Array(1, 1, 0x00, 0, 0, 0x01))
    var dcPred = 0
    scanUnits((bw, bi) => {
      val v = blocks(bi)(0) >> 1
      val diff = v - dcPred
      dcPred = v
      val s = bitCategory(diff)
      bw.write(DcLum.encCode(s), DcLum.encLen(s))
      if (s > 0) bw.write(if (diff < 0) diff + (1 << s) - 1 else diff, s)
    }, () => dcPred = 0)
    // scan 2: DC refinement, Ah=1 → Al=0 — one raw bit per data unit
    segment(out, 0xda, Array(1, 1, 0x00, 0, 0, 0x10))
    scanUnits((bw, bi) => bw.write(blocks(bi)(0) & 1, 1), () => ())
    // scan 3: the full AC band, Ss=1..Se=63, no approximation —
    // baseline run/size pairs; per-block EOB is the r=0 EOBn code
    segment(out, 0xda, Array(1, 1, 0x00, 1, 63, 0x00))
    scanUnits((bw, bi) => {
      val zz = blocks(bi)
      var run = 0
      var k = 1
      while (k < 64) {
        if (zz(k) == 0) run += 1
        else {
          while (run > 15) {
            bw.write(AcLum.encCode(0xf0), AcLum.encLen(0xf0)); run -= 16
          }
          val sz = bitCategory(zz(k))
          val sym = (run << 4) | sz
          bw.write(AcLum.encCode(sym), AcLum.encLen(sym))
          bw.write(if (zz(k) < 0) zz(k) + (1 << sz) - 1 else zz(k), sz)
          run = 0
        }
        k += 1
      }
      if (run > 0) bw.write(AcLum.encCode(0x00), AcLum.encLen(0x00))
    }, () => ())
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Encode packed RGB24 as baseline YCbCr JPEG — 4:2:0 (2×2 luma per
    * MCU, box-averaged chroma) when `subsample`, else 4:4:4. Forward
    * color transform is the 16-bit fixed-point CCIR 601 form. */
  def encodeColor(w: Int, h: Int, rgb: Array[Byte], subsample: Boolean,
      qLum: Array[Int] = FlatQuant, qChr: Array[Int] = FlatQuant): Array[Byte] = {
    require(w > 0 && h > 0, s"need positive dimensions, got ${w}x$h")
    require(rgb.length == w * h * 3,
      s"need ${w * h * 3} bytes, got ${rgb.length}")
    Seq(qLum, qChr).foreach(q =>
      require(q.length == 64 && q.forall(x => x >= 1 && x <= 255),
        "quant: 64 entries in 1..255"))
    val yP = new Array[Int](w * h)
    val cbP = new Array[Int](w * h)
    val crP = new Array[Int](w * h)
    var i = 0
    while (i < w * h) {
      val r = rgb(3 * i) & 0xff; val g = rgb(3 * i + 1) & 0xff
      val b = rgb(3 * i + 2) & 0xff
      yP(i) = ((19595 * r + 38470 * g + 7471 * b + 32768) >> 16)
      cbP(i) = ((-11059 * r - 21709 * g + 32768 * b + 8421375) >> 16)
      crP(i) = ((32768 * r - 27439 * g - 5329 * b + 8421375) >> 16)
      i += 1
    }
    val (cw, ch2, cb2, cr2) =
      if (!subsample) (w, h, cbP, crP)
      else {
        val cw = (w + 1) / 2; val ch = (h + 1) / 2
        val cb = new Array[Int](cw * ch); val cr = new Array[Int](cw * ch)
        var y = 0
        while (y < ch) {
          var x = 0
          while (x < cw) {
            val x0 = 2 * x; val y0 = 2 * y
            val x1 = math.min(x0 + 1, w - 1); val y1 = math.min(y0 + 1, h - 1)
            def avg(p: Array[Int]) =
              (p(y0 * w + x0) + p(y0 * w + x1) + p(y1 * w + x0) +
                p(y1 * w + x1) + 2) >> 2
            cb(y * cw + x) = avg(cbP); cr(y * cw + x) = avg(crP)
            x += 1
          }
          y += 1
        }
        (cw, ch, cb, cr)
      }
    val hs = if (subsample) 2 else 1
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8)
    segment(out, 0xdb, Array(0x00) ++ qLum)
    segment(out, 0xdb, Array(0x01) ++ qChr)
    segment(out, 0xc0,
      Array(8, (h >> 8) & 0xff, h & 0xff, (w >> 8) & 0xff, w & 0xff, 3,
        1, (hs << 4) | hs, 0, // Y
        2, 0x11, 1, // Cb
        3, 0x11, 1)) // Cr
    segment(out, 0xc4, dhtPayload(0, 0, StdDcLumCounts, StdDcLumSyms))
    segment(out, 0xc4, dhtPayload(1, 0, StdAcLumCounts, StdAcLumSyms))
    segment(out, 0xc4, dhtPayload(0, 1, StdDcChrCounts, StdDcChrSyms))
    segment(out, 0xc4, dhtPayload(1, 1, StdAcChrCounts, StdAcChrSyms))
    segment(out, 0xda, Array(3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))
    val bw = new BitWriter(out)
    val mcusX = (w + 8 * hs - 1) / (8 * hs)
    val mcusY = (h + 8 * hs - 1) / (8 * hs)
    var dcY = 0; var dcCb = 0; var dcCr = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        var bv = 0
        while (bv < hs) {
          var bh = 0
          while (bh < hs) {
            val zz = forwardBlock(
              extractBlock(yP, w, h, (mx * hs + bh) * 8, (my * hs + bv) * 8),
              qLum)
            dcY = writeBlock(bw, zz, dcY, DcLum, AcLum)
            bh += 1
          }
          bv += 1
        }
        dcCb = writeBlock(bw,
          forwardBlock(extractBlock(cb2, cw, ch2, mx * 8, my * 8), qChr),
          dcCb, DcChr, AcChr)
        dcCr = writeBlock(bw,
          forwardBlock(extractBlock(cr2, cw, ch2, mx * 8, my * 8), qChr),
          dcCr, DcChr, AcChr)
        mx += 1
      }
      my += 1
    }
    bw.flush()
    out.write(0xff); out.write(0xd9)
    out.toByteArray
  }
}
