package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata.
  *
  * The Spark-side plumbing is real and tested — schema, typed Dataset
  * encoders, per-partition batched processing (the JVM analogue of
  * `mapInPandas`: decode cost is amortized over a batch, one decoder
  * instance per partition), and partitioning controls. Two decoders sit
  * behind the [[MediaDecoder]] seam: [[ImageDecoder]] is a REAL
  * byte-level parser for PPM P6 and uncompressed 24bpp BMP (the two
  * classic formats needing no codec library) with genuine
  * nearest-neighbor resize; [[StubDecoder]] stands in for codec-backed
  * formats (video/audio) this container cannot decode — swapping in a
  * real codec is a one-class change behind the same seam.
  */
object MediaPipeline {

  /** One media object: raw bytes + typed metadata (never decoded at rest —
    * Parquet stores the binary column as-is, so scans that don't touch
    * `bytes` never read it thanks to column pruning).
    */
  final case class MediaRow(
      id: Long,
      kind: String, // "image" | "audio" | "video"
      bytes: Array[Byte],
      format: String,
      width: Int,
      height: Int,
      durationMs: Long)

  /** A decoded frame/clip (fake payload under the stub decoder). */
  final case class DecodedFrame(
      id: Long,
      frameIndex: Int,
      width: Int,
      height: Int,
      pixels: Array[Byte])

  final case class MediaFeatures(
      id: Long,
      kind: String,
      nBytes: Int,
      byteEntropy: Double,
      histogram: Array[Long], // 16-bucket byte histogram
      contentHash: String)

  /** Decoder seam — the only piece that needs a real codec library. */
  trait MediaDecoder extends Serializable {
    def decode(row: MediaRow): Seq[DecodedFrame]
    def resize(frame: DecodedFrame, w: Int, h: Int): DecodedFrame
  }

  /** STUB: deterministic fake decode (a test seam, clearly marked —
    * no codec library ships in this environment). Produces one
    * "frame" per `frameStrideMs` of duration (min 1), whose pixels are a
    * deterministic slice of the input bytes. Real implementation would
    * call the codec here; everything around it (batching, partitioning,
    * schema) is production-shaped.
    */
  final class StubDecoder(frameStrideMs: Long = 1000L) extends MediaDecoder {
    /** Cap on frames per row: a lying durationMs must neither wrap the
      * Int (silently 1 frame) nor materialize billions of frames. */
    val MaxFrames = 100000
    def decode(row: MediaRow): Seq[DecodedFrame] = {
      val nFrames = math.max(1L,
        math.min(row.durationMs / frameStrideMs, MaxFrames.toLong)).toInt
      (0 until nFrames).map { i =>
        val start = (i * 7) % math.max(1, row.bytes.length)
        val pixels = row.bytes.slice(start, math.min(row.bytes.length, start + 64))
        DecodedFrame(row.id, i, row.width, row.height, pixels)
      }
    }
    def resize(f: DecodedFrame, w: Int, h: Int): DecodedFrame =
      f.copy(width = w, height = h,
        pixels = f.pixels.take(math.max(1, (w * h) / 64)))
  }

  /** REAL image decoder for the two classic uncompressed formats whose
    * byte layout is public and trivially parseable with zero external
    * codec libraries:
    *
    *   - PPM "P6" (netpbm): ASCII header `P6 <w> <h> <maxval>` with
    *     `#` comments, then w*h raw RGB24 triplets.
    *   - BMP (Windows DIB, uncompressed 24bpp): little-endian header,
    *     bottom-up rows padded to 4-byte boundaries.
    *
    * decode() yields one frame of packed RGB24 pixels (top-down row
    * order for both formats); resize() is genuine nearest-neighbor
    * resampling. Anything unrecognized yields no frames — a decode miss
    * behaves like the reference's path-miss rule, not an exception.
    */
  final class ImageDecoder extends MediaDecoder {

    def decode(row: MediaRow): Seq[DecodedFrame] = {
      val b = row.bytes
      val parsed =
        if (b.length >= 2 && b(0) == 'P' && b(1) == '6') decodePpm(b)
        else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') decodeBmp(b)
        else if (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' &&
          b(2) == 'N' && b(3) == 'G') decodePng(b)
        else if (b.length >= 4 && (b(0) & 0xff) == 0xff &&
          (b(1) & 0xff) == 0xd8) Jpeg.decode(b)
        else None
      parsed.toSeq.map { case (w, h, px) => DecodedFrame(row.id, 0, w, h, px) }
    }

    /** REAL baseline-PNG decode (the public spec, RFC 2083 / W3C
      * PNG): signature → chunk walk (IHDR, concatenated IDAT, IEND) →
      * zlib inflate (`java.util.zip.Inflater` — part of the JDK, not a
      * codec library) → per-row DEFILTER of all five spec filter types
      * (None/Sub/Up/Average/Paeth) → packed RGB24. Supported baseline
      * subset: bit depth 8, color types 0 (gray, replicated to RGB),
      * 2 (RGB), 6 (RGBA, alpha dropped), interlace 0; Adam7, palettes,
      * and 16-bit depths are a decode MISS (None), never an exception —
      * the same never-throw contract as the PPM/BMP/WAV/GVID parsers.
      */
    private def decodePng(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
      val Sig = Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)
      if (b.length < 8 + 25 || !java.util.Arrays.equals(
          java.util.Arrays.copyOfRange(b, 0, 8), Sig)) return None
      def u32(o: Int): Long = ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
      var i = 8
      var dims: Option[(Int, Int, Int)] = None // (w, h, channels)
      val idat = new java.io.ByteArrayOutputStream()
      var ended = false
      while (!ended && i + 8 <= b.length) {
        val len = u32(i)
        if (len < 0 || len > Int.MaxValue || i + 12 + len > b.length) return None
        val typ = new String(b, i + 4, 4, "US-ASCII")
        val payload = i + 8
        typ match {
          case "IHDR" =>
            if (len != 13 || dims.isDefined) return None
            val w = u32(payload); val h = u32(payload + 4)
            val depth = b(payload + 8) & 0xff
            val colorType = b(payload + 9) & 0xff
            val comp = b(payload + 10) & 0xff
            val filt = b(payload + 11) & 0xff
            val interlace = b(payload + 12) & 0xff
            val channels = colorType match {
              case 0 => 1; case 2 => 3; case 6 => 4; case _ => -1
            }
            // Long arithmetic: the inflated buffer is h*(1+w*ch) bytes
            // and must fit an Int even at ch=4 (a lying IHDR is a miss)
            if (w <= 0 || h <= 0 || channels < 0 ||
              w * h * math.max(channels, 3) + h > Int.MaxValue ||
              depth != 8 || comp != 0 || filt != 0 ||
              interlace != 0) return None
            dims = Some((w.toInt, h.toInt, channels))
          case "IDAT" =>
            if (dims.isEmpty) return None
            idat.write(b, payload, len.toInt)
          case "IEND" => ended = true
          case _ => () // ancillary chunks (tEXt, gAMA, ...) skip
        }
        i = payload + len.toInt + 4 // + CRC
      }
      // a stream with no IEND chunk is truncated = miss, even if the
      // buffer happens to end exactly after the last IDAT
      if (!ended) return None
      for {
        (w, h, ch) <- dims
        raw <- inflateExact(idat.toByteArray, h * (1 + w * ch))
        rgb <- defilterToRgb(raw, w, h, ch)
      } yield (w, h, rgb)
    }

    /** Per-row DEFILTER of the five spec filter types over the inflated
      * scanlines, then normalization to packed RGB24 (gray replicated,
      * alpha dropped). An out-of-range filter byte is a decode miss. */
    private def defilterToRgb(raw: Array[Byte], w: Int, h: Int,
        ch: Int): Option[Array[Byte]] = {
      val stride = w * ch
      val out = new Array[Byte](h * stride)
      var y = 0
      while (y < h) {
        val ft = raw(y * (stride + 1)) & 0xff
        val src = y * (stride + 1) + 1
        val dst = y * stride
        if (ft > 4) return None
        var x = 0
        while (x < stride) {
          val rawv = raw(src + x) & 0xff
          val left = if (x >= ch) out(dst + x - ch) & 0xff else 0
          val up = if (y > 0) out(dst - stride + x) & 0xff else 0
          val ul = if (y > 0 && x >= ch) out(dst - stride + x - ch) & 0xff else 0
          val pred = ft match {
            case 0 => 0
            case 1 => left
            case 2 => up
            case 3 => (left + up) / 2
            case _ => // 4 = Paeth
              val p = left + up - ul
              val pa = math.abs(p - left); val pb = math.abs(p - up)
              val pc = math.abs(p - ul)
              if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
          }
          out(dst + x) = ((rawv + pred) & 0xff).toByte
          x += 1
        }
        y += 1
      }
      Some(ch match {
        case 3 => out
        case 1 =>
          val r = new Array[Byte](w * h * 3)
          var p = 0
          while (p < w * h) {
            r(3 * p) = out(p); r(3 * p + 1) = out(p); r(3 * p + 2) = out(p)
            p += 1
          }
          r
        case _ => // 4 = RGBA
          val r = new Array[Byte](w * h * 3)
          var p = 0
          while (p < w * h) {
            r(3 * p) = out(4 * p); r(3 * p + 1) = out(4 * p + 1)
            r(3 * p + 2) = out(4 * p + 2)
            p += 1
          }
          r
      })
    }

    /** zlib-inflate to EXACTLY `n` bytes — fewer (truncated stream),
      * more (lying IHDR), or malformed deflate data are all a decode
      * miss, not an exception. Acceptance requires `Inflater.finished()`
      * so the final-block bit AND the Adler32 trailer are both verified;
      * a stream truncated exactly at the n-byte payload boundary (no
      * trailer) is a miss, not a success. */
    private def inflateExact(z: Array[Byte], n: Int): Option[Array[Byte]] = {
      if (n <= 0) return None
      val inf = new java.util.zip.Inflater()
      try {
        inf.setInput(z)
        val out = new Array[Byte](n)
        var got = 0
        while (got < n && !inf.finished()) {
          val k = inf.inflate(out, got, n - got)
          // no progress = truncated input OR an FDICT preset-dictionary
          // stream (needsDictionary: inflate returns 0 forever without
          // this bail — never-throw must not become never-return)
          if (k == 0 && (inf.needsInput() || inf.needsDictionary()))
            return None
          got += k
        }
        if (got < n) return None
        // all n payload bytes produced; drive the inflater through the
        // final-block end + Adler32 trailer. Extra real output (lying
        // IHDR) returns >0; a missing/short trailer leaves finished()
        // false; a wrong Adler32 throws DataFormatException.
        if (!inf.finished() && inf.inflate(new Array[Byte](1)) > 0) return None
        if (inf.finished()) Some(out) else None
      } catch {
        case _: java.util.zip.DataFormatException => None
      } finally inf.end()
    }

    private def decodePpm(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
      var i = 2
      def skipWs(): Unit = {
        var go = true
        while (go && i < b.length) {
          if (b(i) == '#') { while (i < b.length && b(i) != '\n') i += 1 }
          else if (b(i).toChar.isWhitespace) i += 1
          else go = false
        }
      }
      // bounded digit run (never-throw contract: an absurd header is a
      // decode miss, not a NumberFormatException mid-task)
      def int(): Option[Int] = {
        skipWs()
        val st = i
        while (i < b.length && b(i) >= '0' && b(i) <= '9') i += 1
        if (i == st || i - st > 8) None
        else Some(new String(b, st, i - st).toInt)
      }
      for {
        w <- int(); h <- int(); maxv <- int()
        if maxv == 255 && w > 0 && h > 0 && i < b.length
        // exactly one whitespace byte separates the header from the
        // raster; anything else is a malformed header = decode miss (a
        // bare skip here would return pixels shifted by one byte)
        if b(i).toChar.isWhitespace
        _ = { i += 1 }
        // Long arithmetic: a lying header must not overflow the guard
        if b.length.toLong - i >= w.toLong * h * 3
      } yield (w, h, java.util.Arrays.copyOfRange(b, i, i + w * h * 3))
    }

    private def decodeBmp(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
      def u16(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      def i32(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
      if (b.length < 54) return None
      val dataOff = i32(10)
      val w = i32(18)
      val hRaw = i32(22)
      val bottomUp = hRaw > 0
      // abs(Int.MinValue) is negative — a lying header, not a crash
      val h = if (hRaw == Int.MinValue) -1 else math.abs(hRaw)
      val bpp = u16(28)
      val compression = i32(30)
      if (w <= 0 || h <= 0 || bpp != 24 || compression != 0) return None
      // Long arithmetic end-to-end: header-claimed dimensions must not
      // overflow the guards (never-throw decode-miss contract)
      val rowSize = ((w.toLong * 3) + 3) / 4 * 4 // rows pad to 4-byte boundaries
      if (dataOff < 0 || b.length.toLong - dataOff < rowSize * h) return None
      if (w.toLong * h * 3 > Int.MaxValue) return None
      val out = new Array[Byte](w * h * 3)
      val rowSizeI = rowSize.toInt // fits: rowSize * h <= b.length above
      var y = 0
      while (y < h) {
        val srcRow = dataOff + (if (bottomUp) (h - 1 - y) else y) * rowSizeI
        var x = 0
        while (x < w) {
          val s = srcRow + x * 3
          val d = (y * w + x) * 3
          out(d) = b(s + 2) // BMP stores BGR; emit RGB
          out(d + 1) = b(s + 1)
          out(d + 2) = b(s)
          x += 1
        }
        y += 1
      }
      Some((w, h, out))
    }

    /** Nearest-neighbor resample of packed RGB24. */
    def resize(f: DecodedFrame, w: Int, h: Int): DecodedFrame = {
      require(w > 0 && h > 0, "resize target must be positive")
      require(w.toLong * h * 3 <= Int.MaxValue,
        s"resize target ${w}x$h overflows a byte array")
      // decoders are swappable behind one seam — a frame from a decoder
      // that doesn't maintain the packed-RGB24 invariant (e.g. the stub)
      // must fail with this message, not an index crash mid-loop
      require(f.pixels.length == f.width.toLong * f.height * 3,
        s"frame ${f.id}/${f.frameIndex} claims ${f.width}x${f.height} but " +
          s"carries ${f.pixels.length} bytes (needs packed RGB24)")
      val out = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        val sy = (y.toLong * f.height / h).toInt
        var x = 0
        while (x < w) {
          val sx = (x.toLong * f.width / w).toInt
          val s = (sy * f.width + sx) * 3
          val d = (y * w + x) * 3
          out(d) = f.pixels(s); out(d + 1) = f.pixels(s + 1); out(d + 2) = f.pixels(s + 2)
          x += 1
        }
        y += 1
      }
      f.copy(width = w, height = h, pixels = out)
    }
  }

  /** Decoded PCM audio: 16-bit samples widened to Int, interleaved by
    * channel (frame f, channel c at index f*channels + c). */
  final case class AudioClip(
      id: Long, sampleRate: Int, channels: Int, samples: Array[Int])

  /** Per-clip features from a real decode — all integer-exact so an SQL
    * oracle can recompute them from the source bytes. */
  final case class AudioFeatures(
      id: Long, sampleRate: Int, channels: Int, nSamples: Int,
      durationMs: Long, peakAbs: Int, sumSamples: Long)

  /** REAL audio decoder for RIFF/WAVE 16-bit PCM — the one audio format
    * whose byte layout needs no codec library (the analogue of
    * [[ImageDecoder]]'s PPM/BMP): `RIFF<size>WAVE`, then a chunk walk to
    * `fmt ` (format tag 1 = PCM, 16 bits/sample) and `data` (little-
    * endian int16 frames). Same never-throw contract: anything
    * unrecognized, compressed, or with a lying size field is a decode
    * MISS (None), not an exception mid-task. Codec-backed audio
    * (mp3/aac/opus) stays behind [[StubDecoder]].
    */
  def decodeWav(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    def u16(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def u32(o: Int): Long = (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    def tag(o: Int) = new String(b, o, 4, "US-ASCII")
    if (b.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var i = 12
    var fmt: Option[(Int, Int)] = None // (channels, sampleRate)
    // fmt must precede data (the spec's ordering); a data chunk seen
    // first is malformed = miss
    while (i + 8 <= b.length) {
      val id = tag(i)
      val size = u32(i + 4)
      val payload = i + 8
      if (size < 0 || payload + size > b.length) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          val audioFormat = u16(payload)
          val channels = u16(payload + 2)
          val rate = u32(payload + 4)
          val bits = u16(payload + 14)
          if (audioFormat != 1 || bits != 16 || channels == 0 ||
            rate <= 0 || rate > Int.MaxValue) return None
          fmt = Some((channels, rate.toInt))
        case "data" =>
          return fmt.map { case (channels, rate) =>
            val n = (size / 2).toInt
            val out = new Array[Int](n)
            var j = 0
            while (j < n) {
              out(j) = ((b(payload + 2 * j) & 0xff) |
                (b(payload + 2 * j + 1) << 8)) // sign-extends via Byte
              j += 1
            }
            (channels, rate, out)
          }
        case _ => () // LIST/INFO/etc: skip
      }
      i = payload + size.toInt + (size.toInt & 1) // chunks pad to even
    }
    None
  }

  /** Encode 16-bit PCM as RIFF/WAVE bytes (the inverse of
    * [[decodeWav]] — tests and synthetic-clip construction). */
  def encodeWav(sampleRate: Int, channels: Int, samples: Array[Int]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0,
      s"need positive rate/channels, got $sampleRate/$channels")
    require(samples.length % channels == 0,
      s"${samples.length} samples do not tile $channels channels")
    require(samples.forall(s => s >= Short.MinValue && s <= Short.MaxValue),
      "samples must fit 16-bit PCM")
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort)
      .putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => buf.putShort(s.toShort))
    buf.array()
  }

  /** Batched per-partition WAV decode + feature extraction (the audio
    * analogue of [[featurize]]): a decode miss drops the row — the
    * path-miss rule, never an exception. Integer-exact features so the
    * oracle recomputes them from the source bytes. */
  def audioFeatures(media: Dataset[MediaRow])(
      implicit spark: SparkSession): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeWav(r.bytes).map { case (channels, rate, samples) =>
          var peak = 0
          var sum = 0L
          samples.foreach { s =>
            val a = math.abs(s); if (a > peak) peak = a; sum += s
          }
          AudioFeatures(r.id, rate, channels, samples.length,
            samples.length.toLong / channels * 1000L / rate, peak, sum)
        }
      }
    }
  }

  /** Per-frame perceptual fingerprint for VIDEO near-dup: [[dHash]]'s
    * horizontal gradient bits plus the vertical ones — (w−1)·h + w·(h−1)
    * bits per frame (24 at 4×4), enough to make accidental collisions
    * rare while the gradient-sign robustness is kept. Two videos
    * sharing ≥ k distinct frame fingerprints are near-dup candidates
    * (re-encodes, trims, watermark overlays keep most frame gradients).
    * Emits (id, frameIndex, fingerprint); a flatMap where the decode
    * runs, no shuffle.
    */
  def frameFingerprints(frames: Dataset[DecodedFrame])(
      implicit spark: SparkSession): Dataset[(Long, Int, Long)] = {
    import spark.implicits._
    frames.map { f =>
      val w = f.width
      val hh = f.height
      // (w-1)*h + w*(h-1) bits must fit one Long; past 64 the shift
      // below wraps mod 64 and bits silently collide — fail loud instead
      require((w - 1) * hh + w * (hh - 1) <= 64,
        s"frame ${w}x$hh needs ${(w - 1) * hh + w * (hh - 1)} gradient " +
          "bits > 64; resize frames (<= 6x6 = 60 bits) before fingerprinting")
      val g = new Array[Int](w * hh)
      var p = 0
      while (p < g.length) {
        g(p) = ((f.pixels(3 * p) & 0xff) + (f.pixels(3 * p + 1) & 0xff) +
          (f.pixels(3 * p + 2) & 0xff)) / 3
        p += 1
      }
      var fp = 0L
      var r = 0
      while (r < hh) {
        var c = 0
        while (c < w - 1) {
          if (g(r * w + c) > g(r * w + c + 1)) fp |= 1L << (r * (w - 1) + c)
          c += 1
        }
        r += 1
      }
      val off = (w - 1) * hh
      var c = 0
      while (c < w) {
        var r2 = 0
        while (r2 < hh - 1) {
          if (g(r2 * w + c) > g((r2 + 1) * w + c))
            fp |= 1L << (off + c * (hh - 1) + r2)
          r2 += 1
        }
        c += 1
      }
      (f.id, f.frameIndex, fp)
    }
  }

  /** Audio energy-gradient fingerprint — the waveform counterpart of
    * [[dHash]]: the clip splits into `bands` equal windows (integer
    * bounds w·n DIV bands, so any engine draws the same edges), window
    * energy = Σ|sample| (exact integers), and the fingerprint packs one
    * gradient-sign bit per adjacent window pair. The energy ENVELOPE
    * shape survives re-encoding and level-preserving copies, so
    * duplicate clips collide where a byte hash would not; bands ≤ 64
    * keeps the fingerprint in (bands−1) bits of a long.
    *
    * Runs where the decode runs — a flatMap over the media rows, no
    * shuffle; grouping downstream shuffles only (id, 8-byte hash).
    */
  def audioFingerprint(media: Dataset[MediaRow], bands: Int)(
      implicit spark: SparkSession): Dataset[(Long, Long)] = {
    require(bands >= 2 && bands <= 64, s"bands must be in [2, 64], got $bands")
    import spark.implicits._
    media.mapPartitions(_.flatMap { r =>
      decodeWav(r.bytes).map { case (_, _, samples) =>
        val n = samples.length.toLong
        val e = Array.tabulate(bands) { w =>
          var s = 0L
          var i = (w * n / bands).toInt
          val end = ((w + 1) * n / bands).toInt
          while (i < end) { s += math.abs(samples(i)); i += 1 }
          s
        }
        var fp = 0L
        var w = 0
        while (w < bands - 1) {
          if (e(w) > e(w + 1)) fp |= 1L << w
          w += 1
        }
        (r.id, fp)
      }
    })
  }

  /** Encode packed RGB24 as PPM P6 bytes (the inverse of
    * [[ImageDecoder]]'s PPM path — handy for tests and for writing
    * decoded frames back out). */
  def encodePpm(w: Int, h: Int, pixels: Array[Byte]): Array[Byte] = {
    // positive dims first: (-1)*(-1)*3 == 3 would pass the length check
    // and emit a header the decoder rejects, silently breaking the
    // documented encode->decode inverse
    require(w > 0 && h > 0, s"need positive dimensions, got ${w}x$h")
    require(pixels.length == w.toLong * h * 3,
      s"need ${w.toLong * h * 3} bytes, got ${pixels.length}")
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    header ++ pixels
  }

  /** Encode packed RGB24 as a REAL baseline PNG (inverse of the
    * [[ImageDecoder]]'s PNG path): per-row filter of the requested spec
    * type (0 None / 1 Sub / 2 Up / 3 Average / 4 Paeth — the encoder
    * supports all five so tests can roundtrip each defilter branch),
    * zlib DEFLATE via `java.util.zip.Deflater` (the JDK, not a codec
    * library), CRC32-stamped IHDR/IDAT/IEND chunks. The compressed
    * byte stream is deflater-version-dependent; the decode→featurize
    * gates compare FEATURES of the reconstructed raster, which are
    * independent of how deflate chose its blocks. */
  def encodePng(w: Int, h: Int, pixels: Array[Byte],
      rowFilter: Int = 4): Array[Byte] = {
    require(w > 0 && h > 0, s"need positive dimensions, got ${w}x$h")
    require(pixels.length == w.toLong * h * 3,
      s"need ${w.toLong * h * 3} bytes, got ${pixels.length}")
    require(rowFilter >= 0 && rowFilter <= 4,
      s"filter type must be 0..4, got $rowFilter")
    val stride = w * 3
    val filtered = new Array[Byte](h * (stride + 1))
    var y = 0
    while (y < h) {
      filtered(y * (stride + 1)) = rowFilter.toByte
      var x = 0
      while (x < stride) {
        val cur = pixels(y * stride + x) & 0xff
        val left = if (x >= 3) pixels(y * stride + x - 3) & 0xff else 0
        val up = if (y > 0) pixels((y - 1) * stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= 3) pixels((y - 1) * stride + x - 3) & 0xff else 0
        val pred = rowFilter match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case _ =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
        }
        filtered(y * (stride + 1) + 1 + x) = ((cur - pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    val z = try {
      deflater.setInput(filtered)
      deflater.finish()
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      while (!deflater.finished()) buf.write(chunk, 0, deflater.deflate(chunk))
      buf.toByteArray
    } finally deflater.end()
    def chunkOf(typ: String, data: Array[Byte]): Array[Byte] = {
      val t = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(data)
      val out = java.nio.ByteBuffer.allocate(12 + data.length)
      out.putInt(data.length).put(t).put(data).putInt(crc.getValue.toInt)
      out.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type RGB
      .put(0.toByte).put(0.toByte).put(0.toByte) // comp/filter/interlace
      .array()
    Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte) ++
      chunkOf("IHDR", ihdr) ++ chunkOf("IDAT", z) ++
      chunkOf("IEND", Array.emptyByteArray)
  }

  /** Minimal uncompressed video container ("GVID") — the codec-free
    * analogue of PPM/WAV for moving pictures, so the video half of the
    * decoder seam is REAL byte-level parsing, not a stub. Layout
    * (big-endian):
    *
    *   "GVID" | u16 width | u16 height | u16 frameCount |
    *   frameCount x (width*height*3 raw RGB24, top-down)
    *
    * Same never-throw contract as the image/audio decoders: a malformed
    * header, lying frame count, or truncated raster is a decode MISS
    * (None), never an exception mid-task. Codec-backed containers
    * (mp4/h264/vp9) stay behind [[StubDecoder]].
    */
  def decodeGvid(b: Array[Byte]): Option[(Int, Int, Seq[Array[Byte]])] = {
    if (b.length < 10 || b(0) != 'G' || b(1) != 'V' || b(2) != 'I' || b(3) != 'D')
      return None
    def u16(i: Int): Int = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    val w = u16(4); val h = u16(6); val n = u16(8)
    if (w <= 0 || h <= 0 || n <= 0) return None
    val frameSize = w.toLong * h * 3 // u16 dims: fits long, may exceed data
    if (10L + frameSize * n > b.length) return None
    val fs = frameSize.toInt
    Some((w, h, (0 until n).map(i => b.slice(10 + i * fs, 10 + (i + 1) * fs))))
  }

  /** Encode RGB24 frames as a GVID container (inverse of [[decodeGvid]]). */
  def encodeGvid(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(w > 0 && h > 0, s"need positive dimensions, got ${w}x$h")
    require(frames.nonEmpty && frames.size <= 0xffff,
      s"need 1..65535 frames, got ${frames.size}")
    require(frames.forall(_.length == w.toLong * h * 3),
      s"every frame must carry ${w.toLong * h * 3} bytes of packed RGB24")
    val out = java.nio.ByteBuffer.allocate(10 + frames.size * w * h * 3)
    out.put("GVID".getBytes("US-ASCII"))
    out.putShort(w.toShort).putShort(h.toShort).putShort(frames.size.toShort)
    frames.foreach(out.put)
    out.array()
  }

  /** REAL video decoder over the GVID container: one [[DecodedFrame]]
    * per stored frame, in frame order — feed through [[sampleFrames]]
    * for strided sampling. Resize shares [[ImageDecoder]]'s genuine
    * nearest-neighbor resampler (a frame is a frame). */
  final class VideoDecoder extends MediaDecoder {
    private val images = new ImageDecoder
    def decode(row: MediaRow): Seq[DecodedFrame] =
      decodeGvid(row.bytes).toSeq.flatMap { case (w, h, frames) =>
        frames.zipWithIndex.map { case (px, i) =>
          DecodedFrame(row.id, i, w, h, px)
        }
      }
    def resize(f: DecodedFrame, w: Int, h: Int): DecodedFrame =
      images.resize(f, w, h)
  }

  /** Batched per-partition decode+featurize — the mapInPandas shape: the
    * decoder is constructed once per partition, rows stream through in
    * groups of `batchSize`, features come out columnar-friendly.
    */
  def featurize(media: Dataset[MediaRow], batchSize: Int = 64)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-PARTITION state hoisted once — this is what the batching
      // claim means: the digest (a provider lookup per getInstance) is
      // constructed here, not per row
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val hist = new Array[Long](16)
        r.bytes.foreach(b => hist((b & 0xff) >> 4) += 1)
        val n = math.max(1, r.bytes.length)
        val entropy = -hist.filter(_ > 0).map { c =>
          val p = c.toDouble / n; p * math.log(p) / math.log(2)
        }.sum
        md.reset()
        MediaFeatures(r.id, r.kind, r.bytes.length, entropy, hist,
          md.digest(r.bytes).map("%02x".format(_)).mkString)
      }
    }
  }

  /** Decode + frame-sample (every nth frame) through the decoder seam. */
  def sampleFrames(media: Dataset[MediaRow], decoder: MediaDecoder,
      everyNth: Int)(implicit spark: SparkSession): Dataset[DecodedFrame] = {
    require(everyNth >= 1, s"everyNth must be >= 1, got $everyNth")
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap(r => decoder.decode(r).zipWithIndex.collect {
        case (f, i) if i % everyNth == 0 => f
      })
    }
  }

  /** Area-average resample of packed RGB24 — what production
    * perceptual-hash pipelines use for downscale (OpenCV INTER_AREA /
    * PIL "box"): every target pixel is the truncated integer mean of
    * its source box, so high-frequency content is pooled instead of
    * point-sampled (nearest-neighbor aliases a dither pattern into
    * noise; the box mean is stable under it). Box edges are the floor
    * grid x·W/w — for integer ratios this is the exact pixel-area
    * mean; for non-divisible sizes boxes tile the image with ±1-pixel
    * width variation; for upscale the box degenerates to one source
    * pixel (= nearest). Channel sums stay in Int (box ≤ 2^26 pixels
    * · 255 < 2^34 — guarded in Long, summed per-channel in Long).
    * Pure integer arithmetic end to end, so an oracle can recompute
    * the raster exactly — cross-validated against Java2D's
    * SCALE_AREA_AVERAGING in ResizeAreaSpec. */
  def resizeArea(f: DecodedFrame, w: Int, h: Int): DecodedFrame = {
    require(w > 0 && h > 0, "resize target must be positive")
    require(w.toLong * h * 3 <= Int.MaxValue,
      s"resize target ${w}x$h overflows a byte array")
    require(f.pixels.length == f.width.toLong * f.height * 3,
      s"frame ${f.id}/${f.frameIndex} claims ${f.width}x${f.height} but " +
        s"carries ${f.pixels.length} bytes (needs packed RGB24)")
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val y0 = (y.toLong * f.height / h).toInt
      val y1 = math.max(y0 + 1, ((y + 1).toLong * f.height / h).toInt)
      var x = 0
      while (x < w) {
        val x0 = (x.toLong * f.width / w).toInt
        val x1 = math.max(x0 + 1, ((x + 1).toLong * f.width / w).toInt)
        var r = 0L; var g = 0L; var b = 0L
        var sy = y0
        while (sy < y1) {
          var sx = x0
          while (sx < x1) {
            val s = (sy * f.width + sx) * 3
            r += f.pixels(s) & 0xff
            g += f.pixels(s + 1) & 0xff
            b += f.pixels(s + 2) & 0xff
            sx += 1
          }
          sy += 1
        }
        val n = (y1 - y0).toLong * (x1 - x0)
        val d = (y * w + x) * 3
        out(d) = (r / n).toByte; out(d + 1) = (g / n).toByte
        out(d + 2) = (b / n).toByte
        x += 1
      }
      y += 1
    }
    f.copy(width = w, height = h, pixels = out)
  }

  /** Resize pass over decoded frames (stubbed compute, real plumbing). */
  def resizeAll(frames: Dataset[DecodedFrame], decoder: MediaDecoder,
      w: Int, h: Int)(implicit spark: SparkSession): Dataset[DecodedFrame] = {
    import spark.implicits._
    frames.mapPartitions(_.map(f => decoder.resize(f, w, h)))
  }

  /** Perceptual difference hash (dHash) over decoded RGB frames: the
    * image near-dup fingerprint — per row of the grayscale raster, one
    * bit per adjacent-column comparison (gray[c] > gray[c+1]), packed
    * into a long. A re-encode, brightness shift, or mild noise leaves
    * most gradient signs intact, so visually-identical images collide
    * where a byte hash would not; width×height ≤ 8×8 keeps the
    * fingerprint in (width−1)·height ≤ 56 bits.
    *
    * Runs where the decode ran — a map over the frame Dataset, no
    * shuffle; downstream grouping shuffles only (id, 8-byte hash).
    * Grayscale is the integer mean (r+g+b) DIV 3, so the fingerprint is
    * engine-exact for any decoder that reproduces the raster bytes.
    */
  def dHash(frames: Dataset[DecodedFrame])(
      implicit spark: SparkSession): Dataset[(Long, Long)] = {
    import spark.implicits._
    frames.map { f =>
      val w = f.width
      val g = new Array[Int](w * f.height)
      var p = 0
      while (p < g.length) {
        g(p) = ((f.pixels(3 * p) & 0xff) + (f.pixels(3 * p + 1) & 0xff) +
          (f.pixels(3 * p + 2) & 0xff)) / 3
        p += 1
      }
      var fp = 0L
      var r = 0
      while (r < f.height) {
        var c = 0
        while (c < w - 1) {
          if (g(r * w + c) > g(r * w + c + 1)) fp |= 1L << (r * (w - 1) + c)
          c += 1
        }
        r += 1
      }
      (f.id, fp)
    }
  }

  /** Media tables should be range-partitioned by id (or bucketed) so a
    * decode pass never skews one executor with all the large blobs; the
    * metadata-only projection prunes the binary column entirely.
    */
  def metadataOnly(df: DataFrame): DataFrame =
    df.select(col("id"), col("kind"), col("format"),
      col("width"), col("height"), col("durationMs"))
}
