package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata.
  *
  * The Spark-side plumbing here is real and tested — schema, typed
  * Dataset encoders, per-partition batched processing (the JVM analogue
  * of `mapInPandas`: decode cost is amortized over a batch, one decoder
  * instance per partition), and partitioning controls. The DECODE STEP
  * ITSELF IS A STUB (`StubDecoder`): the container has no image/audio
  * codecs, so it produces a deterministic fake "frame" from the bytes.
  * Swapping in a real codec is a one-class change behind [[MediaDecoder]].
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

  /** STUB: deterministic fake decode — ??? in spirit. Produces one
    * "frame" per `frameStrideMs` of duration (min 1), whose pixels are a
    * deterministic slice of the input bytes. Real implementation would
    * call the codec here; everything around it (batching, partitioning,
    * schema) is production-shaped.
    */
  final class StubDecoder(frameStrideMs: Long = 1000L) extends MediaDecoder {
    def decode(row: MediaRow): Seq[DecodedFrame] = {
      val nFrames = math.max(1, (row.durationMs / frameStrideMs).toInt)
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

  /** Batched per-partition decode+featurize — the mapInPandas shape: the
    * decoder is constructed once per partition, rows stream through in
    * groups of `batchSize`, features come out columnar-friendly.
    */
  def featurize(media: Dataset[MediaRow], batchSize: Int = 64)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val hist = new Array[Long](16)
          r.bytes.foreach(b => hist((b & 0xff) >> 4) += 1)
          val n = math.max(1, r.bytes.length)
          val entropy = -hist.filter(_ > 0).map { c =>
            val p = c.toDouble / n; p * math.log(p) / math.log(2)
          }.sum
          MediaFeatures(r.id, r.kind, r.bytes.length, entropy, hist,
            java.security.MessageDigest.getInstance("MD5")
              .digest(r.bytes).map("%02x".format(_)).mkString)
        }
      }
    }
  }

  /** Decode + frame-sample (every nth frame) through the decoder seam. */
  def sampleFrames(media: Dataset[MediaRow], decoder: MediaDecoder,
      everyNth: Int)(implicit spark: SparkSession): Dataset[DecodedFrame] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap(r => decoder.decode(r).zipWithIndex.collect {
        case (f, i) if i % everyNth == 0 => f
      })
    }
  }

  /** Resize pass over decoded frames (stubbed compute, real plumbing). */
  def resizeAll(frames: Dataset[DecodedFrame], decoder: MediaDecoder,
      w: Int, h: Int)(implicit spark: SparkSession): Dataset[DecodedFrame] = {
    import spark.implicits._
    frames.mapPartitions(_.map(f => decoder.resize(f, w, h)))
  }

  /** Media tables should be range-partitioned by id (or bucketed) so a
    * decode pass never skews one executor with all the large blobs; the
    * metadata-only projection prunes the binary column entirely.
    */
  def metadataOnly(df: DataFrame): DataFrame =
    df.select(col("id"), col("kind"), col("format"),
      col("width"), col("height"), col("durationMs"))
}
