package graft.multimodal

import graft.SparkTestBase
import graft.multimodal.MediaPipeline._

class MediaPipelineSpec extends SparkTestBase {
  implicit lazy val s: org.apache.spark.sql.SparkSession = spark

  private def media = {
    import s.implicits._
    Seq(
      MediaRow(1L, "image", Array.tabulate(256)(_.toByte), "png", 64, 64, 0L),
      MediaRow(2L, "video", Array.tabulate(512)(i => (i * 3).toByte), "mp4", 320, 240, 3500L),
      MediaRow(3L, "audio", Array.fill(100)(0x41.toByte), "wav", 0, 0, 2000L)
    ).toDS()
  }

  test("featurize computes deterministic byte-level features in batches") {
    val f = featurize(media, batchSize = 2).collect().sortBy(_.id)
    assert(f.map(_.id).toSeq === Seq(1L, 2L, 3L))
    assert(f(0).nBytes === 256)
    // uniform byte distribution → 4 bits of entropy over 16 buckets
    assert(math.abs(f(0).byteEntropy - 4.0) < 1e-9)
    // constant bytes → zero entropy, all mass in one bucket
    assert(f(2).byteEntropy === 0.0)
    assert(f(2).histogram(4) === 100)
    // determinism: same input, same hash
    val again = featurize(media, batchSize = 64).collect().sortBy(_.id)
    assert(f.map(_.contentHash).toSeq === again.map(_.contentHash).toSeq)
  }

  test("frame sampling respects duration and stride through the decoder seam") {
    val dec = new StubDecoder(frameStrideMs = 1000L)
    val frames = sampleFrames(media, dec, everyNth = 1).collect()
    // image 1 frame, video 3 frames (3500ms/1000), audio 2 frames
    assert(frames.count(_.id == 1L) === 1)
    assert(frames.count(_.id == 2L) === 3)
    assert(frames.count(_.id == 3L) === 2)
    val every2 = sampleFrames(media, dec, everyNth = 2).collect()
    assert(every2.count(_.id == 2L) === 2) // frames 0 and 2
  }

  test("resize pass rewrites dimensions via the decoder") {
    val dec = new StubDecoder()
    val resized = resizeAll(sampleFrames(media, dec, 1), dec, 32, 32).collect()
    assert(resized.forall(f => f.width === 32 && f.height === 32))
  }

  test("metadata projection prunes the binary column from the scan") {
    val df = media.toDF()
    val pruned = metadataOnly(df)
    assert(!pruned.columns.contains("bytes"))
    assert(pruned.count() === 3)
  }
}
