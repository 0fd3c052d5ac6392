package graft.multimodal

import java.awt.Image
import java.awt.image.BufferedImage

import graft.SparkTestBase
import graft.multimodal.MediaPipeline._

/** Area-average resize: exact integer semantics (box mean, floor grid)
  * and a cross-check against the JDK's independent area-averaging
  * scaler (java.awt.Image.SCALE_AREA_AVERAGING). */
class ResizeAreaSpec extends SparkTestBase {

  private def frame(w: Int, h: Int, px: Array[Byte]) =
    DecodedFrame(1L, 0, w, h, px)

  /** Deterministic RGB test raster: distinct per channel, full range. */
  private def raster(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h * 3) { i =>
      val p = i / 3
      (i % 3 match {
        case 0 => (p * 7) % 256
        case 1 => (p % w) * 255 / math.max(1, w - 1)
        case _ => 255 - (p / w) * 255 / math.max(1, h - 1)
      }).toByte
    }

  /** Scale through Java2D's AreaAveragingScaleFilter and read back the
    * raw samples (never getRGB on gray — colorspace transforms). */
  private def javaAreaScale(w: Int, h: Int, px: Array[Byte],
      tw: Int, th: Int): Array[Int] = {
    val src = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      src.setRGB(x, y, ((px(o) & 0xff) << 16) | ((px(o + 1) & 0xff) << 8) |
        (px(o + 2) & 0xff))
    }
    val scaled = src.getScaledInstance(tw, th, Image.SCALE_AREA_AVERAGING)
    val dst = new BufferedImage(tw, th, BufferedImage.TYPE_INT_RGB)
    val g2 = dst.createGraphics()
    g2.drawImage(scaled, 0, 0, null)
    g2.dispose()
    val out = new Array[Int](tw * th * 3)
    for (y <- 0 until th; x <- 0 until tw) {
      val rgb = dst.getRGB(x, y)
      val o = (y * tw + x) * 3
      out(o) = (rgb >> 16) & 0xff; out(o + 1) = (rgb >> 8) & 0xff
      out(o + 2) = rgb & 0xff
    }
    out
  }

  test("integer-ratio downscale is the exact truncated box mean") {
    // 4x2 -> 2x1: each output pixel averages a 2x2 box, per channel
    val px = Array[Byte](
      10, 0, 0, 20, 0, 0, 100, 4, 0, 104, 5, 0,
      30, 0, 8, 41, 0, 9, 108, 6, 0, 113, 7, 0)
    val out = resizeArea(frame(4, 2, px), 2, 1)
    assert(out.width === 2 && out.height === 1)
    // r = (10+20+30+41)/4 = 25 (truncated), g = 0, b = (0+0+8+9)/4 = 4
    assert((out.pixels(0) & 0xff) === 25)
    assert((out.pixels(1) & 0xff) === 0)
    assert((out.pixels(2) & 0xff) === 4)
    // r = (100+104+108+113)/4 = 106 (106.25 truncates)
    assert((out.pixels(3) & 0xff) === 106)
    assert((out.pixels(4) & 0xff) === 5)
    assert((out.pixels(5) & 0xff) === 0)
  }

  test("constant image stays constant at any target size") {
    val px = Array.fill(12 * 9 * 3)(77.toByte)
    for ((tw, th) <- Seq((4, 3), (5, 5), (12, 9), (1, 1))) {
      val out = resizeArea(frame(12, 9, px), tw, th)
      assert(out.pixels.forall(b => (b & 0xff) == 77), s"at ${tw}x$th")
    }
  }

  test("non-divisible boxes tile the image; output within source range") {
    val px = raster(10, 7)
    val out = resizeArea(frame(10, 7, px), 3, 3)
    assert(out.pixels.length === 3 * 3 * 3)
    for (ch <- 0 until 3) {
      val src = px.indices.filter(_ % 3 == ch).map(px(_) & 0xff)
      val dst = out.pixels.indices.filter(_ % 3 == ch).map(out.pixels(_) & 0xff)
      assert(dst.min >= src.min && dst.max <= src.max)
    }
  }

  test("upscale degenerates to nearest-neighbor") {
    val px = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)
    val out = resizeArea(frame(2, 2, px), 4, 4)
    val nn = (new ImageDecoder).resize(frame(2, 2, px), 4, 4)
    assert(out.pixels.toSeq === nn.pixels.toSeq)
  }

  test("matches Java2D SCALE_AREA_AVERAGING within 1 LSB at integer ratios") {
    for ((w, h, tw, th) <- Seq((64, 64, 8, 8), (48, 32, 8, 8), (32, 32, 4, 4))) {
      val px = raster(w, h)
      val ours = resizeArea(frame(w, h, px), tw, th)
      val theirs = javaAreaScale(w, h, px, tw, th)
      var maxDiff = 0
      for (i <- theirs.indices)
        maxDiff = math.max(maxDiff, math.abs((ours.pixels(i) & 0xff) - theirs(i)))
      assert(maxDiff <= 1,
        s"${w}x$h -> ${tw}x$th diverges from Java2D by $maxDiff")
    }
  }

  test("rejects frames whose byte count lies about the dimensions") {
    val bad = DecodedFrame(1L, 0, 8, 8, new Array[Byte](11))
    val e = intercept[IllegalArgumentException](resizeArea(bad, 4, 4))
    assert(e.getMessage.contains("packed RGB24"))
  }
}
