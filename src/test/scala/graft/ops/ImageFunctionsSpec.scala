package graft.ops

import graft.SparkSpec
import graft.core.ImagePlane

class ImageFunctionsSpec extends SparkSpec {

  test("gaussian blur preserves mean, reduces variance") {
    val rng = new scala.util.Random(1)
    val img = Array.fill(400)(rng.nextFloat() * 255)
    val out = ImageFunctions.gaussianBlur(img, 20, 20, 1.5)
    def stats(a: Array[Float]) = {
      val m = a.map(_.toDouble).sum / a.length
      (m, a.map(v => (v - m) * (v - m)).sum / a.length)
    }
    val (m1, v1) = stats(img)
    val (m2, v2) = stats(out)
    assert(math.abs(m1 - m2) < 2.0, "mean roughly preserved (edge clamp)")
    assert(v2 < v1 * 0.8, "variance reduced")
  }

  test("sobel responds to edges, zero on flat images") {
    val flat = Array.fill(400)(7f)
    assert(ImageFunctions.sobel(flat, 20, 20).forall(_ == 0f))
    val edge = Array.tabulate(400)(i => if (i % 20 < 10) 0f else 255f)
    val resp = ImageFunctions.sobel(edge, 20, 20)
    assert(resp.exists(_ > 0f))
  }

  test("rescale + gamma + invert + window behave on known values") {
    val img = Array(0f, 50f, 100f)
    val scaled = ImageFunctions.rescaleToByteRange(img)
    assert(scaled.toSeq == Seq(0f, 127.5f, 255f))
    assert(ImageFunctions.gammaAdjust(Array(255f), 2.0).head == 255f)
    assert(ImageFunctions.invert(Array(0f, 255f)).toSeq == Seq(255f, 0f))
    assert(ImageFunctions.window(Array(-5f, 300f, 42f), 0f, 255f).toSeq == Seq(0f, 255f, 42f))
  }

  test("equalizeHist maps the max bin to 255 and is monotone") {
    val rng = new scala.util.Random(2)
    val img = ImageFunctions.rescaleToByteRange(Array.fill(1000)(rng.nextFloat()))
    val out = ImageFunctions.equalizeHist(img)
    assert(out.max <= 255f && out.min >= 0f)
    val pairs = img.zip(out).sortBy(_._1)
    assert(pairs.sliding(2).forall { case Array((_, o1), (_, o2)) => o1 <= o2 })
  }

  test("overlay blends proportionally") {
    val out = ImageFunctions.overlay(Array(100f), Array(200f), 0.25f)
    assert(math.abs(out.head - 175f) < 1e-4)
  }

  test("blankChannel: zeros or one seeded noise px per block") {
    assert(ImageFunctions.blankChannel(50, 50).forall(_ == 0f))
    val noisy = ImageFunctions.blankChannel(200, 200, sparseNoise = true, seed = 5)
    val nonzero = noisy.count(_ != 0f)
    assert(nonzero == 4, s"one px per 100x100 block, got $nonzero")
    assert(noisy.filter(_ != 0).forall(v => v >= 1f && v <= 14f))
    val again = ImageFunctions.blankChannel(200, 200, sparseNoise = true, seed = 5)
    assert(noisy.toSeq == again.toSeq, "seed-stable")
  }

  test("reorderChannels projects by name and synthesizes blanks") {
    val p = ImagePlane.blankPlanes(1, 1, 4, 4, Seq("dapi", "cd45")).head
      .copy(pixels = Array.tabulate(32)(i => if (i < 16) 1f else 2f))
    val out = ImageFunctions.reorderChannels(p, Seq("cd45", "dapi", "missing"))
    assert(out.channels == Seq("cd45", "dapi", "missing"))
    assert(out.pixels.slice(0, 16).forall(_ == 2f))
    assert(out.pixels.slice(16, 32).forall(_ == 1f))
    assert(out.pixels.slice(32, 48).forall(_ == 0f))
    intercept[IllegalArgumentException](
      ImageFunctions.reorderChannels(p, Seq("dapi", "dapi")))
  }
}
