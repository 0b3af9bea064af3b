package graft.ops

import graft.core.ImagePlane

/** F-family scalar image functions (SURVEY.md §2.9): the contrast-
  * adjustment chain of utils/widget_utils.py:93-263 and the channel
  * utilities of utils/data_utils.py:81-177. All pure functions on one
  * plane's primitive arrays — per-row `map`s, never a shuffle.
  *
  * Numerics follow the reference's *pipeline order* (blur -> sobel ->
  * gamma -> invert -> equalize -> rescale -> window); kernel internals
  * are standard implementations (documented divergence: skimage's
  * CLAHE is approximated by global histogram equalization — these
  * feed human viewing, not training labels, widget_utils.py:195).
  */
object ImageFunctions {

  /** Separable gaussian blur, sigma in pixels; kernel radius 3*sigma. */
  def gaussianBlur(img: Array[Float], rows: Int, cols: Int, sigma: Double): Array[Float] = {
    if (sigma <= 0) return img.clone()
    val radius = math.max(1, math.ceil(3 * sigma).toInt)
    val kernel = Array.tabulate(2 * radius + 1) { i =>
      val x = i - radius
      math.exp(-x * x / (2 * sigma * sigma))
    }
    val ksum = kernel.sum
    var i = 0
    while (i < kernel.length) { kernel(i) /= ksum; i += 1 }
    val tmp = new Array[Float](img.length)
    val out = new Array[Float](img.length)
    // horizontal
    var r = 0
    while (r < rows) {
      var c = 0
      while (c < cols) {
        var acc = 0.0
        var k = -radius
        while (k <= radius) {
          val cc = math.min(math.max(c + k, 0), cols - 1) // edge clamp
          acc += img(r * cols + cc) * kernel(k + radius)
          k += 1
        }
        tmp(r * cols + c) = acc.toFloat
        c += 1
      }
      r += 1
    }
    // vertical
    r = 0
    while (r < rows) {
      var c = 0
      while (c < cols) {
        var acc = 0.0
        var k = -radius
        while (k <= radius) {
          val rr = math.min(math.max(r + k, 0), rows - 1)
          acc += tmp(rr * cols + c) * kernel(k + radius)
          k += 1
        }
        out(r * cols + c) = acc.toFloat
        c += 1
      }
      r += 1
    }
    out
  }

  /** Sobel gradient magnitude. */
  def sobel(img: Array[Float], rows: Int, cols: Int): Array[Float] = {
    val out = new Array[Float](img.length)
    def at(r: Int, c: Int): Float =
      img(math.min(math.max(r, 0), rows - 1) * cols + math.min(math.max(c, 0), cols - 1))
    var r = 0
    while (r < rows) {
      var c = 0
      while (c < cols) {
        val gx = (at(r - 1, c + 1) + 2 * at(r, c + 1) + at(r + 1, c + 1)) -
                 (at(r - 1, c - 1) + 2 * at(r, c - 1) + at(r + 1, c - 1))
        val gy = (at(r + 1, c - 1) + 2 * at(r + 1, c) + at(r + 1, c + 1)) -
                 (at(r - 1, c - 1) + 2 * at(r - 1, c) + at(r - 1, c + 1))
        out(r * cols + c) = math.sqrt(gx * gx + gy * gy).toFloat
        c += 1
      }
      r += 1
    }
    out
  }

  /** Rescale to [0, 255] (widget_utils' uint8 rescale). */
  def rescaleToByteRange(img: Array[Float]): Array[Float] = {
    var mn = Float.MaxValue
    var mx = Float.MinValue
    img.foreach { v => if (v < mn) mn = v; if (v > mx) mx = v }
    if (mx <= mn) return new Array[Float](img.length)
    img.map(v => (v - mn) / (mx - mn) * 255f)
  }

  /** Gamma adjust on a [0,255]-scaled image. */
  def gammaAdjust(img: Array[Float], gamma: Double): Array[Float] =
    img.map(v => (math.pow(v / 255.0, gamma) * 255.0).toFloat)

  def invert(img: Array[Float]): Array[Float] = img.map(v => 255f - v)

  /** Global histogram equalization over 256 bins on [0,255] input. */
  def equalizeHist(img: Array[Float]): Array[Float] = {
    val hist = new Array[Long](256)
    img.foreach { v =>
      val b = math.min(math.max(v.toInt, 0), 255)
      hist(b) += 1
    }
    val cdf = new Array[Double](256)
    var acc = 0L
    var i = 0
    while (i < 256) { acc += hist(i); cdf(i) = acc.toDouble / img.length; i += 1 }
    img.map { v =>
      val b = math.min(math.max(v.toInt, 0), 255)
      (cdf(b) * 255.0).toFloat
    }
  }

  /** Window to [vMin, vMax] (the widget's display clamp). */
  def window(img: Array[Float], vMin: Float, vMax: Float): Array[Float] =
    img.map(v => math.min(math.max(v, vMin), vMax))

  /** F1 `adjust_image` (widget_utils.py:93-199): the full chain. */
  def adjustImage(img: Array[Float], rows: Int, cols: Int,
                  blurSigma: Double = 0.0, sobelFactor: Double = 0.0,
                  gamma: Double = 1.0, doInvert: Boolean = false,
                  doEqualize: Boolean = false,
                  vMin: Float = 0f, vMax: Float = 255f): Array[Float] = {
    var x = gaussianBlur(img, rows, cols, blurSigma)
    if (sobelFactor != 0) {
      val s = sobel(x, rows, cols)
      var i = 0
      while (i < x.length) { x(i) = x(i) + (sobelFactor * s(i)).toFloat; i += 1 }
    }
    x = rescaleToByteRange(x)
    if (gamma != 1.0) x = gammaAdjust(x, gamma)
    if (doInvert) x = invert(x)
    if (doEqualize) x = equalizeHist(x)
    window(x, vMin, vMax)
  }

  /** F2 `overlay_images` (widget_utils.py:202-263): alpha blend. */
  def overlay(a: Array[Float], b: Array[Float], prop: Float): Array[Float] = {
    require(a.length == b.length, "overlay size mismatch")
    val out = new Array[Float](a.length)
    var i = 0
    while (i < a.length) { out(i) = prop * a(i) + (1 - prop) * b(i); i += 1 }
    out
  }

  /** F4 `create_blank_channel` (data_utils.py:81-109): zeros, or
    * seeded sparse noise (one random pixel per `blockSize`^2 block,
    * value 1..14) for annotator-bias prevention.
    */
  def blankChannel(rows: Int, cols: Int, sparseNoise: Boolean = false,
                   seed: Long = 0L, blockSize: Int = 100): Array[Float] = {
    val out = new Array[Float](rows * cols)
    if (sparseNoise) {
      val rng = new scala.util.Random(seed)
      var br = 0
      while (br < rows) {
        var bc = 0
        while (bc < cols) {
          val h = math.min(blockSize, rows - br)
          val w = math.min(blockSize, cols - bc)
          val r = br + rng.nextInt(h)
          val c = bc + rng.nextInt(w)
          out(r * cols + c) = (1 + rng.nextInt(14)).toFloat
          bc += blockSize
        }
        br += blockSize
      }
    }
    out
  }

  /** F5 `reorder_channels` (data_utils.py:112-158): project the
    * channel-major pixel block into a new channel order, synthesizing
    * blank channels for missing names; duplicate targets rejected.
    */
  def reorderChannels(p: ImagePlane, newOrder: Seq[String],
                      sparseNoiseForMissing: Boolean = false, seed: Long = 0L): ImagePlane = {
    require(newOrder.distinct.length == newOrder.length, "duplicate channel names")
    val planeSize = p.nRows * p.nCols
    val out = new Array[Float](newOrder.length * planeSize)
    newOrder.zipWithIndex.foreach { case (name, i) =>
      val src = p.channels.indexOf(name)
      if (src >= 0)
        System.arraycopy(p.pixels, src * planeSize, out, i * planeSize, planeSize)
      else if (sparseNoiseForMissing) {
        val blank = blankChannel(p.nRows, p.nCols, sparseNoise = true, seed = seed + i)
        System.arraycopy(blank, 0, out, i * planeSize, planeSize)
      }
    }
    p.copy(channels = newOrder, pixels = out)
  }

  /** F6 `make_blank_labels` (data_utils.py:161-177). */
  def blankLabels(p: ImagePlane): ImagePlane =
    p.copy(labels = new Array[Int](p.nRows * p.nCols))
}
