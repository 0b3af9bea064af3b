package graft.ops

import graft.core.ImagePlane

/** F-family scalar image functions (SURVEY.md §2.9): the contrast-
  * adjustment chain of utils/widget_utils.py:93-263 and the channel
  * utilities of utils/data_utils.py:81-177. All pure functions on one
  * plane's primitive arrays — per-row `map`s, never a shuffle.
  *
  * Numerics follow the reference's *pipeline order* (blur -> sobel ->
  * gamma -> invert -> equalize -> rescale -> window); kernel internals
  * are standard implementations. `clahe` is a real tiled CLAHE
  * (Zuiderveld: per-tile clipped histograms + bilinear LUT
  * interpolation); remaining documented divergence vs skimage is
  * float handling inside the contrast chain, which feeds human
  * viewing, not training labels (widget_utils.py:195).
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

  /** CLAHE — contrast-limited adaptive histogram equalization
    * (widget_utils.py:141-151's `equalize_adapthist`): per-tile
    * 256-bin histograms, clipped at `clipLimit * tilePixels` with the
    * excess redistributed uniformly, per-tile CDF mappings, and
    * bilinear interpolation of the 4 surrounding tile mappings per
    * pixel (the standard Zuiderveld '94 construction; numerics are
    * ours, not skimage's — the chain feeds human viewing, not labels).
    * Input expected in [0, 255].
    */
  def clahe(img: Array[Float], rows: Int, cols: Int,
            tilesR: Int = 8, tilesC: Int = 8, clipLimit: Double = 0.01): Array[Float] = {
    val bins = 256
    val tR = math.max(1, math.min(tilesR, rows))
    val tC = math.max(1, math.min(tilesC, cols))
    // tile boundaries
    val rEdges = Array.tabulate(tR + 1)(i => i * rows / tR)
    val cEdges = Array.tabulate(tC + 1)(i => i * cols / tC)
    // per-tile clipped CDF mapping: bin -> [0,255]
    val mapping = Array.ofDim[Float](tR, tC, bins)
    var ti = 0
    while (ti < tR) {
      var tj = 0
      while (tj < tC) {
        val hist = new Array[Long](bins)
        var r = rEdges(ti)
        var nPix = 0L
        while (r < rEdges(ti + 1)) {
          var c = cEdges(tj)
          while (c < cEdges(tj + 1)) {
            val b = math.min(math.max(img(r * cols + c).toInt, 0), bins - 1)
            hist(b) += 1
            nPix += 1
            c += 1
          }
          r += 1
        }
        // clip + uniform redistribution
        val limit = math.max(1L, (clipLimit * nPix).toLong)
        var excess = 0L
        var b = 0
        while (b < bins) {
          if (hist(b) > limit) { excess += hist(b) - limit; hist(b) = limit }
          b += 1
        }
        val add = excess / bins
        b = 0
        while (b < bins) { hist(b) += add; b += 1 }
        // cdf -> mapping
        var acc = 0L
        val total = nPix max 1L
        b = 0
        while (b < bins) {
          acc += hist(b)
          mapping(ti)(tj)(b) = (acc.toDouble / total * 255.0).toFloat
          b += 1
        }
        tj += 1
      }
      ti += 1
    }
    // bilinear interpolation between tile centers
    val out = new Array[Float](img.length)
    val centersR = Array.tabulate(tR)(i => (rEdges(i) + rEdges(i + 1) - 1) / 2.0)
    val centersC = Array.tabulate(tC)(j => (cEdges(j) + cEdges(j + 1) - 1) / 2.0)
    var r = 0
    while (r < rows) {
      // surrounding tile rows
      var i1 = 0
      while (i1 < tR - 1 && centersR(i1 + 1) < r) i1 += 1
      val i2 = if (r <= centersR(i1) || i1 == tR - 1) i1 else i1 + 1
      val fr = if (i1 == i2) 0.0
        else math.min(math.max((r - centersR(i1)) / (centersR(i2) - centersR(i1)), 0.0), 1.0)
      var c = 0
      while (c < cols) {
        var j1 = 0
        while (j1 < tC - 1 && centersC(j1 + 1) < c) j1 += 1
        val j2 = if (c <= centersC(j1) || j1 == tC - 1) j1 else j1 + 1
        val fc = if (j1 == j2) 0.0
          else math.min(math.max((c - centersC(j1)) / (centersC(j2) - centersC(j1)), 0.0), 1.0)
        val b = math.min(math.max(img(r * cols + c).toInt, 0), bins - 1)
        val v =
          mapping(i1)(j1)(b) * (1 - fr) * (1 - fc) +
          mapping(i1)(j2)(b) * (1 - fr) * fc +
          mapping(i2)(j1)(b) * fr * (1 - fc) +
          mapping(i2)(j2)(b) * fr * fc
        out(r * cols + c) = v.toFloat
        c += 1
      }
      r += 1
    }
    out
  }

  /** Window to [vMin, vMax] (the widget's display clamp). */
  def window(img: Array[Float], vMin: Float, vMax: Float): Array[Float] =
    img.map(v => math.min(math.max(v, vMin), vMax))

  /** F1 `adjust_image` (widget_utils.py:93-199): the full chain —
    * blur -> sobel-add -> rescale -> gamma -> invert -> equalize ->
    * CLAHE -> window, each stage optional as in the reference.
    */
  def adjustImage(img: Array[Float], rows: Int, cols: Int,
                  blurSigma: Double = 0.0, sobelFactor: Double = 0.0,
                  gamma: Double = 1.0, doInvert: Boolean = false,
                  doEqualize: Boolean = false, doClahe: Boolean = false,
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
    if (doClahe) x = clahe(x, rows, cols)
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
