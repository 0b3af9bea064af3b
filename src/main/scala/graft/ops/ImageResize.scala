package graft.ops

import graft.core.ImagePlane
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** C10-C12 resize/pad/tile (build.py:101-176, dataset_builder.py:
  * 292-395) and A1 `compute_cell_size` (build.py:38-98).
  *
  * Resize policy follows the reference exactly: bilinear interpolation
  * for raw channels, nearest-neighbor for label masks — label ids must
  * never blend (SURVEY.md §7.4 point 2). Tiling reuses CropOps with a
  * stride ratio. All per-row narrow ops; the only aggregation is the
  * median cell size, computed with an exact distributed median.
  */
object ImageResize {

  /** Bilinear resample of one channel-major pixel array. */
  private[graft] def bilinear(src: Array[Float], rows: Int, cols: Int, nCh: Int,
                            outRows: Int, outCols: Int): Array[Float] = {
    val out = new Array[Float](nCh * outRows * outCols)
    val rScale = rows.toDouble / outRows
    val cScale = cols.toDouble / outCols
    var ch = 0
    while (ch < nCh) {
      var r = 0
      while (r < outRows) {
        // pixel-center mapping (skimage/AWT convention)
        val sr = math.min(math.max((r + 0.5) * rScale - 0.5, 0), rows - 1.0)
        val r0 = sr.toInt
        val r1 = math.min(r0 + 1, rows - 1)
        val fr = sr - r0
        var c = 0
        while (c < outCols) {
          val sc = math.min(math.max((c + 0.5) * cScale - 0.5, 0), cols - 1.0)
          val c0 = sc.toInt
          val c1 = math.min(c0 + 1, cols - 1)
          val fc = sc - c0
          val base = ch * rows * cols
          val v =
            src(base + r0 * cols + c0) * (1 - fr) * (1 - fc) +
            src(base + r0 * cols + c1) * (1 - fr) * fc +
            src(base + r1 * cols + c0) * fr * (1 - fc) +
            src(base + r1 * cols + c1) * fr * fc
          out(ch * outRows * outCols + r * outCols + c) = v.toFloat
          c += 1
        }
        r += 1
      }
      ch += 1
    }
    out
  }

  /** Nearest-neighbor resample of a label mask (ids preserved). */
  private[ops] def nearest(src: Array[Int], rows: Int, cols: Int,
                           outRows: Int, outCols: Int): Array[Int] = {
    val out = new Array[Int](outRows * outCols)
    val rScale = rows.toDouble / outRows
    val cScale = cols.toDouble / outCols
    var r = 0
    while (r < outRows) {
      val sr = math.min(math.max(math.round((r + 0.5) * rScale - 0.5).toInt, 0), rows - 1)
      var c = 0
      while (c < outCols) {
        val sc = math.min(math.max(math.round((c + 0.5) * cScale - 0.5).toInt, 0), cols - 1)
        out(r * outCols + c) = src(sr * cols + sc)
        c += 1
      }
      r += 1
    }
    out
  }

  /** C11 resize step: scale a plane by `ratio` (bilinear X, nearest y). */
  def resizePlane(p: ImagePlane, ratio: Double): ImagePlane = {
    val outRows = math.max(math.round(p.nRows * ratio).toInt, 1)
    val outCols = math.max(math.round(p.nCols * ratio).toInt, 1)
    p.copy(
      nRows = outRows, nCols = outCols,
      pixels = bilinear(p.pixels, p.nRows, p.nCols, p.channels.length, outRows, outCols),
      labels = nearest(p.labels, p.nRows, p.nCols, outRows, outCols))
  }

  /** C10 `pad_image_stack` (build.py:144-176): zero-pad rows/cols up
    * to multiples of the crop size.
    */
  def padPlane(p: ImagePlane, multipleRows: Int, multipleCols: Int): ImagePlane = {
    val outRows = math.ceil(p.nRows.toDouble / multipleRows).toInt * multipleRows
    val outCols = math.ceil(p.nCols.toDouble / multipleCols).toInt * multipleCols
    if (outRows == p.nRows && outCols == p.nCols) p
    else {
      val nCh = p.channels.length
      val pixels = new Array[Float](nCh * outRows * outCols)
      val labels = new Array[Int](outRows * outCols)
      var ch = 0
      while (ch < nCh) {
        var r = 0
        while (r < p.nRows) {
          System.arraycopy(p.pixels, ch * p.nRows * p.nCols + r * p.nCols,
            pixels, ch * outRows * outCols + r * outCols, p.nCols)
          if (ch == 0)
            System.arraycopy(p.labels, r * p.nCols, labels, r * outCols, p.nCols)
          r += 1
        }
        ch += 1
      }
      p.copy(nRows = outRows, nCols = outCols, pixels = pixels, labels = labels)
    }
  }

  /** A1 `compute_cell_size`: per-image cell areas -> median (or mean).
    * Returns a DataFrame (fov, stack, crop, slice, cell_size) when
    * byImage, or a single global value. Exact median via sort-rank
    * (same construction as the oracle-checked q_a1_median).
    */
  def cellSizes(ds: Dataset[ImagePlane]): DataFrame =
    // native label_areas expression + explode: area extraction stays a
    // narrow codegen'd projection — no typed-map stage, no shuffle
    ds.toDF()
      .select(col("fov"), col("stack"), col("crop"), col("slice"),
        explode(graft.functions.LabelExprs.labelAreasCol(col("labels"))))
      .withColumnRenamed("key", "cell_id")
      .withColumnRenamed("value", "area")

  def medianCellSize(ds: Dataset[ImagePlane]): Option[Double] = {
    val areas = cellSizes(ds).select(col("area").cast("double"))
    val n = areas.count()
    if (n == 0) None
    else Some(areas.stat.approxQuantile("area", Array(0.5), 0.0).head) // relativeError 0 = exact
  }

  /** C12 `_reshape_dict` resize-policy dispatch: ratio from the median
    * cell size vs a target (sqrt, tolerance-gated), then resize+pad+
    * tile via CropOps (stride_ratio tiling of build.py:131-139).
    */
  def reshapeForTraining(ds: Dataset[ImagePlane], outRows: Int, outCols: Int,
                         resizeRatio: Double = 1.0, tolerance: Double = 1.5)
      : Dataset[ImagePlane] = {
    implicit val enc = ds.encoder
    val doResize = resizeRatio > tolerance || resizeRatio < 1.0 / tolerance
    val resized = if (doResize) ds.map(resizePlane(_: ImagePlane, resizeRatio)) else ds
    val padded = resized.map(padPlane(_: ImagePlane, outRows, outCols))
    padded.flatMap { p =>
      val plan = CropOps.planCrops(p.nRows, p.nCols, outRows, outCols, 0.0)
      CropOps.cropOne(p, plan)
    }
  }
}
