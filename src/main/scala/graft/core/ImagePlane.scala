package graft.core

import org.apache.spark.sql.{Dataset, SparkSession}

/** The engine's core data model: one row per 2-D image plane.
  *
  * The reference operates on a dense 7-D labeled tensor with dims
  * `[fovs, stacks, crops, slices, rows, cols, channels]`
  * (reference: caliban_toolbox/settings.py:31-33). The four leading
  * dims index independent work units — every loop in the reference
  * iterates their product (e.g. io_utils.py:71, crop_utils.py:165) —
  * so here they become relational columns (groupable / joinable /
  * shuffleable), while `rows x cols x channels` stays value-internal
  * as packed primitive arrays. No whole 7-D tensor ever materializes;
  * peak memory per task is one plane (or one stitch canvas), which is
  * what lets the same code run on a 1000-executor cluster.
  *
  * `pixels` is channel-major: index = c*nRows*nCols + r*nCols + col.
  * `labels` is one int mask (nRows*nCols), 0 = background — the `y`
  * tensor's single compartment (reference: reshape_data.py:101-102).
  */
case class ImagePlane(
    fov: String,
    stack: Int,
    crop: Int,
    slice: Int,
    nRows: Int,
    nCols: Int,
    channels: Seq[String],
    pixels: Array[Float],
    labels: Array[Int]) {

  def pixel(c: Int, r: Int, col: Int): Float = pixels(c * nRows * nCols + r * nCols + col)
  def label(r: Int, col: Int): Int = labels(r * nCols + col)

  def validate(): Unit = {
    require(nRows > 0 && nCols > 0, s"bad plane dims ${nRows}x$nCols")
    require(pixels.length == channels.length * nRows * nCols,
      s"pixels length ${pixels.length} != ${channels.length}x${nRows}x$nCols")
    require(labels.length == nRows * nCols,
      s"labels length ${labels.length} != ${nRows}x$nCols")
  }
}

/** Synthetic fixtures mirroring the reference's test inputs
  * (crop_utils_test.py:35-63 `_blank_data_xr` and the seeded patterns
  * of reshape_data_test.py:163-254).
  */
object ImagePlane {

  /** Blank planes: the `_blank_data_xr` analog. */
  def blankPlanes(
      nFovs: Int, nStacks: Int, nRows: Int, nCols: Int,
      channels: Seq[String] = Seq("channel1")): Seq[ImagePlane] =
    for {
      f <- 0 until nFovs
      s <- 0 until nStacks
    } yield ImagePlane(s"fov${f + 1}", s, 0, 0, nRows, nCols, channels,
      new Array[Float](channels.length * nRows * nCols),
      new Array[Int](nRows * nCols))

  /** Grid-of-cells label pattern (reshape_data_test.py:163-169):
    * rectangular cells `cellSize x cellSize` separated by 1-px
    * background gutters, ids 1..n per plane.
    */
  def gridLabels(plane: ImagePlane, cellSize: Int = 10): ImagePlane = {
    val labels = new Array[Int](plane.nRows * plane.nCols)
    val perRow = plane.nCols / cellSize
    var id = 0
    var gr = 0
    while ((gr + 1) * cellSize <= plane.nRows) {
      var gc = 0
      while ((gc + 1) * cellSize <= plane.nCols) {
        id += 1
        var r = gr * cellSize
        while (r < (gr + 1) * cellSize - 1) {
          var c = gc * cellSize
          while (c < (gc + 1) * cellSize - 1) {
            labels(r * plane.nCols + c) = id
            c += 1
          }
          r += 1
        }
        gc += 1
      }
      gr += 1
    }
    val _ = perRow
    plane.copy(labels = labels)
  }

  /** Per-frame corner tag (reshape_data_test.py:209-210):
    * label(0,0) = stack + 1 so each frame is identifiable.
    */
  def cornerTag(plane: ImagePlane): ImagePlane = {
    val labels = plane.labels.clone()
    labels(0) = plane.stack + 1
    plane.copy(labels = labels)
  }

  def toDataset(spark: SparkSession, planes: Seq[ImagePlane]): Dataset[ImagePlane] = {
    import spark.implicits._
    spark.createDataset(planes)
  }
}
