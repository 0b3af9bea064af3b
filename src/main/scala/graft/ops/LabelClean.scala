package graft.ops

import graft.core.ImagePlane
import org.apache.spark.sql.Dataset

/** P4 `_clean_labels` (dataset_builder.py:397-439): per-image label
  * hygiene before training — optional connected-components relabel,
  * small-object removal, and a min-objects image filter. All per-row
  * (narrow, no shuffle); kernels are plain JVM loops on primitive
  * arrays (no boxing).
  */
object LabelClean {

  /** 4-connectivity connected-components labeling (the reference
    * delegates to skimage `label`): two-pass union-find, output ids
    * dense 1..n in scan order.
    */
  def connectedComponents(labels: Array[Int], nRows: Int, nCols: Int): Array[Int] = {
    val out = new Array[Int](labels.length)
    val parent = scala.collection.mutable.ArrayBuffer[Int](0)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    def union(a: Int, b: Int): Unit = {
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    var next = 0
    var r = 0
    while (r < nRows) {
      var c = 0
      while (c < nCols) {
        val i = r * nCols + c
        if (labels(i) != 0) {
          val up = if (r > 0 && labels(i - nCols) == labels(i)) out(i - nCols) else 0
          val left = if (c > 0 && labels(i - 1) == labels(i)) out(i - 1) else 0
          if (up == 0 && left == 0) {
            next += 1
            parent += next
            out(i) = next
          } else if (up != 0 && left != 0) {
            out(i) = math.min(up, left)
            union(up, left)
          } else out(i) = math.max(up, left)
        }
        c += 1
      }
      r += 1
    }
    // resolve + densify
    val remap = scala.collection.mutable.Map.empty[Int, Int]
    var dense = 0
    var i = 0
    while (i < out.length) {
      if (out(i) != 0) {
        val root = find(out(i))
        out(i) = remap.getOrElseUpdate(root, { dense += 1; dense })
      }
      i += 1
    }
    out
  }

  /** skimage `remove_small_objects` semantics: zero out every label
    * whose pixel area is below minSize.
    */
  def removeSmallObjects(labels: Array[Int], minSize: Int): Array[Int] = {
    val area = scala.collection.mutable.Map.empty[Int, Int]
    labels.foreach(l => if (l != 0) area.updateWith(l)(v => Some(v.getOrElse(0) + 1)))
    labels.map(l => if (l != 0 && area(l) < minSize) 0 else l)
  }

  /** Full clean pass: optional CC relabel, small-object removal, then
    * drop images with fewer than minObjects distinct cells
    * (dataset_builder.py:424-431).
    */
  def cleanLabels(ds: Dataset[ImagePlane],
                  relabelCC: Boolean = true,
                  smallObjectThreshold: Int = 0,
                  minObjects: Int = 1): Dataset[ImagePlane] = {
    implicit val enc = ds.encoder
    ds.map { p =>
        var l = p.labels
        if (relabelCC) l = connectedComponents(l, p.nRows, p.nCols)
        if (smallObjectThreshold > 0) l = removeSmallObjects(l, smallObjectThreshold)
        p.copy(labels = l)
      }
      .filter((p: ImagePlane) => p.labels.filter(_ != 0).distinct.length >= minObjects)
  }
}
