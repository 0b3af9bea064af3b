package graft.ops

import graft.SparkSpec
import graft.core.ImagePlane

class ImageResizeSpec extends SparkSpec {

  test("bilinear resize preserves constant images exactly") {
    val p = ImagePlane.blankPlanes(1, 1, 20, 20).head
      .copy(pixels = Array.fill(400)(3.5f))
    val up = ImageResize.resizePlane(p, 2.0)
    assert(up.nRows == 40 && up.nCols == 40)
    assert(up.pixels.forall(v => math.abs(v - 3.5f) < 1e-5))
  }

  test("nearest-neighbor label resize never blends ids") {
    val p = ImagePlane.gridLabels(ImagePlane.blankPlanes(1, 1, 20, 20).head, 5)
    val origIds = p.labels.distinct.toSet
    val up = ImageResize.resizePlane(p, 2.0)
    assert(up.labels.distinct.toSet.subsetOf(origIds), "no new ids invented")
    val down = ImageResize.resizePlane(p, 0.5)
    assert(down.labels.distinct.toSet.subsetOf(origIds))
  }

  test("padPlane pads up to multiples, preserving content") {
    val p = ImagePlane.gridLabels(ImagePlane.blankPlanes(1, 1, 25, 30).head, 5)
    val padded = ImageResize.padPlane(p, 16, 16)
    assert(padded.nRows == 32 && padded.nCols == 32)
    for (r <- 0 until 25; c <- 0 until 30)
      assert(padded.label(r, c) == p.label(r, c))
    // padding is zero
    assert((25 until 32).forall(r => (0 until 32).forall(c => padded.label(r, c) == 0)))
  }

  test("medianCellSize: exact median of cell areas") {
    // grid cells of 4x4=16 px each (cellSize 5 with 1px gutter)
    val p = ImagePlane.gridLabels(ImagePlane.blankPlanes(1, 1, 20, 20).head, 5)
    val m = ImageResize.medianCellSize(ImagePlane.toDataset(spark, Seq(p)))
    assert(m.contains(16.0))
    val empty = ImagePlane.blankPlanes(1, 1, 20, 20)
    assert(ImageResize.medianCellSize(ImagePlane.toDataset(spark, empty)).isEmpty)
  }
}
