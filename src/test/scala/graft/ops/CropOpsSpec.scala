package graft.ops

import graft.SparkSpec
import graft.core.ImagePlane

/** Mirrors the reference's own invariants: analytic crop-count oracles
  * (crop_utils_test.py:74-91) and the crop->stitch round trip
  * preserving shape, nonzero mask and distinct-cell count
  * (reshape_data_test.py:146-192).
  */
class CropOpsSpec extends SparkSpec {

  test("computeCropIndices matches the analytic formula") {
    // no overlap: ceil(len/size) crops, padding completes the last
    val (s1, e1, p1) = CropOps.computeCropIndices(100, 20, 0.0)
    assert(s1.toSeq == (0 until 100 by 20).toSeq)
    assert(e1.last == 100 && p1 == 0)
    // overlap 0.2: stride = 16
    val (s2, e2, p2) = CropOps.computeCropIndices(100, 20, 0.2)
    assert(s2.toSeq == (0 until 100 by 16).toSeq)
    assert(e2.head == 20)
    assert(p2 == e2.last - 100 && p2 >= 0)
  }

  test("cropPlanes emits the full grid with rows-outer crop index") {
    val plan = CropOps.planCrops(50, 50, 20, 20, 0.0)
    val planes = ImagePlane.blankPlanes(1, 1, 50, 50).map(ImagePlane.gridLabels(_))
    val crops = CropOps.cropOne(planes.head, plan)
    assert(crops.size == plan.numCrops && plan.numCrops == 9)
    assert(crops.map(_.crop).toSeq == (0 until 9))
    assert(crops.forall(c => c.nRows == 20 && c.nCols == 20))
  }

  test("crop -> stitch round trip preserves mask and cell count (overlap > cell)") {
    // like the reference test (reshape_data_test.py:146-192): overlap
    // pixels (0.5 * 24 = 12) exceed cell extent (10), so every split
    // cell is reconciled by the overlap vote
    roundTrip(cropSize = 24, overlap = 0.5, exactCount = true)
  }

  test("crop -> stitch round trip without overlap preserves mask; split cells may fork") {
    roundTrip(cropSize = 25, overlap = 0.0, exactCount = false)
  }

  private def roundTrip(cropSize: Int, overlap: Double, exactCount: Boolean): Unit = {
    val orig = ImagePlane.blankPlanes(2, 2, 60, 60)
      .map(ImagePlane.gridLabels(_, cellSize = 10))
    val plan = CropOps.planCrops(60, 60, cropSize, cropSize, overlap)
    val ds = ImagePlane.toDataset(spark, orig)
    val stitched = CropOps.stitchCrops(CropOps.cropPlanes(ds, plan), plan)
      .collect().map(p => (p.fov, p.stack) -> p).toMap
    assert(stitched.size == orig.size)
    orig.foreach { o =>
      val s = stitched((o.fov, o.stack))
      assert(s.nRows == o.nRows && s.nCols == o.nCols, "shape preserved")
      assert(s.labels.map(l => l != 0).toSeq == o.labels.map(l => l != 0).toSeq,
        "nonzero mask preserved")
      val got = s.labels.filter(_ != 0).distinct.length
      val want = o.labels.filter(_ != 0).distinct.length
      if (exactCount) assert(got == want, "distinct cell count preserved")
      else assert(got >= want, "splitting can only increase cell count")
    }
  }

  test("stitch reconciles overlap labels to a single id per cell") {
    // one cell spanning two overlapping crops must come back as ONE id
    val base = ImagePlane.blankPlanes(1, 1, 40, 40).head
    val labels = base.labels.clone()
    for (r <- 10 until 30; c <- 10 until 30) labels(r * 40 + c) = 7
    val one = base.copy(labels = labels)
    val plan = CropOps.planCrops(40, 40, 25, 25, 0.4)
    val ds = ImagePlane.toDataset(spark, Seq(one))
    val out = CropOps.stitchCrops(CropOps.cropPlanes(ds, plan), plan).collect().head
    assert(out.labels.filter(_ != 0).distinct.length == 1)
    assert(out.labels.map(l => l != 0).toSeq == one.labels.map(l => l != 0).toSeq)
  }
}
