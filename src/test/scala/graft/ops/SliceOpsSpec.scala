package graft.ops

import graft.SparkSpec
import graft.core.ImagePlane

/** Mirrors reshape_data_test.py:193-293: slice round trip preserves
  * per-frame corner tags; combined crop+slice round trip.
  */
class SliceOpsSpec extends SparkSpec {

  test("computeSliceIndices matches the reference formula (slice_utils.py:40-68)") {
    val (s1, e1) = SliceOps.computeSliceIndices(10, 4, 0)
    assert(s1.toSeq == Seq(0, 4, 8) && e1.toSeq == Seq(4, 8, 10))
    val (s2, e2) = SliceOps.computeSliceIndices(10, 4, 1)
    assert(s2.toSeq == Seq(0, 3, 6) && e2.toSeq == Seq(4, 7, 10))
  }

  test("slice -> stitch round trip preserves per-frame corner tags") {
    val orig = ImagePlane.blankPlanes(2, 9, 20, 20).map(ImagePlane.cornerTag)
    val plan = SliceOps.planSlices(9, 4, 1)
    val ds = ImagePlane.toDataset(spark, orig)
    val back = SliceOps.stitchSlices(SliceOps.slicePlanes(ds, plan), plan)
      .collect().map(p => (p.fov, p.stack) -> p).toMap
    assert(back.size == orig.size)
    orig.foreach { o =>
      val b = back((o.fov, o.stack))
      assert(b.labels(0) == o.stack + 1, s"corner tag of stack ${o.stack}")
      assert(b.slice == 0)
    }
  }

  test("overlap rows appear in both covering slices; higher slice wins on stitch") {
    val orig = ImagePlane.blankPlanes(1, 6, 8, 8).map(ImagePlane.cornerTag)
    val plan = SliceOps.planSlices(6, 3, 1)
    val ds = ImagePlane.toDataset(spark, orig)
    val sliced = SliceOps.slicePlanes(ds, plan).collect()
    // stacks at slice boundaries (2 and 4) belong to two slices
    assert(sliced.length == 6 + 2)
    val back = SliceOps.stitchSlices(ImagePlane.toDataset(spark, sliced.toSeq), plan).collect()
    assert(back.length == 6)
    assert(back.map(p => p.labels(0)).sorted.toSeq == (1 to 6))
  }

  test("combined crop+slice round trip (reshape_data_test.py:227-293)") {
    // corner tag gets an id disjoint from the grid ids: a reused id
    // would make a disconnected two-component cell, which crop+stitch
    // legitimately forks (ids are resolved per connected overlap)
    val orig = ImagePlane.blankPlanes(2, 6, 40, 40)
      .map(ImagePlane.gridLabels(_, cellSize = 8))
      .map { p =>
        val labels = p.labels.clone(); labels(0) = 100 + p.stack
        p.copy(labels = labels)
      }
    // overlap pixels (0.5 * 20 = 10) exceed cell extent (8) so the
    // stitch vote reconciles every split cell
    val cropPlan = CropOps.planCrops(40, 40, 20, 20, 0.5)
    val slicePlan = SliceOps.planSlices(6, 3, 1)
    val ds = ImagePlane.toDataset(spark, orig)
    val forward = SliceOps.slicePlanes(CropOps.cropPlanes(ds, cropPlan), slicePlan)
    val back = CropOps.stitchCrops(
      SliceOps.stitchSlices(forward, slicePlan), cropPlan)
      .collect().map(p => (p.fov, p.stack) -> p).toMap
    assert(back.size == orig.size)
    orig.foreach { o =>
      val b = back((o.fov, o.stack))
      assert(b.labels.map(_ != 0).toSeq == o.labels.map(_ != 0).toSeq, "mask preserved")
      assert(b.labels.filter(_ != 0).distinct.length ==
        o.labels.filter(_ != 0).distinct.length, "cell count preserved")
    }
  }
}
