package graft.ops

import graft.SparkSpec
import graft.core.ImagePlane

class LabelCleanSpec extends SparkSpec {

  test("connectedComponents merges touching, splits disconnected") {
    // one id painted as two disconnected blobs -> 2 components;
    // an L-shape stays 1 component
    val n = 6
    val labels = Array(
      5, 5, 0, 0, 7, 0,
      5, 0, 0, 0, 7, 0,
      5, 5, 0, 0, 7, 7,
      0, 0, 0, 0, 0, 0,
      5, 5, 0, 0, 0, 0,
      5, 5, 0, 0, 0, 0)
    val out = LabelClean.connectedComponents(labels, n, n)
    val comps = out.filter(_ != 0).distinct
    assert(comps.length == 3, s"expected 3 components, got ${comps.toSeq}")
    // the L-shaped id-5 blob (top-left) is one component
    assert(out(0) == out(12) && out(0) == out(13))
    // the bottom-left id-5 blob is a different component
    assert(out(24) != out(0))
  }

  test("removeSmallObjects zeroes sub-threshold labels") {
    val labels = Array(1, 1, 1, 2, 0, 0)
    assert(LabelClean.removeSmallObjects(labels, 2).toSeq == Seq(1, 1, 1, 0, 0, 0))
    assert(LabelClean.removeSmallObjects(labels, 1).toSeq == labels.toSeq)
  }

  test("cleanLabels filters images below minObjects") {
    val rich = ImagePlane.gridLabels(ImagePlane.blankPlanes(1, 1, 30, 30).head, 10)
    val empty = ImagePlane.blankPlanes(1, 1, 30, 30).head.copy(fov = "fov_empty")
    val ds = ImagePlane.toDataset(spark, Seq(rich, empty))
    val out = LabelClean.cleanLabels(ds, relabelCC = true, minObjects = 1).collect()
    assert(out.length == 1 && out.head.fov == "fov1")
    // grid cells are separated by gutters: CC keeps them distinct
    assert(out.head.labels.filter(_ != 0).distinct.length ==
      rich.labels.filter(_ != 0).distinct.length)
  }
}
