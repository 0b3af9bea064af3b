package graft.ops

import graft.SparkSpec
import graft.core.ImagePlane

/** Mirrors relabel_test.py:33-67: dense renumbering, relationship
  * preservation, and IOU frame linking.
  */
class RelabelSpec extends SparkSpec {

  test("relabelArray densely renumbers preserving order") {
    // 5 -> 1, 9 -> 2, 100 -> 3; background untouched
    assert(Relabel.relabelArray(Array(0, 5, 9, 5, 0, 100)).toSeq == Seq(0, 1, 2, 1, 0, 3))
    assert(Relabel.relabelArray(Array.empty[Int]).isEmpty)
    assert(Relabel.relabelArray(Array(0, 0)).toSeq == Seq(0, 0))
  }

  test("preserveRelationships keeps cross-frame identity structure") {
    val p0 = ImagePlane("fov1", 0, 0, 0, 2, 2, Seq("c"), new Array[Float](4),
      Array(10, 0, 30, 0))
    val p1 = ImagePlane("fov1", 1, 0, 0, 2, 2, Seq("c"), new Array[Float](4),
      Array(10, 30, 0, 50))
    val out = Relabel.preserveRelationships(ImagePlane.toDataset(spark, Seq(p0, p1)))
      .collect().sortBy(_.stack)
    // 10 -> 1, 30 -> 2, 50 -> 3 in BOTH frames
    assert(out(0).labels.toSeq == Seq(1, 0, 2, 0))
    assert(out(1).labels.toSeq == Seq(1, 2, 0, 3))
  }

  test("predictRelationships links a moving cell across frames") {
    // an 8x8 cell moving 1px right per frame, ids shuffled per frame
    val n = 16
    def frame(stack: Int, id: Int): ImagePlane = {
      val labels = new Array[Int](n * n)
      for (r <- 4 until 12; c <- (4 + stack) until (12 + stack))
        labels(r * n + c) = id
      ImagePlane("fov1", stack, 0, 0, n, n, Seq("c"), new Array[Float](n * n), labels)
    }
    val frames = Seq(frame(0, 42), frame(1, 7), frame(2, 99))
    val out = Relabel.predictRelationships(ImagePlane.toDataset(spark, frames))
      .collect().sortBy(_.stack)
    val ids = out.map(_.labels.filter(_ != 0).distinct.toSeq)
    assert(ids.forall(_.size == 1))
    assert(ids.map(_.head).distinct.size == 1, s"same id across frames: $ids")
    assert(ids.head.head == 1)
  }

  test("predictRelationships assigns fresh ids to unmatched cells") {
    val n = 16
    def planeWith(stack: Int, cells: Seq[(Int, Int, Int)]): ImagePlane = {
      val labels = new Array[Int](n * n)
      cells.foreach { case (r0, c0, id) =>
        for (r <- r0 until r0 + 4; c <- c0 until c0 + 4) labels(r * n + c) = id
      }
      ImagePlane("fov1", stack, 0, 0, n, n, Seq("c"), new Array[Float](n * n), labels)
    }
    val f0 = planeWith(0, Seq((0, 0, 5)))
    val f1 = planeWith(1, Seq((0, 0, 3), (10, 10, 8))) // second cell is new
    val out = Relabel.predictRelationships(ImagePlane.toDataset(spark, Seq(f0, f1)))
      .collect().sortBy(_.stack)
    assert(out(0).labels.filter(_ != 0).distinct.toSeq == Seq(1))
    val ids1 = out(1).labels.filter(_ != 0).distinct.toSeq.sorted
    assert(ids1 == Seq(1, 2), s"linked + fresh: $ids1")
  }
}
