package graft.ops

import graft.core.ImagePlane
import org.apache.spark.sql.Dataset

/** z/t slicing along the `stacks` dimension and its inverse.
  *
  * Re-expresses caliban_toolbox/utils/slice_utils.py:40-161 (C5/C6/C8
  * in SURVEY.md §2.8). In the plane-per-row model a slice is a
  * re-tagging of rows: a stack row belongs to every slice whose
  * [start, end) interval covers it (overlap => `flatMap`, possibly 2
  * output rows), with the in-slice stack index rebased to 0.
  *
  * stitchSlices preserves the reference's asymmetry vs crop-stitching:
  * on overlap the HIGHEST covering slice wins unconditionally
  * (last-writer-wins, slice_utils.py:151-159) — deliberately different
  * from C4's majority vote.
  */
object SliceOps {

  /** C5 `compute_slice_indices` (slice_utils.py:40-68): starts =
    * arange(0, stackLen - overlap, sliceLen - overlap); ends = starts
    * + sliceLen with the final end clamped to stackLen.
    */
  def computeSliceIndices(stackLen: Int, sliceLen: Int, overlap: Int)
      : (Array[Int], Array[Int]) = {
    require(sliceLen > 0 && sliceLen <= stackLen, s"slice len $sliceLen vs stack $stackLen")
    require(overlap >= 0 && overlap < sliceLen, s"bad overlap $overlap")
    val stride = sliceLen - overlap
    val starts = (0 until (stackLen - overlap) by stride).toArray
    val ends = starts.map(_ + sliceLen)
    if (ends.last != stackLen) ends(ends.length - 1) = stackLen
    (starts, ends)
  }

  case class SlicePlan(starts: Array[Int], ends: Array[Int], stackLen: Int) {
    def numSlices: Int = starts.length
  }

  def planSlices(stackLen: Int, sliceLen: Int, overlap: Int): SlicePlan = {
    val (s, e) = computeSliceIndices(stackLen, sliceLen, overlap)
    SlicePlan(s, e, stackLen)
  }

  /** C6 `slice_helper` (slice_utils.py:71-123): tag each stack row with
    * every covering slice id, rebasing the stack index. Narrow.
    */
  def slicePlanes(ds: Dataset[ImagePlane], plan: SlicePlan): Dataset[ImagePlane] = {
    implicit val enc = ds.encoder
    ds.flatMap { p =>
      require(p.slice == 0, s"already sliced: slice=${p.slice}")
      plan.starts.indices.collect {
        case i if p.stack >= plan.starts(i) && p.stack < plan.ends(i) =>
          p.copy(slice = i, stack = p.stack - plan.starts(i))
      }
    }
  }

  /** C8 `stitch_slices` (slice_utils.py:126-161): restore the original
    * stack index; where two slices cover a stack, the higher slice id
    * wins (unconditional overwrite in the reference). Implemented as a
    * max-by-slice reduce per (fov, crop, original stack) — a
    * shuffle-light alternative to materializing a canvas.
    */
  def stitchSlices(ds: Dataset[ImagePlane], plan: SlicePlan): Dataset[ImagePlane] = {
    implicit val enc = ds.encoder
    import ds.sparkSession.implicits._
    ds.map(p => p.copy(stack = plan.starts(p.slice) + p.stack))
      .groupByKey(p => (p.fov, p.crop, p.stack))
      .reduceGroups((a, b) => if (a.slice >= b.slice) a else b)
      .map { case (_, p) => p.copy(slice = 0) }
  }
}
