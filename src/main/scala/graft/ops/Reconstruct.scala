package graft.ops

import graft.core.ImagePlane
import graft.sources.Npz
import org.apache.spark.sql.{Dataset, SparkSession}

/** C9 `reconstruct_image_stack` (reshape_data.py:194-234) — the EP2
  * post-annotation inverse pipeline:
  *
  *   read NPZ crop dir (zero-filling units the annotators never
  *   returned, S12) -> stitch slices if sliced (C8) -> stitch crops if
  *   cropped (C4) -> relabel (W3/W4/J2 via graft.ops.Relabel).
  *
  * The geometry needed for inversion travels as the plan case classes
  * (the reference's `log_data` JSON sidecar, io_utils.py:124-133).
  */
object Reconstruct {

  case class ReconstructionPlan(
      fovs: Seq[String],
      cropPlan: Option[CropOps.CropPlan],
      slicePlan: Option[SliceOps.SlicePlan],
      nRows: Int, nCols: Int,
      channels: Seq[String])

  /** Forward pass bookkeeping: run crop (optional) then slice
    * (optional), returning the work units plus the inversion plan.
    */
  def cropAndSlice(ds: Dataset[ImagePlane],
                   origRows: Int, origCols: Int, stackLen: Int,
                   cropSize: Option[(Int, Int, Double)],
                   sliceLen: Option[(Int, Int)],
                   fovs: Seq[String], channels: Seq[String])
      : (Dataset[ImagePlane], ReconstructionPlan) = {
    val cropPlan = cropSize.map { case (r, c, overlap) =>
      CropOps.planCrops(origRows, origCols, r, c, overlap)
    }
    val slicePlan = sliceLen.map { case (len, overlap) =>
      SliceOps.planSlices(stackLen, len, overlap)
    }
    var out = ds
    cropPlan.foreach(p => out = CropOps.cropPlanes(out, p))
    slicePlan.foreach(p => out = SliceOps.slicePlanes(out, p))
    (out, ReconstructionPlan(fovs, cropPlan, slicePlan, origRows, origCols, channels))
  }

  /** EP2 inverse: NPZ dir -> reconstructed full-size planes. */
  def reconstructFromNpzDir(spark: SparkSession, dir: String,
                            plan: ReconstructionPlan): Dataset[ImagePlane] = {
    val nCrops = plan.cropPlan.map(_.numCrops).getOrElse(1)
    val sliceLens: Seq[(Int, Int)] = plan.slicePlan match {
      case Some(p) => p.starts.indices.map(i => i -> (p.ends(i) - p.starts(i)))
      case None => Seq(0 -> 1)
    }
    val expected = for {
      fov <- plan.fovs
      crop <- 0 until nCrops
      (slice, stackLen) <- sliceLens
    } yield (fov, crop, slice, stackLen)
    val unitRows = plan.cropPlan.map(_.cropRows).getOrElse(plan.nRows)
    val unitCols = plan.cropPlan.map(_.cropCols).getOrElse(plan.nCols)
    var ds = Npz.loadNpzsWithGrid(spark, dir, expected, unitRows, unitCols, plan.channels)
    plan.slicePlan.foreach(p => ds = SliceOps.stitchSlices(ds, p))
    plan.cropPlan.foreach(p => ds = CropOps.stitchCrops(ds, p))
    ds
  }
}
