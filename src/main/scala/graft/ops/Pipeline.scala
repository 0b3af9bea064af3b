package graft.ops

import graft.core.ImagePlane
import graft.sources.{Npz, SerializableHadoopConf}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** The reference's top-level composed flows (`pipeline.py` + the EP1
  * notebook, SURVEY.md §3), as engine functions.
  */
object Pipeline {

  /** P2 `find_sparse_images` (pipeline.py:33-51): keep planes whose
    * distinct-cell count exceeds the cutoff. Narrow scalar filter.
    */
  def findSparseImages(ds: Dataset[ImagePlane], cutoff: Int): Dataset[ImagePlane] =
    ds.filter((p: ImagePlane) => p.labels.filter(_ != 0).distinct.length > cutoff)

  /** S13 `save_stitched_npzs` (pipeline.py:54-67): one NPZ per fov of
    * the stitched stack, named `{fov}.npz`, written where the data
    * lives through the Hadoop FileSystem for `saveDir`'s scheme
    * (executor-local disk is NOT the shared store on a real cluster).
    *
    * Per-task memory bound: ONE fov's stack — inherent to this sink's
    * contract (a single NPZ holds the X entry fully before the y
    * entry, so the stack must be assembled before the zip can close).
    * Deep stacks that exceed that bound belong in PlaneStore (columnar,
    * plane-per-row) instead; this format exists for the annotation
    * tool.
    */
  def saveStitchedNpzs(ds: Dataset[ImagePlane], saveDir: String): Unit = {
    val spark = ds.sparkSession
    val hconf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    new Path(saveDir).getFileSystem(hconf.value).mkdirs(new Path(saveDir))
    import spark.implicits._
    ds.groupByKey(_.fov)
      .mapGroups((fov, it) => (fov, Npz.encodeStack(it.toSeq)))
      .foreachPartition { (it: Iterator[(String, Array[Byte])]) =>
        val fs = new Path(saveDir).getFileSystem(hconf.value)
        it.foreach { case (fov, bytes) =>
          val out = fs.create(new Path(saveDir, s"$fov.npz"), true)
          try out.write(bytes) finally out.close()
        }
      }
  }

  /** EP1 pre-annotation flow (SURVEY.md §3 EP1): contrast-adjust each
    * channel, crop, slice, write NPZ work units, return the upload-log
    * table. One narrow map + two narrow generators + the partitioned
    * sink; the only wide edge is the NPZ unit grouping.
    */
  def preAnnotationFlow(spark: SparkSession,
                        planes: Dataset[ImagePlane],
                        origRows: Int, origCols: Int, stackLen: Int,
                        cropSize: (Int, Int, Double),
                        sliceLen: Option[(Int, Int)],
                        fovs: Seq[String], channels: Seq[String],
                        saveDir: String,
                        blurSigma: Double = 0.0,
                        blankLabels: String = "include")
      : (Reconstruct.ReconstructionPlan, DataFrame) = {
    implicit val enc = planes.encoder
    val adjusted =
      if (blurSigma > 0)
        planes.map { p =>
          val planeSize = p.nRows * p.nCols
          val out = p.pixels.clone()
          p.channels.indices.foreach { ch =>
            val slice = java.util.Arrays.copyOfRange(out, ch * planeSize, (ch + 1) * planeSize)
            val adj = ImageFunctions.adjustImage(slice, p.nRows, p.nCols, blurSigma = blurSigma)
            System.arraycopy(adj, 0, out, ch * planeSize, planeSize)
          }
          p.copy(pixels = out)
        }
      else planes
    val (units, plan) = Reconstruct.cropAndSlice(adjusted,
      origRows, origCols, stackLen, Some(cropSize), sliceLen, fovs, channels)
    Npz.saveNpzsForCaliban(units, saveDir, blankLabels)
    // the reference persists reconstruction geometry next to the work
    // units (log_data.json) so EP2 can run in a later process
    Reconstruct.savePlan(spark, saveDir, plan)
    import spark.implicits._
    val fs = new Path(saveDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.globStatus(new Path(saveDir, "*.npz"))
      .map(_.getPath.getName).toSeq.sorted
    val log = graft.jobs.JobLog.createUploadLog(
      names.toDF("filename"), stage = "annotation",
      awsFolder = saveDir.split("/").last, jobId = 0L)
    (plan, log)
  }
}
