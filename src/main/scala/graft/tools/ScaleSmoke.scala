package graft.tools

import graft.core.ImagePlane
import graft.ops.{CropOps, Relabel}
import graft.sources.PlaneStore

/** Scale smoke for the image pipeline: N fovs of reference-sized
  * (512x512) grid-labeled planes, generated distributed (one task per
  * fov — no driver materialization), pushed through
  * crop -> fov-partitioned store -> partition-pruned read -> stitch ->
  * relabel, with wall-clock per stage. This is the shape of the 100 TB
  * job: scaling = more fovs = more partitions, nothing else changes.
  *
  * Usage: runMain graft.tools.ScaleSmoke [nFovs] [outDir]
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val nFovs = args.headOption.map(_.toInt).getOrElse(64)
    val outDir = args.lift(1).getOrElse("/tmp/graft_scale_smoke")
    val stacks = 4
    val spark = graft.core.GraftSession.get()
    import spark.implicits._

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scale] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // distributed synthesis: fov index -> planes, inside the executors
    val planes = spark.range(nFovs).repartition(spark.sparkContext.defaultParallelism)
      .as[Long].flatMap { f =>
        (0 until stacks).map { st =>
          ImagePlane.gridLabels(
            ImagePlane.blankPlanes(1, 1, 512, 512).head
              .copy(fov = f"fov$f%05d", stack = st),
            cellSize = 24)
        }
      }

    val plan = CropOps.planCrops(512, 512, 128, 128, 0.25)
    val cropped = CropOps.cropPlanes(planes, plan)
    timed(s"crop+store ($nFovs fovs)") {
      PlaneStore.save(cropped, outDir, maxRecordsPerFile = 500)
    }
    val loaded = PlaneStore.load(spark, outDir)
    val nUnits = timed("count units")(loaded.count())
    println(s"[scale] units: $nUnits (${plan.numCrops} crops x $stacks stacks x $nFovs fovs)")
    val stitched = timed("stitch + relabel + census") {
      Relabel.allFrames(CropOps.stitchCrops(loaded, plan))
        .map(p => (p.fov, p.labels.filter(_ != 0).distinct.length))
        .toDF("fov", "n_cells")
        .groupBy("n_cells").count().collect()
    }
    println(s"[scale] cell-count census: ${stitched.mkString(", ")}")
    val pruned = timed("partition-pruned single fov") {
      PlaneStore.loadFov(spark, outDir, "fov00000").count()
    }
    println(s"[scale] single-fov units: $pruned")

    // EP1 -> EP2 annotation loop through the cluster-safe NPZ sinks: a
    // subset of fovs goes crop -> one NPZ per work unit + log_data.json
    // sidecar -> fresh-session reconstruction from disk alone. Subset
    // because the loop's cost is one small FILE per unit — the
    // annotation-tool contract (io_utils.py:73), not a columnar format.
    val npzFovs = math.min(nFovs, 16)
    val npzDir = s"$outDir-npz"
    val subset = planes.filter((p: graft.core.ImagePlane) =>
      p.fov < f"fov$npzFovs%05d")
    val (units, rplan) = graft.ops.Reconstruct.cropAndSlice(subset,
      origRows = 512, origCols = 512, stackLen = stacks,
      cropSize = Some((128, 128, 0.25)), sliceLen = None,
      fovs = (0 until npzFovs).map(f => f"fov$f%05d"),
      channels = Seq("channel1"))
    timed(s"NPZ sink ($npzFovs fovs -> ${npzFovs * plan.numCrops} files)") {
      graft.sources.Npz.saveNpzsForCaliban(units, npzDir)
      graft.ops.Reconstruct.savePlan(spark, npzDir, rplan)
    }
    val reconCells = timed("EP2 reconstruct from sidecar") {
      graft.ops.Reconstruct.reconstructFromNpzDir(spark.newSession(), npzDir)
        .map(p => p.labels.filter(_ != 0).distinct.length)
        .groupBy("value").count().collect()
    }
    println(s"[scale] reconstructed cell census: ${reconCells.mkString(", ")}")
    spark.stop()
  }
}
