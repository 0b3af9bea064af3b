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

    // ---- stitch-group skew drill -------------------------------------
    // One HOT fov whose canvas is 10x taller (5120x512 -> 324 crops vs
    // the regular 36): the stitch shuffle keys by (fov, stack, slice),
    // so the hot canvas is one task with ~9x the rows of its peers.
    // Salting CANNOT split this group — stitchGroup is order-dependent
    // (running label offset + majority vote over previously placed
    // pixels), so every crop of a canvas must meet in one task — and
    // AQE skew handling targets joins/shuffle-read splitting, not a
    // mapGroups that semantically needs the whole group. The drill
    // MEASURES the straggler factor; the structural answer is that the
    // crop PLAN bounds group size by construction (numCrops is a plan
    // constant — within one dataset no canvas can be 10x another), so
    // pathological canvases are bounded upstream by plan geometry
    // (smaller fov tiling / the C5 slice axis), not by shuffle tricks.
    import org.apache.spark.sql.functions.{col, countDistinct, explode}
    val hotPlan = CropOps.planCrops(5120, 512, 128, 128, 0.25)
    val hotPlanes = spark.range(1).as[Long].flatMap { _ =>
      (0 until stacks).map { st =>
        ImagePlane.gridLabels(
          ImagePlane(f"fovhot00", st, 0, 0, 5120, 512, Seq("channel1"),
            new Array[Float](5120 * 512), new Array[Int](5120 * 512)),
          cellSize = 24)
      }
    }
    val hotDir = s"$outDir-hot"
    timed(s"hot-fov crop+store (${hotPlan.numCrops} crops/canvas)") {
      PlaneStore.save(CropOps.cropPlanes(hotPlanes, hotPlan), hotDir,
        maxRecordsPerFile = 500)
    }
    val hotWall = timed("stitch hot cohort (4 groups of 324)") {
      CropOps.stitchCrops(PlaneStore.load(spark, hotDir), hotPlan)
        .map(p => (p.fov, p.labels.filter(_ != 0).distinct.length))
        .toDF("fov", "n_cells").collect()
    }
    println(s"[scale] hot-canvas census: ${hotWall.mkString(", ")}")

    // Where salting DOES apply in this pipeline: unordered aggregations
    // over the crop store (QC label census per fov) — a hot fov's 9x
    // rows spread over (fov, salt) sub-groups with a two-stage merge.
    // Exact same result, no single task holds the hot fov's whole set.
    val censusIn = PlaneStore.load(spark, hotDir).toDF()
      .unionByName(PlaneStore.loadFov(spark, outDir, "fov00000").toDF())
      .select(col("fov"), explode(col("labels")).as("label"))
      .filter(col("label") =!= 0)
    val plainCensus = timed("QC census plain countDistinct") {
      censusIn.groupBy("fov").agg(countDistinct("label").as("n_distinct"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val saltedCensus = timed("QC census salted (Skew, 16 salts)") {
      graft.functions.Skew.saltedCountDistinct(censusIn, "fov", "label", salts = 16)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    require(plainCensus == saltedCensus,
      s"salted census diverged: $plainCensus vs $saltedCensus")
    println(s"[scale] salted == plain census for ${plainCensus.size} fovs: ok")
    spark.stop()
  }
}
