package graft.dataset

import graft.core.ImagePlane
import org.apache.spark.sql.functions._

/** EP3 at image scale — build_dataset (dataset_builder.py:566-649, the
  * R6/R7 flagship; EP3 in SURVEY §6) run once at a synthetic
  * multi-experiment scale so BASELINE.md carries a recorded number per
  * PIPELINE STAGE, not just the pinned small-fixture contract oracle
  * (q_ds_build). Lives in this package to verify the split law against
  * [[Splitter.splitCounts]] directly; [[graft.tools.Ep2Bench]] is the
  * crop-pipeline sibling.
  *
  * The store is nExps experiments of 64x64 grid-labeled FOVs
  * (cellSize 8: 64 cells of 7x7 px = 3136 nonzero per plane), written
  * to parquet once, so every stage reads the layout a real store has.
  * Stage walls are measured on progressively longer pipeline prefixes
  * (each forced independently against the same store — stage cost =
  * delta of adjacent prefixes; the final prefix is the whole EP3):
  *
  *  1. GEN: distributed plane generation + parquet store write.
  *  2. SPLIT: metadata broadcast join (J1) + seeded per-experiment
  *     split (R2) + subset (P1); invariant: per-experiment counts
  *     match [[Splitter.splitCounts]] EXACTLY.
  *  3. RESHAPE: + C12 tile to 32x32 (no resize at ratio 1.0);
  *     invariant: exactly 4 crops per plane, all 32x32.
  *  4. CLEAN: + P4 connected components + small-object removal;
  *     invariant: every crop holds exactly 16 cells / 784 nonzero px
  *     (the 4x4 quadrant of the 8x8 cell grid).
  *  5. BALANCE: + R5 tissue oversampling on train/val; invariant:
  *     every tissue's train/val count equals the max tissue count,
  *     test rows ride through untouched.
  *  6. SUMMARY: A2 summarize over tissue (the pipeline's output
  *     contract), collected.
  *
  * Every invariant is a `require` — the bench CRASHES rather than
  * record a wall for a wrong pipeline.
  *
  * Usage: runMain graft.dataset.Ep3Bench [nFovs] [nExps]   (1000, 8)
  */
object Ep3Bench {
  def main(args: Array[String]): Unit = {
    val nFovs = args.headOption.map(_.toInt).getOrElse(1000)
    val nExps = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    require(nFovs % nExps == 0, "nExps must divide nFovs evenly")
    // the 50/30/20 tissue-skew formula needs all three tissues to
    // exist, else stage 5 fails minutes later blaming the balancer
    require(nExps >= 5,
      s"nExps=$nExps too small: the 50/30/20 tissue split needs >= 5 experiments")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def loadavg(): Double =
      try {
        val src = scala.io.Source.fromFile("/proc/loadavg")
        try src.mkString.split(" ")(0).toDouble finally src.close()
      } catch { case _: Throwable => -1.0 }
    val load0 = loadavg()

    // ---- stage 1: GEN — distributed generation + parquet store ----
    val t0 = System.nanoTime()
    val store = graft.core.Scratch.dir(spark, "ep3bench")
    spark.range(nFovs).repartition(cpus.toInt)
      .map { f =>
        val p = ImagePlane.gridLabels(
          ImagePlane("fov" + (f + 1), 0, 0, 0, 64, 64, Seq("channel1"),
            new Array[Float](4096), new Array[Int](4096)), cellSize = 8)
        ("exp" + (f % nExps), p.fov, p.stack, p.crop, p.slice,
          p.nRows, p.nCols, p.channels, p.pixels, p.labels)
      }
      .toDF("experiment", "fov", "stack", "crop", "slice", "nRows",
        "nCols", "channels", "pixels", "labels")
      .write.mode("overwrite").parquet(s"$store/planes")
    // experiment-level metadata, tissue-skewed so the balancer has
    // real work: first half tissue_a, next 30% tissue_b, rest tissue_c
    val metadata = (0 until nExps).map { e =>
      val tissue =
        if (e < nExps / 2) "tissue_a"
        else if (e < (nExps * 8) / 10) "tissue_b"
        else "tissue_c"
      ("exp" + e, tissue, "platform" + (e % 2))
    }.toDF("experiment", "tissue", "platform")
    metadata.write.mode("overwrite").parquet(s"$store/metadata")
    val genSec = (System.nanoTime() - t0) / 1e9

    val planes = spark.read.parquet(s"$store/planes")
    val meta = spark.read.parquet(s"$store/metadata")
    val seed = 7L

    // ---- stage 2: SPLIT — J1 broadcast join + R2 split + P1 subset ----
    val t1 = System.nanoTime()
    val split = DatasetBuilder.subset(
      DatasetBuilder.assignSplits(
        DatasetBuilder.attachMetadata(planes, meta), seed),
      Seq("all"), Seq("all"))
    val gotSplits = split.groupBy("experiment", "split").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val splitSec = (System.nanoTime() - t1) / 1e9
    val perExp = nFovs.toLong / nExps
    val law = Splitter.splitCounts(perExp, (0.8, 0.1, 0.1))
    (0 until nExps).foreach { e =>
      val k = "exp" + e
      val got = (gotSplits.getOrElse((k, "train"), 0L),
        gotSplits.getOrElse((k, "val"), 0L),
        gotSplits.getOrElse((k, "test"), 0L))
      require(got == law, s"split law violated for $k: got $got want $law")
    }

    // ---- stage 3: RESHAPE — + C12 tile to 32x32 (4 crops/plane) ----
    val t2 = System.nanoTime()
    val reshaped = DatasetBuilder.buildDataset(spark, planes, meta,
      outRows = 32, outCols = 32, relabelCC = false, minObjects = 0,
      seed = seed)
    val rs = reshaped.toDF()
      .agg(count(lit(1)), min("nRows"), max("nRows"), min("nCols"),
        max("nCols")).head()
    val reshapeSec = (System.nanoTime() - t2) / 1e9
    require(rs.getLong(0) == 4L * nFovs,
      s"reshape must emit 4 crops/plane: got ${rs.getLong(0)}")
    require(rs.getInt(1) == 32 && rs.getInt(2) == 32 &&
      rs.getInt(3) == 32 && rs.getInt(4) == 32, "crops must all be 32x32")

    // ---- stage 4: CLEAN — + P4 CC relabel + small-object removal ----
    val t3 = System.nanoTime()
    val cleaned = DatasetBuilder.buildDataset(spark, planes, meta,
      outRows = 32, outCols = 32, relabelCC = true,
      smallObjectThreshold = 20, minObjects = 1, seed = seed)
    val cl = cleaned
      .map { tp =>
        val ids = tp.labels.filter(_ != 0)
        (ids.distinct.length, ids.length)
      }
      .toDF("n_cells", "n_nonzero")
      .agg(count(lit(1)), min("n_cells"), max("n_cells"),
        min("n_nonzero"), max("n_nonzero")).head()
    val cleanSec = (System.nanoTime() - t3) / 1e9
    require(cl.getLong(0) == 4L * nFovs, "clean must keep every crop")
    require(cl.getInt(1) == 16 && cl.getInt(2) == 16,
      s"every quadrant holds 16 CC cells: got [${cl.getInt(1)},${cl.getInt(2)}]")
    require(cl.getInt(3) == 784 && cl.getInt(4) == 784,
      s"every quadrant holds 784 nonzero px: got [${cl.getInt(3)},${cl.getInt(4)}]")

    // ---- stage 5: BALANCE — + R5 tissue oversampling (not test) ----
    val t4 = System.nanoTime()
    val balanced = DatasetBuilder.buildDataset(spark, planes, meta,
      outRows = 32, outCols = 32, relabelCC = true,
      smallObjectThreshold = 20, minObjects = 1, balance = true,
      seed = seed)
    val balDf = balanced.toDF().persist()
    val trainVal = balDf.filter(col("split") =!= "test")
      .groupBy("tissue").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nTest = balDf.filter(col("split") === "test").count()
    val balanceSec = (System.nanoTime() - t4) / 1e9
    require(trainVal.size == 3 && trainVal.values.toSet.size == 1,
      s"balance must equalize tissue counts on train/val: $trainVal")
    require(nTest == 4L * nExps * law._3,
      s"test rows must ride through unbalanced: $nTest")

    // ---- stage 6: SUMMARY — A2 over tissue, the output contract ----
    val t5 = System.nanoTime()
    val summary = DatasetBuilder.summarize(balanced, "tissue").collect()
    val summarySec = (System.nanoTime() - t5) / 1e9
    balDf.unpersist()
    val nBalanced = trainVal.values.sum + nTest

    def r2(d: Double): Double = math.rint(d * 100) / 100
    println(
      s"""{"metric":"ep3_scale","n_fovs":$nFovs,"n_exps":$nExps,""" +
      s""""n_crops":${4L * nFovs},"n_balanced":$nBalanced,""" +
      s""""max_tissue":${trainVal.values.max},"n_test":$nTest,""" +
      s""""n_summary_rows":${summary.length},""" +
      s""""gen_sec":${r2(genSec)},"split_sec":${r2(splitSec)},""" +
      s""""reshape_prefix_sec":${r2(reshapeSec)},""" +
      s""""clean_prefix_sec":${r2(cleanSec)},""" +
      s""""balance_prefix_sec":${r2(balanceSec)},""" +
      s""""summary_sec":${r2(summarySec)},""" +
      s""""load_start":$load0,"load_end":${loadavg()}}""")
    spark.stop()
  }
}
