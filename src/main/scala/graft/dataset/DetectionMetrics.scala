package graft.dataset

import graft.core.ImagePlane
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** A3 upstream: per-image detection metrics from raw (true, predicted)
  * mask pairs — the part the reference delegates to
  * deepcell-toolbox's metrics before `DatasetBenchmarker` sums them
  * (dataset_benchmarker.py:73-110).
  *
  * A true cell is "correctly detected" when some predicted cell
  * overlaps it with IOU >= threshold, greedy one-to-one (same matcher
  * family as graft.ops.Relabel.linkFrames). Pixel-level jaccard
  * accumulates intersection/union of the nonzero masks via a typed
  * `Aggregator` (SURVEY.md §2.11) so it composes with groupBy across
  * millions of images.
  */
object DetectionMetrics {

  case class MaskPair(category: String, trueLabels: Array[Int],
                      predLabels: Array[Int])
  case class PerImage(category: String, n_true: Long, n_pred: Long,
                      correct_detections: Long, inter: Long, union: Long)

  def scorePair(category: String, t: Array[Int], p: Array[Int],
                iouThreshold: Double = 0.5): PerImage = {
    require(t.length == p.length, "mask size mismatch")
    val interMap = scala.collection.mutable.Map.empty[(Int, Int), Int]
    val areaT = scala.collection.mutable.Map.empty[Int, Int]
    val areaP = scala.collection.mutable.Map.empty[Int, Int]
    var pixInter = 0L
    var pixUnion = 0L
    var i = 0
    while (i < t.length) {
      val a = t(i); val b = p(i)
      if (a != 0) areaT.updateWith(a)(v => Some(v.getOrElse(0) + 1))
      if (b != 0) areaP.updateWith(b)(v => Some(v.getOrElse(0) + 1))
      if (a != 0 && b != 0) { interMap.updateWith((a, b))(v => Some(v.getOrElse(0) + 1)); pixInter += 1 }
      if (a != 0 || b != 0) pixUnion += 1
      i += 1
    }
    val pairs = interMap.toSeq.map { case ((a, b), n) =>
      (a, b, n.toDouble / (areaT(a) + areaP(b) - n))
    }.filter(_._3 >= iouThreshold).sortBy { case (a, b, iou) => (-iou, a, b) }
    val takenT = scala.collection.mutable.Set.empty[Int]
    val takenP = scala.collection.mutable.Set.empty[Int]
    var correct = 0L
    pairs.foreach { case (a, b, _) =>
      if (!takenT.contains(a) && !takenP.contains(b)) {
        takenT += a; takenP += b; correct += 1
      }
    }
    PerImage(category, areaT.size.toLong, areaP.size.toLong, correct, pixInter, pixUnion)
  }

  /** Dataset-level scoring: one narrow pass per image. */
  def score(ds: Dataset[MaskPair], iouThreshold: Double = 0.5): Dataset[PerImage] = {
    import ds.sparkSession.implicits._
    ds.map(mp => scorePair(mp.category, mp.trueLabels, mp.predLabels, iouThreshold))
  }

  /** The pixel-jaccard typed Aggregator: accumulates (inter, union)
    * over mask pairs; final value inter/union. Partial-aggregates
    * map-side (commutative + associative), so the shuffle carries two
    * longs per group, never pixels.
    */
  class JaccardAggregator extends Aggregator[(Array[Int], Array[Int]), (Long, Long), Double] {
    def zero: (Long, Long) = (0L, 0L)
    def reduce(b: (Long, Long), a: (Array[Int], Array[Int])): (Long, Long) = {
      var inter = 0L; var union = 0L
      var i = 0
      val (t, p) = a
      while (i < t.length) {
        val x = t(i) != 0; val y = p(i) != 0
        if (x && y) inter += 1
        if (x || y) union += 1
        i += 1
      }
      (b._1 + inter, b._2 + union)
    }
    def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) = (x._1 + y._1, x._2 + y._2)
    def finish(r: (Long, Long)): Double = if (r._2 == 0) 0.0 else r._1.toDouble / r._2
    def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** End-to-end benchmark from raw mask pairs: score each image, then
    * the category rollup of graft.dataset.Benchmarker.
    */
  def benchmark(ds: Dataset[MaskPair], iouThreshold: Double = 0.5): DataFrame =
    Benchmarker.benchmark(score(ds, iouThreshold).toDF(), "category")

  /** The A1 median-cell-size path declared for the benchmark too:
    * per-category cell-area median over the TRUE masks' `label_areas`,
    * exact (window rank — a per-category sort of every cell) next to
    * its 100 TB form (`percentile_approx`, one map-side-combinable
    * sketch pass; same mirror as q_a1_sketch_scale). The
    * `median_within_tol` column self-checks the sketch against the
    * exact value on the same data.
    *
    * Input: any DataFrame with a category column and an `array<int>`
    * labels column (e.g. `score`'s input masks via `toDF`).
    */
  def cellSizeMedianSketch(df: DataFrame, categoryCol: String = "category",
                           labelsCol: String = "trueLabels",
                           accuracy: Int = 10000): DataFrame = {
    val areas = df.select(col(categoryCol).as("category"),
      explode(map_values(call_function("label_areas", col(labelsCol))))
        .as("area"))
    val w = Window.partitionBy("category").orderBy("area")
    val exact = areas
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("category")))
      .filter(col("rn") === floor((col("cnt") + 1) / 2) ||
              col("rn") === floor((col("cnt") + 2) / 2))
      .groupBy("category").agg(avg("area").as("exact_median"))
    areas.groupBy("category")
      .agg(percentile_approx(col("area"), lit(0.5), lit(accuracy))
             .cast("double").as("approx_median"),
           count(lit(1)).as("n_cells"))
      .join(exact, Seq("category"))
      .withColumn("median_within_tol",
        abs(col("approx_median") - col("exact_median")) <=
          col("exact_median") * 0.05 + lit(1.0))
  }
}
