package graft.dataset

import graft.SparkSpec

class DetectionMetricsSpec extends SparkSpec {

  private def mask(n: Int, cells: (Int, Int, Int, Int)*): Array[Int] = {
    // (r0, c0, size, id)
    val out = new Array[Int](n * n)
    cells.foreach { case (r0, c0, sz, id) =>
      for (r <- r0 until r0 + sz; c <- c0 until c0 + sz) out(r * n + c) = id
    }
    out
  }

  test("scorePair: perfect prediction -> full recall/precision") {
    val t = mask(20, (0, 0, 5, 1), (10, 10, 5, 2))
    val s = DetectionMetrics.scorePair("a", t, t.clone())
    assert(s.n_true == 2 && s.n_pred == 2 && s.correct_detections == 2)
    assert(s.inter == s.union)
  }

  test("scorePair: missed and hallucinated cells counted") {
    val t = mask(20, (0, 0, 5, 1), (10, 10, 5, 2))
    val p = mask(20, (0, 0, 5, 7), (14, 2, 4, 9)) // matches cell 1; cell 2 missed; 9 is spurious
    val s = DetectionMetrics.scorePair("a", t, p)
    assert(s.n_true == 2 && s.n_pred == 2 && s.correct_detections == 1)
  }

  test("benchmark from raw masks: rollup with recall/precision/f1/jaccard") {
    import spark.implicits._
    val pairs = Seq(
      DetectionMetrics.MaskPair("breast", mask(20, (0, 0, 5, 1)), mask(20, (0, 0, 5, 3))),
      DetectionMetrics.MaskPair("lung", mask(20, (0, 0, 5, 1), (10, 10, 4, 2)),
        mask(20, (0, 0, 5, 1))))
    val out = DetectionMetrics.benchmark(spark.createDataset(pairs))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("breast").getAs[Double]("recall") == 1.0)
    assert(out("lung").getAs[Double]("recall") == 0.5)
    assert(out("all").getAs[Long]("n_true") == 3)
    assert(math.abs(out("all").getAs[Double]("recall") - 2.0 / 3) < 1e-12)
  }

  test("cellSizeMedianSketch: sketch matches exact window median") {
    import spark.implicits._
    // odd counts so the exact rank-median is an element the sketch
    // can return exactly: cat A areas 1,2,3,4,100 -> 3; cat B areas
    // 2,2,8,8,8 -> 8
    def mask(areas: Seq[Int]): Array[Int] = {
      val out = Array.fill(areas.sum)(0)
      var pos = 0
      areas.zipWithIndex.foreach { case (a, i) =>
        (0 until a).foreach { k => out(pos + k) = i + 1 }; pos += a
      }
      out
    }
    val df = Seq(
      ("A", mask(Seq(1, 2, 3))), ("A", mask(Seq(4, 100))),
      ("B", mask(Seq(2, 8))), ("B", mask(Seq(8, 2, 8)))).toDF("category", "trueLabels")
    val out = DetectionMetrics.cellSizeMedianSketch(df)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("A").getAs[Long]("n_cells") == 5)
    assert(out("A").getAs[Double]("exact_median") == 3.0)
    assert(out("A").getAs[Double]("approx_median") == 3.0)
    assert(out("B").getAs[Double]("exact_median") == 8.0)
    assert(out("B").getAs[Double]("approx_median") == 8.0)
    assert(out.values.forall(_.getAs[Boolean]("median_within_tol")))
  }

  test("JaccardAggregator: map-side combine over mask pairs") {
    import spark.implicits._
    val agg = new DetectionMetrics.JaccardAggregator().toColumn
    val ds = spark.createDataset(Seq(
      (Array(1, 1, 0, 0), Array(1, 0, 1, 0)),
      (Array(2, 2, 2, 0), Array(2, 2, 0, 0))))
    val j = ds.select(agg).collect().head
    // pair1: inter 1, union 3; pair2: inter 2, union 3 => 3/6
    assert(math.abs(j - 0.5) < 1e-12)
  }
}
