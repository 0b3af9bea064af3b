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
