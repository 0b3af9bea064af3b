package graft.dataset

import graft.SparkSpec

/** Mirrors dataset_benchmarker.py:73-121 with hand-computed numbers. */
class BenchmarkerSpec extends SparkSpec {

  test("benchmark aggregates per category plus the 'all' rollup row") {
    import spark.implicits._
    val perImage = Seq(
      // tissue, n_true, n_pred, correct, inter, union
      ("breast", 10L, 8L, 6L, 50L, 100L),
      ("breast", 10L, 12L, 8L, 30L, 60L),
      ("lung", 20L, 20L, 20L, 80L, 80L)
    ).toDF("tissue", "n_true", "n_pred", "correct_detections", "inter", "union")
    val out = Benchmarker.benchmark(perImage, "tissue").collect()
      .map(r => r.getString(0) -> r).toMap
    val breast = out("breast")
    assert(breast.getAs[Long]("n_true") == 20L)
    assert(math.abs(breast.getAs[Double]("recall") - 14.0 / 20) < 1e-12)
    assert(math.abs(breast.getAs[Double]("precision") - 14.0 / 20) < 1e-12)
    assert(math.abs(breast.getAs[Double]("jaccard") - 80.0 / 160) < 1e-12)
    val all = out("all")
    assert(all.getAs[Long]("n_images") == 3L)
    assert(math.abs(all.getAs[Double]("recall") - 34.0 / 40) < 1e-12)
    val lung = out("lung")
    assert(math.abs(lung.getAs[Double]("f1") - 1.0) < 1e-12)
  }
}
