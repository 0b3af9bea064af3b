package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants of the corpus-statistics monitors the oracles can't
  * express: KL divergence is non-negative (Gibbs), and a natural
  * rank-frequency curve slopes downward.
  */
class ObservabilitySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  test("event-mix drift: KL >= 0 every day, and day totals partition the corpus") {
    val rows = SparkEntry.queries("q_evt_drift")(spark, sfDir).collect()
    assert(rows.length == 30)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0, s"KL negative on ${r.getString(0)}: ${r.getDouble(2)}")
    }
    val total = spark.read.parquet(s"$sfDir/events.parquet").count()
    assert(rows.map(_.getLong(1)).sum == total, "daily event counts must partition the corpus")
  }

  test("zipf fit: every language slopes downward over its ranked vocabulary") {
    val rows = SparkEntry.queries("q_txt_zipf")(spark, sfDir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      // the synthetic corpus has a ~31-word vocabulary per language;
      // the fit uses min(vocab, 100) ranked points
      assert(r.getLong(1) >= 20L && r.getLong(1) <= 100L,
        s"${r.getString(0)} fitted over ${r.getLong(1)} points")
      assert(r.getDouble(2) < 0.0, s"${r.getString(0)} rank curve must slope down, got ${r.getDouble(2)}")
    }
  }
}
