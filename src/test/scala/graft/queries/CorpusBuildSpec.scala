package graft.queries

import graft.SparkSpec

/** The round-4 scan-sharing contract of the corpus-build flagship:
  * every stage (exact dedup, pair pipeline, decontamination, census)
  * reads the ONE materialized docBase projection, so the final plan
  * contains no parquet scan of documents at all — the scan happened
  * exactly once, inside the localCheckpoint.
  */
class CorpusBuildSpec extends SparkSpec {

  test("q_corpus_build plan reads the shared checkpoint, not parquet") {
    val df = graft.SparkEntry.queries("q_corpus_build")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("parquet"),
      "a stage re-scanned documents instead of the shared projection")
    // the stages are still all present: two left-anti subtractions
    // (near-dup drop, decontamination) over the checkpointed base
    val joins = "LeftAnti".r.findAllIn(plan).length
    assert(joins == 2, s"expected 2 anti-join subtractions, got $joins")
    // and the result is the expected per-language census
    val rows = df.collect()
    assert(rows.nonEmpty && rows.map(_.getString(0)).distinct.length == rows.length)
  }
}
