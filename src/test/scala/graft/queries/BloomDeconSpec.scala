package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** What the oracle can't see about q_txt_bloom_decon: that the Bloom
  * prune actually sits in the plan ahead of the exact join, and that
  * it is selective (a no-op filter would also pass the hash gate).
  */
class BloomDeconSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  test("bloom prune is in the plan before the exact join, and it prunes") {
    val df = SparkEntry.queries("q_txt_bloom_decon")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"bloom probe missing from the plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), "exact verify must stay a broadcast join")

    // selectivity: count corpus shingles surviving the probe vs total.
    // On this corpus the benchmark slice is ~1% of docs, so a working
    // 1e6-bit filter must discard the vast majority of shingles.
    import spark.implicits._
    val sh = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), explode(Q.shingleHashes3(split(col("text"), " "))).as("sh"))
    val bench = sh.filter(col("doc_id") % 100 === 0).select("sh").distinct()
    val bloom = bench
      .agg(call_function("bloom_agg", col("sh"), lit(100000L), lit(1000000L)))
      .collect()(0).getAs[Array[Byte]](0)
    val corpus = sh.filter(col("doc_id") % 100 =!= 0).cache()
    try {
      val total = corpus.count()
      val kept = corpus
        .filter(call_function("bloom_might_contain", lit(bloom), col("sh"))).count()
      val exact = corpus.join(bench, Seq("sh"), "left_semi").count()
      assert(kept >= exact, "bloom must never drop a true member (no false negatives)")
      assert(kept < total / 2, s"bloom kept $kept of $total shingles - not selective")
    } finally corpus.unpersist()
  }
}
