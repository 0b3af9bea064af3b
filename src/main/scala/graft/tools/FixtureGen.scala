package graft.tools

import graft.functions.Dedup
import org.apache.spark.sql.functions._

/** One-time generator for the committed signature fixture that backs
  * the q_dedup_minhash_pairs / q_dedup_simhash_pairs DuckDB oracles.
  *
  * DuckDB cannot compute Spark's xxhash64, so the SIGNATURE step
  * (text -> 128-long minhash, text -> 64-bit simhash) cannot replay in
  * SQL. It is instead pinned here: one parquet row per document per
  * test scale factor, keyed by (`n_docs`, `n_chars_total`) so one
  * fixture file serves every SF the driver gates on (sf0.001 and
  * sf0.01 both hold exactly 500 documents — corpus size alone does
  * not discriminate; total text length does). The oracle SQL
  * then verifies everything DOWNSTREAM of the signatures — banding,
  * bucket joins, pair dedup, estimate/hamming thresholds — from the
  * fixture, independently of the engine's join pipeline.
  *
  * Anti-circularity: the signature math itself is spec-verified
  * (native expressions equal the driver-side twin bit-for-bit —
  * MinhashSignatureSpec/DedupSpec — and the twin is plain published
  * MinHash/SimHash over Spark's public XXH64); what the fixture buys
  * is an independent replay of the PAIR pipeline, which is where the
  * scale-sensitive logic lives. Regenerate only if the testdata or
  * the signature parameters (128 hashes, 3-shingles, seed 7/42)
  * change: `sbt "runMain graft.tools.FixtureGen"`.
  */
object FixtureGen {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("fixtures/signatures")
    // extra args = explicit SF dirs (e.g. /tmp/graft-sf1 for the
    // uncommitted sf1 fixture oracle_sf1_sketchpairs.py replays);
    // default = the three driver-gated dirs the committed fixture pins
    val dirs =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("sf0.001", "sf0.01", "sf0.1").map(sf => s"/root/testdata/$sf")
    val spark = graft.core.GraftSession
      .builder(master = "local[8]", shufflePartitions = 8)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dirs
      .map { dir =>
        val docs = spark.read
          .parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("text"), col("n_chars"))
        val Array(n, nChars) = docs
          .agg(count(lit(1)), sum("n_chars")).head().toSeq.toArray
        Dedup.withSimhash(
            Dedup.withMinhash(docs, "text", numHashes = 128, shingleWidth = 3),
            "text")
          .select(lit(n).as("n_docs"), lit(nChars).as("n_chars_total"),
            col("doc_id"), col("minhash"), col("simhash"))
      }
      .reduce(_ unionByName _)
      .coalesce(1)
      .write.mode("overwrite").parquet(out)
    spark.stop()
  }
}
