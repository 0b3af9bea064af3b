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

    // ---- ANN replay fixtures (round 13) ----------------------------------
    // The LSH/IVF ANN oracles replay bucket/cell assignment in DuckDB from
    // pinned parameters: the seeded hyperplanes (data-independent) and the
    // trained IVF codebook (a bit-deterministic function of the corpus —
    // Ivf.trainCentroids quantizes its Lloyd sums — keyed like the
    // signatures by corpus stats: count + an exact order-invariant
    // first-component checksum, since sf0.001 and sf0.01 both hold 500
    // vectors). Regenerate whenever the embeddings testdata or the ANN
    // parameters (dim 64, nBits 10, seed 13; k ~ sqrt(n), iters 3,
    // sampleCap 256k, seed 29) change.
    import spark.implicits._
    val planesOut =
      if (out.endsWith("signatures")) out.stripSuffix("signatures") + "hyperplanes"
      else out + "_hyperplanes"
    val centsOut =
      if (out.endsWith("signatures")) out.stripSuffix("signatures") + "ivf_centroids"
      else out + "_ivf_centroids"
    graft.functions.Similarity.hyperplanes(dim = 64, nBits = 10)
      .zipWithIndex
      .map { case (w, b) => (b, w.toSeq) }
      .toSeq.toDF("bit", "w")
      .coalesce(1)
      .write.mode("overwrite").parquet(planesOut)
    // the builder's sf1 point joins the centroid fixture when present
    // (141 x 64 doubles — metadata-scale, unlike the 26 MB sf1
    // signature set that stays uncommitted per the sf1-gate convention)
    val centDirs = dirs ++
      Seq("/tmp/graft-sf1").filter(d => new java.io.File(d).exists())
    // q_dedup_lsh_recall above the 5000-doc cap measures over the
    // doc_id % m == 0 subcorpus; its oracle needs signatures ONLY for
    // the sampled docs, which keeps the committed slice small. Driver
    // SFs have m = 1 (fully covered by the main fixture) and emit no
    // rows here.
    val sampledOut =
      if (out.endsWith("signatures")) out + "_sampled"
      else out + "_sampled"
    centDirs
      .map { dir =>
        val docs = spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("text"), col("n_chars"))
        val Array(n, nChars) = docs
          .agg(count(lit(1)), sum("n_chars")).head().toSeq.toArray
        val nDocs = n.asInstanceOf[Long]
        val mod = math.max(1L, (nDocs + 4999L) / 5000L)
        if (mod <= 1L) spark.emptyDataFrame
          .select(lit(0L).as("n_docs"), lit(0L).as("n_chars_total"),
            lit(0L).as("doc_id"), typedLit(Seq.empty[Long]).as("minhash"),
            lit(0L).as("simhash")).limit(0)
        else Dedup.withSimhash(
            Dedup.withMinhash(docs.filter(col("doc_id") % mod === 0),
              "text", numHashes = 128, shingleWidth = 3), "text")
          .select(lit(nDocs).as("n_docs"),
            lit(nChars.asInstanceOf[Long]).as("n_chars_total"),
            col("doc_id"), col("minhash"), col("simhash"))
      }
      .reduce(_ unionByName _)
      .coalesce(1)
      .write.mode("overwrite").parquet(sampledOut)
    centDirs
      .map { dir =>
        val e = spark.read.parquet(s"$dir/embeddings.parquet")
        val Array(n, chk) = e
          .agg(count(lit(1)),
            sum(floor(element_at(col("embedding"), 1).cast("double") * 1000000L)
              .cast("long")))
          .head().toSeq.toArray
        val nVecs = n.asInstanceOf[Long]
        val k = graft.functions.Ivf.codebookSize(nVecs)
        graft.functions.Ivf
          .trainCentroids(e, "vec_id", "embedding", k = k, iters = 3,
            sampleCap = 256L * k)
          .zipWithIndex
          .map { case (c, i) =>
            (nVecs, chk.asInstanceOf[Long], i, c.toSeq)
          }
          .toSeq.toDF("n_vecs", "chk", "cell", "centroid")
      }
      .reduce(_ unionByName _)
      .coalesce(1)
      .write.mode("overwrite").parquet(centsOut)
    spark.stop()
  }
}
