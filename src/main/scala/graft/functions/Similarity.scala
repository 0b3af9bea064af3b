package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate nearest-neighbor search over embedding columns.
  *
  * Brute-force cosine (the exact baseline, oracle-checked in
  * SimilarityQueries) scans every vector — fine as one distributed
  * pass. The scale path is random-hyperplane LSH (Charikar '02):
  * vectors hash to sign-bit buckets; probing compares the query only
  * against its bucket (and optionally neighboring buckets), turning a
  * full scan into a partition-pruned lookup. Bucket ids are plain
  * columns, so a 100 TB corpus can be written partitioned/bucketed by
  * them and ANN queries prune at the source.
  */
object Similarity {

  /** Deterministic seeded hyperplanes (dim x nBits). */
  def hyperplanes(dim: Int, nBits: Int, seed: Long = 13L): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(nBits)(Array.fill(dim)(rng.nextGaussian()))
  }

  /** Sign-bit bucket of one vector. */
  def bucketOf(vec: Seq[Float], planes: Array[Array[Double]]): Long = {
    var out = 0L
    var b = 0
    while (b < planes.length) {
      var dot = 0.0
      val p = planes(b)
      var i = 0
      while (i < p.length && i < vec.length) { dot += p(i) * vec(i); i += 1 }
      if (dot >= 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Add an LSH `bucket` column. */
  def withBucket(df: DataFrame, vecCol: String, dim: Int, nBits: Int = 12,
                 seed: Long = 13L): DataFrame = {
    val planes = hyperplanes(dim, nBits, seed)
    val bkt = udf((v: Seq[Float]) => bucketOf(v, planes))
    df.withColumn("bucket", bkt(col(vecCol)))
  }

  /** Native codegen'd expression (graft.functions.CosineSimilarity):
    * one fused primitive loop instead of aggregate(zip_with(...))'s
    * per-row intermediate arrays; numerically identical (double,
    * left-to-right).
    */
  def cosineCol(a: Column, b: Column): Column =
    CosineSimilarity.cosineSim(a, b)

  /** Exact brute-force top-k neighbors of `probeId`. */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
                     probeId: Long, k: Int): DataFrame = {
    val probe = df.filter(col(idCol) === probeId)
      .select(col(vecCol).as("__qvec"))
    df.filter(col(idCol) =!= probeId)
      .crossJoin(broadcast(probe))
      .withColumn("cos_sim", cosineCol(col(vecCol), col("__qvec")))
      .drop("__qvec")
      .orderBy(desc("cos_sim"), col(idCol))
      .limit(k)
  }

  /** ANN top-k: restrict the scan to buckets within `maxFlips` bit
    * flips of the probe's bucket (multi-probe LSH). With nBits=12 and
    * maxFlips=1 that's 13 of 4096 buckets — a ~300x scan reduction at
    * equal recall for clustered data.
    */
  def annTopK(df: DataFrame, idCol: String, vecCol: String,
              probeId: Long, k: Int, dim: Int, nBits: Int = 12,
              maxFlips: Int = 1, seed: Long = 13L): DataFrame = {
    val planes = hyperplanes(dim, nBits, seed)
    val bkt = udf((v: Seq[Float]) => bucketOf(v, planes))
    val bucketed = df.withColumn("bucket", bkt(col(vecCol)))
    val probeRow = bucketed.filter(col(idCol) === probeId)
      .select(col(vecCol).as("__qvec"), col("bucket").as("__qbucket"))
    val probeBuckets = udf((qb: Long) => {
      val out = scala.collection.mutable.ArrayBuffer(qb)
      if (maxFlips >= 1) (0 until nBits).foreach(b => out += (qb ^ (1L << b)))
      if (maxFlips >= 2)
        for (b1 <- 0 until nBits; b2 <- (b1 + 1) until nBits)
          out += (qb ^ (1L << b1) ^ (1L << b2))
      out.toSeq
    })
    bucketed.filter(col(idCol) =!= probeId)
      .join(broadcast(probeRow.withColumn("__probe_buckets", probeBuckets(col("__qbucket")))),
        array_contains(col("__probe_buckets"), col("bucket")))
      .withColumn("cos_sim", cosineCol(col(vecCol), col("__qvec")))
      .drop("__qvec", "__qbucket", "__probe_buckets")
      .orderBy(desc("cos_sim"), col(idCol))
      .limit(k)
  }
}
