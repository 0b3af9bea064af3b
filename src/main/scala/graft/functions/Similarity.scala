package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Sign-bit bucket of one vector. The `Seq[Float]` a UDF decodes is
    * `immutable.List` (O(i) apply, O(n) length), so the vector is
    * unwrapped to a primitive array ONCE before the nBits x dim loop —
    * same hoist as Ivf.toArr, where skipping it cost O(d²) per row.
    */
  def bucketOf(vec: Seq[Float], planes: Array[Array[Double]]): Long = {
    val v = vec match {
      case w: scala.collection.immutable.ArraySeq.ofFloat => w.unsafeArray
      case _                                              => vec.toArray
    }
    var out = 0L
    var b = 0
    while (b < planes.length) {
      var dot = 0.0
      val p = planes(b)
      val n = math.min(p.length, v.length)
      var i = 0
      while (i < n) { dot += p(i) * v(i); i += 1 }
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

  /** Driver-side multi-probe bucket list: the probe's bucket plus all
    * buckets within `maxFlips` sign-bit flips. Hyperplanes are
    * deterministic driver values, so this needs no Spark job — which
    * is exactly what lets the bucket restriction become a pushable
    * `IN` filter instead of a join condition.
    */
  def probeBuckets(vec: Seq[Float], dim: Int, nBits: Int,
                   maxFlips: Int, seed: Long = 13L): Seq[Long] = {
    val qb = bucketOf(vec, hyperplanes(dim, nBits, seed))
    val out = scala.collection.mutable.ArrayBuffer(qb)
    if (maxFlips >= 1) (0 until nBits).foreach(b => out += (qb ^ (1L << b)))
    if (maxFlips >= 2)
      for (b1 <- 0 until nBits; b2 <- (b1 + 1) until nBits)
        out += (qb ^ (1L << b1) ^ (1L << b2))
    out.toSeq
  }

  /** ANN top-k against a known query vector: restrict the scan to
    * buckets within `maxFlips` bit flips of the query's bucket
    * (multi-probe LSH). The bucket list is computed on the driver and
    * planned as `bucket IN (...)` — a plain pushable filter, NOT a
    * join — so against a `bucket`-partitioned store (saveBucketedStore)
    * the scan prunes at planning time: with nBits=12 and maxFlips=1
    * that's 13 of 4096 partitions read. The query vector rides along
    * as a literal; cosine is computed only for surviving rows.
    *
    * If `df` lacks a `bucket` column one is derived on the fly (no
    * source pruning then, but still a narrow filter plan with no
    * BroadcastNestedLoopJoin).
    */
  def annTopKVec(df: DataFrame, idCol: String, vecCol: String,
                 queryVec: Seq[Float], k: Int, dim: Int, nBits: Int = 12,
                 maxFlips: Int = 1, seed: Long = 13L,
                 excludeId: Option[Long] = None): DataFrame = {
    val buckets = probeBuckets(queryVec, dim, nBits, maxFlips, seed)
    val bucketed =
      if (df.columns.contains("bucket")) df
      else withBucket(df, vecCol, dim, nBits, seed)
    bucketed
      .filter(col("bucket").isin(buckets: _*))
      .filter(excludeId.map(col(idCol) =!= _).getOrElse(lit(true)))
      .withColumn("cos_sim", cosineCol(col(vecCol), typedLit(queryVec)))
      .orderBy(desc("cos_sim"), col(idCol))
      .limit(k)
  }

  /** ANN top-k by probe id: one driver point-lookup for the probe's
    * vector, then the pruned `annTopKVec` plan.
    */
  def annTopK(df: DataFrame, idCol: String, vecCol: String,
              probeId: Long, k: Int, dim: Int, nBits: Int = 12,
              maxFlips: Int = 1, seed: Long = 13L): DataFrame = {
    val probeRow = df.filter(col(idCol) === probeId)
      .select(col(vecCol)).limit(1).collect().headOption
    probeRow match {
      case None =>
        // Absent probe id -> empty result (the pre-r2 join-based
        // implementation's contract), not a NoSuchElementException.
        df.sparkSession.createDataFrame(
          df.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          annTopKVec(df, idCol, vecCol, Seq.fill(dim)(0f), k, dim, nBits,
            maxFlips, seed).schema)
      case Some(row) =>
        val queryVec = row.getSeq[Float](0).toSeq
        annTopKVec(df, idCol, vecCol, queryVec, k, dim, nBits, maxFlips, seed,
          excludeId = Some(probeId))
    }
  }

  /** Write the embedding table partitioned by LSH bucket: the layout
    * that makes `annTopKVec`'s `bucket IN (...)` prune whole
    * directories at planning time. At 100 TB this is the difference
    * between reading ~0.3% of the corpus and all of it.
    */
  def saveBucketedStore(df: DataFrame, vecCol: String, path: String,
                        dim: Int, nBits: Int = 12, seed: Long = 13L): Unit =
    withBucket(df, vecCol, dim, nBits, seed)
      .write.mode("overwrite").partitionBy("bucket").parquet(path)

  /** ANN over a bucket-partitioned store written by
    * `saveBucketedStore`; the scan's partition filters prune to the
    * probed buckets.
    */
  def annTopKFromStore(spark: SparkSession, path: String, idCol: String,
                       vecCol: String, queryVec: Seq[Float], k: Int, dim: Int,
                       nBits: Int = 12, maxFlips: Int = 1, seed: Long = 13L,
                       excludeId: Option[Long] = None): DataFrame =
    annTopKVec(spark.read.parquet(path), idCol, vecCol, queryVec, k,
      dim, nBits, maxFlips, seed, excludeId)
}
