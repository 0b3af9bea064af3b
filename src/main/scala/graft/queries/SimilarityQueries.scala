package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q._

/** Similarity search over the `embeddings` table (64-dim float
  * vectors). Brute-force cosine is the exact baseline (oracle-checked
  * against DuckDB with identical double arithmetic); the LSH-bucketed
  * ANN path lives in graft.functions.Similarity and is registered
  * rows-only.
  *
  * Numeric parity notes: vectors are cast float->double *before* any
  * arithmetic, dot products are sequential left-fold `aggregate`
  * (same order DuckDB evaluates `list_sum(list_transform(...))`), and
  * similarities are rounded to 6 decimals before they enter the
  * output or the sort key, so the hash compare never sees the last
  * ulp of a float expression.
  */
object SimilarityQueries {

  private def dvec(c: Column): Column = transform(c, _.cast("double"))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  private def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), _ + _))

  /** Brute-force cosine top-k: 10 nearest neighbors of vec_id = 0.
    * The probe vector is a broadcast single-row cross join — the same
    * shape a 1000-executor scan would use.
    */
  private def qSimTopk(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").withColumn("vec", dvec(col("embedding")))
    val probe = e.filter(col("vec_id") === 0).select(col("vec").as("qvec"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(probe))
      .withColumn("cos_sim",
        round(graft.functions.CosineSimilarity.cosineSim(col("vec"), col("qvec")), 6))
      .select(col("vec_id"), col("label"), col("cos_sim"))
      .orderBy(desc("cos_sim"), col("vec_id"))
      .limit(10)
  }

  /** The declared bound of [[qSimPairCount]]'s exact all-pairs stage:
    * both sides restrict to `vec_id < pairCountIdBound`, so the
    * cross-join cost is fixed at bound²/2 pairs at ANY corpus size.
    * Named (not a literal in the query text) so PlanAuditSpec can
    * assert the predicate is actually pushed into both parquet scans —
    * the same structural treatment as [[knnProbeBatch]]. The oracle
    * SQL interpolates this same constant, so the engine bound and the
    * DuckDB replay cannot drift apart.
    */
  val pairCountIdBound = 100

  /** Pairwise similarity join on a bounded id range (vec_id <
    * [[pairCountIdBound]] on both sides): counts pairs above threshold
    * per label pair — the exact-verification stage of an ANN pipeline.
    */
  private def qSimPairCount(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").filter(col("vec_id") < pairCountIdBound)
      .select(col("vec_id"), col("label"), dvec(col("embedding")).as("vec"))
    val a = e.select(col("vec_id").as("id_a"), col("label").as("label_a"), col("vec").as("va"))
    val b = e.select(col("vec_id").as("id_b"), col("label").as("label_b"), col("vec").as("vb"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim",
        round(graft.functions.CosineSimilarity.cosineSim(col("va"), col("vb")), 6))
      .filter(col("cos_sim") > 0.3)
      .groupBy(col("label_a"), col("label_b"))
      .agg(count(lit(1)).as("n_pairs"), max("cos_sim").as("max_sim"))
      .orderBy("label_a", "label_b")
  }

  /** Embedding-cosine near-duplicate census: candidate pairs blocked
    * on `label` (the natural blocking key — cluster/language/shard id
    * in a real corpus), exact cosine verify, then the per-label
    * keep-first drop census (`n_dup_docs` = docs that lose to an
    * earlier id). The blocked equi-join shuffles only on the key, so
    * the pipeline scales like the jaccard dedup path; the unblocked
    * scale path is the LSH-bucketed ANN store.
    */
  private def qDedupEmbedding(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"), dvec(col("embedding")).as("vec"))
    val a = e.select(col("label"), col("vec_id").as("id_a"), col("vec").as("va"))
    val b = e.select(col("label"), col("vec_id").as("id_b"), col("vec").as("vb"))
    a.join(b, Seq("label"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim",
        round(graft.functions.CosineSimilarity.cosineSim(col("va"), col("vb")), 6))
      .filter(col("cos_sim") >= 0.2)
      .groupBy("label")
      .agg(count(lit(1)).as("n_dup_pairs"),
        countDistinct(col("id_b")).as("n_dup_docs"),
        round(max("cos_sim"), 6).as("max_sim"))
      .orderBy("label")
  }

  /** Vector norms + dimensionality census (the sanity scan every
    * embedding pipeline starts with).
    */
  private def qSimNorms(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        size(col("embedding")).as("dim"),
        round(norm(dvec(col("embedding"))), 6).as("l2_norm"))
      .orderBy("vec_id")

  /** Per-label centroid norm: groupwise mean vector via exact decimal-
    * free arithmetic — implemented as posexplode + groupBy(pos) mean,
    * the distributed form of a centroid computation.
    */
  private def qSimCentroid(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("label"), posexplode(dvec(col("embedding"))).as(Seq("pos", "x")))
      .groupBy("label", "pos")
      .agg(count(lit(1)).as("n"), round(avg("x"), 6).as("mean_x"))
      .filter(col("pos") < 4)
      .orderBy("label", "pos")

  /** Batched k-NN join — N probes resolved in ONE corpus scan (the
    * retrieval/auto-labeling shape: nearest exemplars for a whole
    * query batch at once, not one scan per query). The probe batch is
    * EXPLICITLY capped: after the selection predicate, a deterministic
    * `ORDER BY vec_id LIMIT probeBatch` bounds the broadcast at
    * `probeBatch` rows no matter how large the corpus grows (the bare
    * `% 100` slice is 1% of the corpus — linear in data size, a
    * broadcast killer at 100×). The corpus scans once per batch, every
    * (row, probe) cosine evaluates in the scan task, and the per-probe
    * top-3 is a probe-partitioned window rank — parallel across
    * probes, never a global sort. At 100 TB a caller drains a large
    * probe set as a sequence of these fixed-size batches (one corpus
    * scan each); candidate pre-pruning for huge probe batches is the
    * IVF/LSH path (`q_sim_ann_*`).
    */
  val knnProbeBatch = 32

  private def qSimKnnJoin(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").withColumn("vec", dvec(col("embedding")))
    val probes = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("probe_id"), col("vec").as("qvec"))
      .orderBy("probe_id").limit(knnProbeBatch)
    val w = Window.partitionBy("probe_id").orderBy(desc("cos_sim"), col("vec_id"))
    e.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cos_sim",
        round(graft.functions.CosineSimilarity.cosineSim(col("vec"), col("qvec")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("probe_id"), col("vec_id"), col("label"), col("cos_sim"), col("rk"))
      .orderBy("probe_id", "rk")
  }

  /** Per-dimension corpus statistics over the embedding column — the
    * normalization pass an ANN index build runs first (mean-center /
    * scale per dimension, detect dead or saturated dimensions).
    *
    * Scale shape: posexplode fans each vector into d rows, but the
    * groupBy(dim) aggregate is PARTIAL — map-side combine reduces every
    * partition to at most d rows before the shuffle, so the exchange
    * carries d x partitions rows regardless of corpus size (the classic
    * map-side-combine census; .explain shows partial_count/partial_sum
    * under the scan).
    *
    * Determinism: cross-row float summation is order-dependent in
    * double, so sums are taken over the fixed-point quantization
    * floor(x * 1e6) — exact in both engines (float→double promotion is
    * value-preserving, the product is one IEEE op, floor has no
    * rounding ties) — making the oracle hash-stable under any partial-
    * aggregation order. min/max are order-free and kept on the same
    * quantized scale.
    */
  private def qEmbDimStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(posexplode(col("embedding")))
      .select((col("pos") + 1).cast("long").as("dim"),
        floor(col("col").cast("double") * 1000000d).as("q"))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"), sum("q").as("sum_q"),
        min("q").as("min_q"), max("q").as("max_q"))
      .orderBy("dim")

  val defs: Map[String, QueryFn] = Map(
    "q_emb_dim_stats" -> qEmbDimStats _,
    "q_sim_knn_join" -> qSimKnnJoin _,
    "q_sim_topk" -> qSimTopk _,
    "q_sim_pair_count" -> qSimPairCount _,
    "q_sim_norms" -> qSimNorms _,
    "q_sim_centroid" -> qSimCentroid _,
    "q_dedup_embedding" -> qDedupEmbedding _,
  )

  val oracles: Map[String, String] = Map(
    "q_emb_dim_stats" ->
      """SELECT dim, count(*) AS n,
        |  CAST(sum(CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT) AS sum_q,
        |  CAST(min(CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT) AS min_q,
        |  CAST(max(CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT) AS max_q
        |FROM (SELECT unnest(embedding) AS x,
        |        CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim
        |      FROM embeddings)
        |GROUP BY dim ORDER BY dim""".stripMargin,
    "q_sim_knn_join" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
        |p AS (SELECT vec_id AS probe_id, vec AS qvec FROM e WHERE vec_id % 100 = 0
        |      ORDER BY vec_id LIMIT 32),
        |s AS (
        |  SELECT p.probe_id, e.vec_id, e.label,
        |    round(list_sum(list_transform(range(1, len(e.vec) + 1), i -> e.vec[i] * p.qvec[i]))
        |      / (sqrt(list_sum(list_transform(e.vec, x -> x * x)))
        |         * sqrt(list_sum(list_transform(p.qvec, x -> x * x)))), 6) AS cos_sim
        |  FROM e, p WHERE e.vec_id <> p.probe_id),
        |r AS (SELECT *, row_number() OVER (
        |        PARTITION BY probe_id ORDER BY cos_sim DESC, vec_id) AS rk FROM s)
        |SELECT probe_id, vec_id, label, cos_sim, rk FROM r
        |WHERE rk <= 3 ORDER BY probe_id, rk""".stripMargin,
    "q_sim_topk" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
        |probe AS (SELECT vec FROM e WHERE vec_id = 0)
        |SELECT e.vec_id, e.label,
        |  round(list_sum(list_transform(range(1, len(e.vec) + 1), i -> e.vec[i] * probe.vec[i]))
        |    / (sqrt(list_sum(list_transform(e.vec, x -> x * x)))
        |       * sqrt(list_sum(list_transform(probe.vec, x -> x * x)))), 6) AS cos_sim
        |FROM e, probe WHERE e.vec_id <> 0
        |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin,
    "q_sim_pair_count" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec
        |  FROM embeddings WHERE vec_id < $pairCountIdBound),
        |pairs AS (
        |  SELECT a.label AS label_a, b.label AS label_b,
        |    round(list_sum(list_transform(range(1, len(a.vec) + 1), i -> a.vec[i] * b.vec[i]))
        |      / (sqrt(list_sum(list_transform(a.vec, x -> x * x)))
        |         * sqrt(list_sum(list_transform(b.vec, x -> x * x)))), 6) AS sim
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
        |SELECT label_a, label_b, count(*) AS n_pairs, max(sim) AS max_sim
        |FROM pairs WHERE sim > 0.3 GROUP BY label_a, label_b ORDER BY label_a, label_b""".stripMargin,
    "q_dedup_embedding" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
        |pairs AS (
        |  SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
        |    round(list_sum(list_transform(range(1, len(a.vec) + 1), i -> a.vec[i] * b.vec[i]))
        |      / (sqrt(list_sum(list_transform(a.vec, x -> x * x)))
        |         * sqrt(list_sum(list_transform(b.vec, x -> x * x)))), 6) AS sim
        |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
        |SELECT label, count(*) AS n_dup_pairs, count(DISTINCT id_b) AS n_dup_docs,
        |  round(max(sim), 6) AS max_sim
        |FROM pairs WHERE sim >= 0.2 GROUP BY label ORDER BY label""".stripMargin,
    "q_sim_norms" ->
      """SELECT vec_id, label, len(embedding) AS dim,
        |  round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))), 6) AS l2_norm
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_sim_centroid" ->
      """WITH ex AS (
        |  SELECT label, i - 1 AS pos, vec[i] AS x
        |  FROM (SELECT label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
        |       unnest(range(1, 65)) AS t(i))
        |SELECT label, pos, count(*) AS n, round(avg(x), 6) AS mean_x
        |FROM ex WHERE pos < 4 GROUP BY label, pos ORDER BY label, pos""".stripMargin,
  )
}
