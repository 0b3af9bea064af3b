package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Q._

/** Deduplication operators over `documents` — exact (hash-groupBy),
  * near-dup by n-gram Jaccard, and the scale-path MinHash/SimHash
  * variants (graft.functions.Dedup). The oracle-checked queries here
  * use engine-portable hashing (md5) and candidate keys so DuckDB can
  * replay them; the LSH pipelines are registered rows-only.
  */
object DedupQueries {

  /** Exact dedup census: total vs distinct md5(text). */
  private def qDedupExact(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .agg(count(lit(1)).as("n_docs"),
           countDistinct(md5(col("text"))).as("n_unique"))

  /** Exact-dedup survivor selection: keep min doc_id per content hash
    * (the classic keep-first policy), via window min — no shuffle of
    * the text payload itself, only the 128-bit key.
    */
  private def qDedupKeepFirst(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("fp")
    t(s, dir, "documents")
      .withColumn("fp", md5(col("text")))
      .withColumn("keeper", min("doc_id").over(w))
      .filter(col("doc_id") === col("keeper"))
      .select(col("doc_id"), col("fp"))
      .orderBy("doc_id")
  }

  /** Near-dup candidates by blocking key (lang, n_tokens) + exact
    * 3-shingle Jaccard on each candidate pair — the verification stage
    * of a MinHash pipeline, expressed relationally. Self-join is
    * restricted to equal blocking keys so it stays tractable at scale
    * (the LSH band-bucket join in graft.functions.Dedup is the
    * production path).
    */
  private def qDedupJaccardPairs(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents")
      .withColumn("tk", split(col("text"), " "))
      .withColumn("shingles",
        when(size(col("tk")) >= 3,
          array_distinct(transform(
            sequence(lit(0), size(col("tk")) - 3),
            i => concat_ws(" ",
              element_at(col("tk"), i + 1),
              element_at(col("tk"), i + 2),
              element_at(col("tk"), i + 3)))))
          .otherwise(array().cast("array<string>")))
      .select(col("doc_id"), col("lang"), size(col("tk")).as("n_tokens"), col("shingles"))
    val a = base.select(col("doc_id").as("doc_a"), col("lang"), col("n_tokens"),
                        col("shingles").as("sh_a"))
    val b = base.select(col("doc_id").as("doc_b"), col("lang"), col("n_tokens"),
                        col("shingles").as("sh_b"))
    a.join(b, Seq("lang", "n_tokens"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("uni") > 0)
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .filter(col("jaccard") >= 0.01)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("uni"), col("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** Coarse-key dedup (keep-first per (lang, source) group): the
    * grouped-min + count shape of a metadata-level dedup pass.
    */
  private def qDedupGroupKeeper(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy("lang", "source")
      .agg(min("doc_id").as("keeper"), count(lit(1)).as("n_members"))
      .orderBy("lang", "source")

  val defs: Map[String, QueryFn] = Map(
    "q_dedup_exact" -> qDedupExact _,
    "q_dedup_keep_first" -> qDedupKeepFirst _,
    "q_dedup_jaccard_pairs" -> qDedupJaccardPairs _,
    "q_dedup_group_keeper" -> qDedupGroupKeeper _,
  )

  val oracles: Map[String, String] = Map(
    "q_dedup_exact" ->
      "SELECT count(*) AS n_docs, count(DISTINCT md5(text)) AS n_unique FROM documents",
    "q_dedup_keep_first" ->
      """SELECT doc_id, fp FROM (
        |  SELECT doc_id, md5(text) AS fp,
        |    min(doc_id) OVER (PARTITION BY md5(text)) AS keeper
        |  FROM documents)
        |WHERE doc_id = keeper ORDER BY doc_id""".stripMargin,
    "q_dedup_jaccard_pairs" ->
      """WITH base AS (
        |  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens,
        |    CASE WHEN len(string_split(text, ' ')) >= 3 THEN
        |      list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
        |        i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2]))
        |    ELSE [] END AS shingles
        |  FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  len(list_intersect(a.shingles, b.shingles)) AS inter,
        |  len(list_distinct(list_concat(a.shingles, b.shingles))) AS uni,
        |  CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.shingles, b.shingles))) AS jaccard
        |FROM base a JOIN base b ON a.lang = b.lang AND a.n_tokens = b.n_tokens AND a.doc_id < b.doc_id
        |WHERE len(list_distinct(list_concat(a.shingles, b.shingles))) > 0
        |  AND CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.01
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q_dedup_group_keeper" ->
      """SELECT lang, source, min(doc_id) AS keeper, count(*) AS n_members
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,
  )
}
