package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q._

/** Feature-engineering audits over the order corpus — the encodings a
  * training pipeline derives from categorical columns before a model
  * ever sees them, censused with exact integer arithmetic so the same
  * numbers come out of any engine. The shared label is "the order had
  * a late lineitem" (>60 days past the order date — the
  * [[RelationalQueries]] Q4 lateness convention), derived once per
  * query from a single lineitem⋈orders shuffle whose groupBy(orderkey)
  * reuses the join partitioning.
  */
object FeatureQueries {

  /** One row per order: its priority class and whether any line shipped
    * late. One fact shuffle; the aggregation is partial-aggregatable.
    */
  private def orderLateLabel(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderpriority"))
      .agg(max(when(col("l_shipdate") > date_add(col("o_orderdate"), 60), 1L)
        .otherwise(0L)).as("late"))
  }

  /** Leave-one-out target encoding census (the Micci-Barreca 2001
    * family): for category = order priority and target = late flag,
    * the LOO encode of every row takes one of exactly TWO values per
    * category — (pos_c − 1)/(n_c − 1) for positive rows and
    * pos_c/(n_c − 1) for negative ones — so the encoding is emitted in
    * closed form per category rather than per row, alongside the
    * m-estimate smoothed encode (m = 10 against the global prior).
    * Every cross-row quantity is an integer count; division happens
    * once per output cell at ppm emission.
    *
    * Scale shape: the label relation is one fact shuffle
    * ([[orderLateLabel]]); the census is a |priority|-row groupBy plus
    * a 1-row global-prior aggregate joined by broadcast. Nothing
    * row-sized survives past the first aggregation.
    */
  private def qFeatTargetEnc(s: SparkSession, dir: String): DataFrame = {
    val lab = orderLateLabel(s, dir)
    val cat = lab.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("late")).as("n_pos"))
    val prior = lab.agg(count(lit(1)).as("n_tot"), sum(col("late")).as("p_tot"))
    cat.crossJoin(broadcast(prior))
      .select(col("o_orderpriority"), col("n"), col("n_pos"),
        // a singleton category has NO leave-one-out peers: NULL, never
        // the Infinity->Long.MaxValue sentinel a raw /0 would emit
        when(col("n") > 1L,
          floor(lit(1000000L) * (col("n_pos") - 1L) / (col("n") - 1L))
            .cast("long")).as("loo_pos_ppm"),
        when(col("n") > 1L,
          floor(lit(1000000L) * col("n_pos") / (col("n") - 1L))
            .cast("long")).as("loo_neg_ppm"),
        round(lit(1000000.0) *
          (col("n_pos") + lit(10.0) * col("p_tot") / col("n_tot")) /
          (col("n") + lit(10.0))).cast("long").as("smoothed_ppm"))
      .orderBy("o_orderpriority")
  }

  /** Weight-of-evidence + information value census (the credit-scoring
    * feature audit): per priority class, WoE = ln((pos_c/P)/(neg_c/Q))
    * with the standard 0.5 continuity correction on both cell counts
    * (so an empty cell yields a large finite WoE, never ±∞), and the
    * IV term (pos_c/P − neg_c/Q)·WoE. The ln enters once per
    * category on identical integer-ratio operands in both engines;
    * each term quantizes to nano units as a long BEFORE the
    * total-IV sum, so the only cross-row float never exists.
    *
    * Scale shape: identical to [[qFeatTargetEnc]] — one fact shuffle to
    * the label relation, a |priority|-row census, a broadcast 1-row
    * totals join. The IV total is re-emitted on every row (a census
    * column, not a second query).
    */
  private def qFeatWoe(s: SparkSession, dir: String): DataFrame = {
    val lab = orderLateLabel(s, dir)
    val cat = lab.groupBy(col("o_orderpriority"))
      .agg(sum(col("late")).as("pos"),
        sum(lit(1L) - col("late")).as("neg"))
    val tot = lab.agg(sum(col("late")).as("p_tot"),
      sum(lit(1L) - col("late")).as("q_tot"))
    val terms = cat.crossJoin(broadcast(tot))
      .withColumn("woe_nnat",
        round(lit(1e9) * log(((col("pos") + lit(0.5)) * col("q_tot")) /
          ((col("neg") + lit(0.5)) * col("p_tot")))).cast("long"))
      .withColumn("iv_nnat",
        round((col("pos").cast("double") / col("p_tot") -
          col("neg").cast("double") / col("q_tot")) * col("woe_nnat"))
          .cast("long"))
    val ivTot = terms.agg(sum(col("iv_nnat")).as("iv_total_nnat"))
    terms.crossJoin(broadcast(ivTot))
      .select(col("o_orderpriority"), col("pos"), col("neg"),
        col("woe_nnat"), col("iv_nnat"), col("iv_total_nnat"))
      .orderBy("o_orderpriority")
  }

  val defs: Map[String, QueryFn] = Map(
    "q_feat_target_enc" -> qFeatTargetEnc _,
    "q_feat_woe" -> qFeatWoe _,
  )

  private val labelCte =
    """lab AS (
      |  SELECT o_orderkey, o_orderpriority,
      |         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
      |             THEN 1 ELSE 0 END) AS late
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY 1, 2)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_feat_target_enc" ->
      s"""WITH $labelCte,
         |cat AS (SELECT o_orderpriority, count(*) AS n, sum(late) AS n_pos
         |        FROM lab GROUP BY 1),
         |prior AS (SELECT count(*) AS n_tot, sum(late) AS p_tot FROM lab)
         |SELECT o_orderpriority, n, CAST(n_pos AS BIGINT) AS n_pos,
         |  CASE WHEN n > 1 THEN CAST(floor(1000000 * (n_pos - 1) / (n - 1)) AS BIGINT)
         |  END AS loo_pos_ppm,
         |  CASE WHEN n > 1 THEN CAST(floor(1000000 * n_pos / (n - 1)) AS BIGINT)
         |  END AS loo_neg_ppm,
         |  CAST(round(1000000.0 * (n_pos + 10.0 * p_tot / n_tot) / (n + 10.0))
         |       AS BIGINT) AS smoothed_ppm
         |FROM cat, prior ORDER BY o_orderpriority""".stripMargin,
    "q_feat_woe" ->
      s"""WITH $labelCte,
         |cat AS (SELECT o_orderpriority, sum(late) AS pos,
         |               sum(1 - late) AS neg
         |        FROM lab GROUP BY 1),
         |tot AS (SELECT sum(late) AS p_tot, sum(1 - late) AS q_tot FROM lab),
         |terms AS (
         |  SELECT o_orderpriority, pos, neg,
         |    CAST(round(1e9 * ln(((pos + 0.5) * q_tot) /
         |      ((neg + 0.5) * p_tot))) AS BIGINT) AS woe_nnat
         |  FROM cat, tot),
         |iv AS (
         |  SELECT t.*, CAST(round((CAST(pos AS DOUBLE) / p_tot -
         |    CAST(neg AS DOUBLE) / q_tot) * woe_nnat) AS BIGINT) AS iv_nnat
         |  FROM terms t, tot)
         |SELECT o_orderpriority, CAST(pos AS BIGINT) AS pos,
         |  CAST(neg AS BIGINT) AS neg, woe_nnat, iv_nnat,
         |  (SELECT CAST(sum(iv_nnat) AS BIGINT) FROM iv) AS iv_total_nnat
         |FROM iv ORDER BY o_orderpriority""".stripMargin,
  )
}
