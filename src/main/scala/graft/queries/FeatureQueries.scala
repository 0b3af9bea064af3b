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

  /** Distributed ordinary least squares by Gram-matrix sufficient
    * statistics — the one-pass linear-model fit every feature pipeline
    * ends in (predict price cents from quantity and discount points,
    * per return flag): the normal equations X'X β = X'y need only the
    * d² = 9 Gram sums and d = 3 moment sums, each an EXACT-integer
    * partial-aggregable aggregate (quantity, discount points and
    * price cents are all exact integers; the one product that can
    * outgrow a long — Σy² — rides a decimal(38)), so the per-group
    * model state crossing the exchange is ~10 numbers regardless of
    * row count. The 'ALL' pooled fit is rebuilt by ADDING the
    * per-mode statistics — Gram matrices merge like counters, which
    * is exactly how a 1000-executor fit (or a federated one) composes
    * without a second scan. The 3×3 solve runs per OUTPUT ROW by
    * Cramer's rule on doubles converted from the exact sums: same
    * integer operands and same expression tree ⇒ bit-identical
    * coefficients in any IEEE engine, which is what lets the fit
    * itself cross the hash gate (R² likewise, from the β'X'y
    * identity). At 100 TB this shape — scan → tiny Gram partials →
    * closed-form solve — replaces a gradient loop for any d where
    * d² doubles fit a partial (thousands of features).
    */
  private def qFeatOls(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(
      col("l_returnflag").as("flag"),
      dec("l_quantity").cast("long").as("x1"),
      (dec("l_discount") * 100).cast("long").as("x2"),
      (dec("l_extendedprice") * 100).cast("long").as("y"))
    val gm = li.groupBy("flag").agg(
      count(lit(1)).as("n"),
      sum("x1").as("s1"), sum("x2").as("s2"), sum("y").as("sy"),
      sum(col("x1") * col("x1")).as("s11"),
      sum(col("x1") * col("x2")).as("s12"),
      sum(col("x2") * col("x2")).as("s22"),
      sum(col("x1") * col("y")).as("s1y"),
      sum(col("x2") * col("y")).as("s2y"),
      sum(col("y").cast("decimal(38,0)") * col("y")).as("syy"))
    val pooled = gm.groupBy().agg(
      sum("n").as("n"), sum("s1").as("s1"), sum("s2").as("s2"),
      sum("sy").as("sy"), sum("s11").as("s11"), sum("s12").as("s12"),
      sum("s22").as("s22"), sum("s1y").as("s1y"), sum("s2y").as("s2y"),
      sum("syy").as("syy"))
      .select(lit("ALL").as("flag"), col("n"), col("s1"), col("s2"),
        col("sy"), col("s11"), col("s12"), col("s22"), col("s1y"),
        col("s2y"), col("syy"))
    val st = gm.unionByName(pooled).select(col("flag"), col("n"),
      col("n").cast("double").as("a00"),
      col("s1").cast("double").as("a01"),
      col("s2").cast("double").as("a02"),
      col("s11").cast("double").as("a11"),
      col("s12").cast("double").as("a12"),
      col("s22").cast("double").as("a22"),
      col("sy").cast("double").as("b0"),
      col("s1y").cast("double").as("b1"),
      col("s2y").cast("double").as("b2"),
      col("syy").cast("double").as("byy"))
    val det = col("a00") * (col("a11") * col("a22") - col("a12") * col("a12")) -
      col("a01") * (col("a01") * col("a22") - col("a12") * col("a02")) +
      col("a02") * (col("a01") * col("a12") - col("a11") * col("a02"))
    val detX0 = col("b0") * (col("a11") * col("a22") - col("a12") * col("a12")) -
      col("a01") * (col("b1") * col("a22") - col("a12") * col("b2")) +
      col("a02") * (col("b1") * col("a12") - col("a11") * col("b2"))
    val detX1 = col("a00") * (col("b1") * col("a22") - col("a12") * col("b2")) -
      col("b0") * (col("a01") * col("a22") - col("a12") * col("a02")) +
      col("a02") * (col("a01") * col("b2") - col("b1") * col("a02"))
    val detX2 = col("a00") * (col("a11") * col("b2") - col("b1") * col("a12")) -
      col("a01") * (col("a01") * col("b2") - col("b1") * col("a02")) +
      col("b0") * (col("a01") * col("a12") - col("a11") * col("a02"))
    st.withColumn("c0", detX0 / det)
      .withColumn("c1", detX1 / det)
      .withColumn("c2", detX2 / det)
      .withColumn("sse", col("byy") -
        (col("c0") * col("b0") + col("c1") * col("b1") + col("c2") * col("b2")))
      .withColumn("sst", col("byy") - col("b0") * col("b0") / col("a00"))
      .select(col("flag"), col("n"),
        round(col("c0"), 4).as("b0_cents"),
        round(col("c1"), 4).as("b1_cents"),
        round(col("c2"), 4).as("b2_cents"),
        round(lit(1.0) - col("sse") / col("sst"), 6).as("r2"))
      .orderBy("flag")
  }

  val defs: Map[String, QueryFn] = Map(
    "q_feat_target_enc" -> qFeatTargetEnc _,
    "q_feat_woe" -> qFeatWoe _,
    "q_feat_ols" -> qFeatOls _,
  )

  private val labelCte =
    """lab AS (
      |  SELECT o_orderkey, o_orderpriority,
      |         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
      |             THEN 1 ELSE 0 END) AS late
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY 1, 2)""".stripMargin

  val oracles: Map[String, String] = Map(
    // Full-law replay: exact-integer Gram sums, then the SAME Cramer
    // expression tree on doubles — identical operands + identical IEEE
    // ops = identical coefficients, so the fit crosses the hash gate.
    "q_feat_ols" ->
      """WITH li AS (
        |  SELECT l_returnflag AS flag,
        |    CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT) AS x1,
        |    CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS x2,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
        |  FROM lineitem),
        |gm AS (
        |  SELECT flag, count(*) AS n, sum(x1) AS s1, sum(x2) AS s2,
        |    sum(y) AS sy, sum(x1*x1) AS s11, sum(x1*x2) AS s12,
        |    sum(x2*x2) AS s22, sum(x1*y) AS s1y, sum(x2*y) AS s2y,
        |    sum(y*y) AS syy
        |  FROM li GROUP BY 1),
        |un AS (SELECT * FROM gm
        |       UNION ALL
        |       SELECT 'ALL', sum(n), sum(s1), sum(s2), sum(sy), sum(s11),
        |              sum(s12), sum(s22), sum(s1y), sum(s2y), sum(syy)
        |       FROM gm),
        |st AS (SELECT flag, CAST(n AS BIGINT) AS n,
        |  CAST(n AS DOUBLE) AS a00, CAST(s1 AS DOUBLE) AS a01,
        |  CAST(s2 AS DOUBLE) AS a02, CAST(s11 AS DOUBLE) AS a11,
        |  CAST(s12 AS DOUBLE) AS a12, CAST(s22 AS DOUBLE) AS a22,
        |  CAST(sy AS DOUBLE) AS b0, CAST(s1y AS DOUBLE) AS b1,
        |  CAST(s2y AS DOUBLE) AS b2, CAST(syy AS DOUBLE) AS byy
        |  FROM un),
        |sol AS (SELECT flag, n, b0, b1, b2, byy, a00,
        |  (a00*(a11*a22 - a12*a12) - a01*(a01*a22 - a12*a02)
        |     + a02*(a01*a12 - a11*a02)) AS det,
        |  (b0*(a11*a22 - a12*a12) - a01*(b1*a22 - a12*b2)
        |     + a02*(b1*a12 - a11*b2)) AS dx0,
        |  (a00*(b1*a22 - a12*b2) - b0*(a01*a22 - a12*a02)
        |     + a02*(a01*b2 - b1*a02)) AS dx1,
        |  (a00*(a11*b2 - b1*a12) - a01*(a01*b2 - b1*a02)
        |     + b0*(a01*a12 - a11*a02)) AS dx2
        |  FROM st),
        |co AS (SELECT flag, n, dx0/det AS c0, dx1/det AS c1, dx2/det AS c2,
        |              b0, b1, b2, byy, a00 FROM sol)
        |SELECT flag, n,
        |  round(c0, 4) AS b0_cents, round(c1, 4) AS b1_cents,
        |  round(c2, 4) AS b2_cents,
        |  round(1.0 - (byy - (c0*b0 + c1*b1 + c2*b2))
        |              / (byy - b0*b0/a00), 6) AS r2
        |FROM co ORDER BY flag""".stripMargin,
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
