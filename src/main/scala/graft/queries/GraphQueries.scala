package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q._

/** Graph analytics over relations — the entity-importance /
  * link-structure family a curation pipeline uses to weight sources
  * (PageRank over a bipartite trade graph here; the dedup cluster
  * graph is the other natural edge source, covered by
  * `q_dedup_components`).
  */
object GraphQueries {

  /** Power-iteration rounds for [[qGraphPagerank]] (shared with the
    * unrolled oracle so depth cannot drift).
    */
  val prIters = 3

  /** PageRank (damping 0.85, Brin & Page 1998) over the UNDIRECTED
    * customer↔supplier graph induced by orders⋈lineitem — "which
    * counterparties sit at the center of the trade network". Both
    * directions are materialized as directed edges, so every node has
    * out-degree >= 1 and the dangling-mass correction disappears by
    * construction.
    *
    * Scale shape: each of the [[prIters]] rounds is edges⋈ranks (an
    * equi-join on the 8-byte node id) + one partial-aggregatable
    * groupBy(dst) — the standard message-passing round, all shuffles
    * on node id, nothing driver-side and no per-round collect. The
    * degree-joined edge list is MATERIALIZED once to a parquet
    * checkpoint before iterating (the Pregel-superstep discipline):
    * left in the lazy plan, the orders⋈lineitem→distinct lineage is
    * textually repeated per round and AQE's stage reuse does not
    * unify all of them — measured 29 s at sf1 recomputing a 6M-row
    * join ~5×, vs one build + cheap per-round scans of the ~10 MB
    * edge table. Same move as graft.functions.Ivf's cell store.
    *
    * Determinism (hash-gate contract): ranks live as integer
    * micro-units (r0 = 1e6). A round sends floor(r/deg) along each
    * edge (exact integer division), sums exactly, and re-ranks as
    * 150000 + floor(0.85·Σ) — one double multiply+floor per node, so
    * no accumulation-order noise can enter the gate.
    */
  private def qGraphPagerank(s: SparkSession, dir: String): DataFrame = {
    // nid encodes the bipartite side: customer 2k, supplier 2k+1
    val pairs = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .join(t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("sp"))
      .distinct()
    val edges = pairs.select(col("c").as("src"), col("sp").as("dst"))
      .union(pairs.select(col("sp").as("src"), col("c").as("dst")))
    val degPlan = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val ckpt = java.nio.file.Files.createTempDirectory("q_graph_edges").toString
    edges.join(degPlan, Seq("src")).write.mode("overwrite").parquet(ckpt)
    val edgesD = s.read.parquet(ckpt)
    val deg = edgesD.select(col("src"), col("deg")).distinct()

    var ranks = deg.select(col("src").as("node"), lit(1000000L).as("rq"))
    for (_ <- 1 to prIters) {
      ranks = edgesD
        .join(ranks, edgesD("src") === ranks("node"))
        .select(col("dst"),
          floor(col("rq").cast("double") / col("deg")).as("msg"))
        .groupBy("dst")
        .agg(sum("msg").as("m"))
        .select(col("dst").as("node"),
          (floor(col("m").cast("double") * 0.85) + 150000L).as("rq"))
    }
    ranks
      .join(deg.withColumnRenamed("src", "node"), Seq("node"))
      .select(when(pmod(col("node"), lit(2)) === 0, lit("customer"))
          .otherwise(lit("supplier")).as("node_type"),
        (col("node") / 2).cast("long").as("key"),
        col("deg"), col("rq"))
      .orderBy("node_type", "key")
  }

  /** Unrolled DuckDB replay of [[qGraphPagerank]]. */
  private def prOracle: String = {
    def iter(k: Int): String =
      s"""r$k AS (SELECT dst AS node,
         |  CAST(floor(CAST(sum(CAST(floor(CAST(rq AS DOUBLE) / deg) AS BIGINT)) AS DOUBLE) * 0.85) AS BIGINT)
         |    + 150000 AS rq
         |  FROM ed JOIN r${k - 1} ON ed.src = r${k - 1}.node GROUP BY dst)""".stripMargin
    val rounds = (1 to prIters).map(iter).mkString(",\n")
    s"""WITH p AS (SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS sp
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |edges AS (SELECT c AS src, sp AS dst FROM p
       |          UNION ALL SELECT sp AS src, c AS dst FROM p),
       |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
       |ed AS (SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d USING (src)),
       |r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS rq FROM deg),
       |$rounds
       |SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
       |  node // 2 AS key, d.deg, r.rq
       |FROM r$prIters r JOIN deg d ON d.src = r.node
       |ORDER BY node_type, key""".stripMargin
  }

  /** Degree distribution of the trade graph in exact log2 bins — the
    * pre-flight diagnostic for every graph algorithm here (is the
    * degree sequence heavy-tailed enough to need salting / hub
    * mirroring, or benign?). The bin is floor(log2(deg)) computed as
    * `length(bin(deg)) - 1` — pure integer/string arithmetic, because
    * `floor(ln(x)/ln(2))` flips at exact powers of two depending on
    * the engine's libm rounding. One groupBy(node) + one tiny census
    * aggregation; the distinct() is the same bounded projection
    * PageRank builds.
    */
  private def qGraphDegreeDist(s: SparkSession, dir: String): DataFrame = {
    val pairs = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .join(t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("sp"))
      .distinct()
    val deg = pairs.select(col("c").as("node"), col("sp").as("peer"))
      .union(pairs.select(col("sp").as("node"), col("c").as("peer")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    deg
      .select(when(pmod(col("node"), lit(2)) === 0, lit("customer"))
          .otherwise(lit("supplier")).as("node_type"),
        (length(bin(col("deg"))) - 1).as("bucket"), col("deg"))
      .groupBy("node_type", "bucket")
      .agg(count(lit(1)).as("n_nodes"),
        min("deg").as("min_deg"), max("deg").as("max_deg"),
        sum("deg").as("sum_deg"))
      .orderBy("node_type", "bucket")
  }

  val defs: Map[String, QueryFn] = Map(
    "q_graph_pagerank" -> qGraphPagerank _,
    "q_graph_degree_dist" -> qGraphDegreeDist _,
  )

  val oracles: Map[String, String] = Map(
    "q_graph_pagerank" -> prOracle,
    "q_graph_degree_dist" ->
      """WITH p AS (SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS sp
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |deg AS (SELECT node, count(*) AS deg FROM (
        |  SELECT c AS node FROM p UNION ALL SELECT sp AS node FROM p) GROUP BY node)
        |SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
        |  CAST(length(bin(deg)) - 1 AS INTEGER) AS bucket,
        |  count(*) AS n_nodes,
        |  min(deg) AS min_deg, max(deg) AS max_deg,
        |  CAST(sum(deg) AS BIGINT) AS sum_deg
        |FROM deg GROUP BY 1, 2 ORDER BY node_type, bucket""".stripMargin,
  )
}
