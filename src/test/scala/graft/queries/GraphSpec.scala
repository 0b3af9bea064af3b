package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Structural invariants for the PageRank round the oracle can't
  * express: node-set completeness, the rank floor, and the
  * degree-centrality ordering the undirected power iteration must
  * approach.
  */
class GraphSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  test("pagerank: node set, rank floor, and degree-rank correlation") {
    val rows = SparkEntry.queries("q_graph_pagerank")(spark, sfDir).collect()
    val custs = rows.filter(_.getString(0) == "customer")
    val supps = rows.filter(_.getString(0) == "supplier")
    assert(custs.nonEmpty && supps.nonEmpty)
    // every supplier ships something at every sf, so all appear
    val nSupp = spark.read.parquet(s"$sfDir/supplier.parquet").count()
    assert(supps.length == nSupp, s"${supps.length} supplier nodes != $nSupp suppliers")
    // teleport floor: no node can rank below the damping constant
    assert(rows.forall(_.getLong(3) >= 150000L))
    // high-degree nodes must outrank low-degree ones in aggregate:
    // compare mean rank of the top and bottom degree quartiles
    val byDeg = rows.sortBy(_.getLong(2))
    val q = byDeg.length / 4
    val lo = byDeg.take(q).map(_.getLong(3).toDouble).sum / q
    val hi = byDeg.takeRight(q).map(_.getLong(3).toDouble).sum / q
    assert(hi > lo, s"mean rank of top degree quartile $hi <= bottom $lo")
  }

  test("bfs census: planted path, disconnected island, and hop-cap truncation") {
    import spark.implicits._
    // path 0-1-2-3 (undirected) plus island 10-11: distances 0..3,
    // island nodes unreached
    val und = Seq((0L, 1L), (1L, 2L), (2L, 3L), (10L, 11L))
    val edges = und.toDF("src", "dst")
      .union(und.map(_.swap).toDF("src", "dst"))
    val census = graft.queries.GraphQueries.bfsCensus(spark, edges, 0L, 6)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(census == Map(0 -> 1L, 1 -> 1L, 2 -> 1L, 3 -> 1L, -1 -> 2L), s"got $census")
    // hop cap 2 truncates: node 3 joins the unreached mass with the island
    val capped = graft.queries.GraphQueries.bfsCensus(spark, edges, 0L, 2)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(capped == Map(0 -> 1L, 1 -> 1L, 2 -> 1L, -1 -> 3L), s"got $capped")
  }
}
