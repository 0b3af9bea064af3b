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
}
