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

  test("triangle close above the broadcast cap: shuffle_hash path, AQE skew split") {
    import spark.implicits._
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
    // One hot closing pair: K apexes each adjacent to both 1 and 2,
    // plus the closing edge (1,2). Every apex has degree 2 < deg(1) =
    // deg(2) = K+1, so orientation sends apex->1 and apex->2 and all K
    // wedges carry the SAME (lo,hi) = (1,2) key — one pathological
    // shuffle partition in the closing join, the shape AQE's skew
    // split exists for.
    val k = 100000
    val pairs = ((1L, 2L) +: (0 until k).flatMap { i =>
      val a = 100L + i; Seq((1L, a), (2L, a))
    }).toDF("u", "v").localCheckpoint()
    // thresholds sized to the fixture: the hot partition carries 100k
    // rows (a few hundred KB shuffled), the rest are ~empty, so any
    // sub-100KB threshold flags exactly one partition as skewed
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16384",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384",
      // Spark 4 clamps the skew-split target to minPartitionSize (1 MB
      // default) — lower it so the fixture-sized hot partition splits
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "16384")
    val prior = confs.map { case (key, _) => key -> spark.conf.getOption(key) }
    confs.foreach { case (key, v) => spark.conf.set(key, v) }
    try {
      // cap 0 forces the >5M-edge routing regardless of fixture size
      val (tri, _) = GraphQueries.trianglesFromPairs(pairs, broadcastEdgeCap = 0L)
      val rows = tri.collect()
      assert(rows.length == k, s"${rows.length} triangles != $k")
      assert(rows.forall(r =>
        r.getAs[Long]("lo") == 1L && r.getAs[Long]("hi") == 2L))
      val finalPlan = tri.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p                        => p
      }
      // query stages are leaf nodes to collect(); descend explicitly
      def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] = {
        val kids = p match {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            Seq(q.plan)
          case other => other.children
        }
        p +: kids.flatMap(allNodes)
      }
      val closes = allNodes(finalPlan).collect { case j: ShuffledHashJoinExec => j }
      assert(closes.nonEmpty, s"no shuffle_hash closing join in:\n$finalPlan")
      assert(closes.exists(_.isSkewJoin),
        s"AQE did not mark the closing join skew-split:\n$finalPlan")
      // the routing is a physical choice only: both paths must agree
      val (triB, _) =
        GraphQueries.trianglesFromPairs(pairs, broadcastEdgeCap = Long.MaxValue)
      assert(triB.count() == k.toLong)
    } finally prior.foreach {
      case (key, Some(v)) => spark.conf.set(key, v)
      case (key, None)    => spark.conf.unset(key)
    }
  }

  test("adjacency-intersect triangles equal the wedge path: planted hot pair + random graph") {
    import spark.implicits._
    def triSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("apex"), r.getAs[Long]("lo"),
        r.getAs[Long]("hi"))).toSet
    // the skew fixture: K wedges all closing on the same (1,2) pair
    val k = 5000
    val hot = ((1L, 2L) +: (0 until k).flatMap { i =>
      val a = 100L + i; Seq((1L, a), (2L, a))
    }).toDF("u", "v").localCheckpoint()
    val (wHot, dHot) = GraphQueries.trianglesFromPairs(hot)
    val (aHot, dHot2) = GraphQueries.trianglesFromPairsAdj(hot)
    assert(triSet(aHot) == triSet(wHot), "hot-pair triangle sets differ")
    assert(triSet(aHot).size == k)
    assert(dHot2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      dHot.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    // seeded random graphs at varying densities — a property sweep,
    // not one lucky fixture (sparse graphs exercise empty adjacency
    // lists / zero-triangle nodes, dense ones the orientation bound)
    var sawTriangles = false
    for ((seed, nNodes, nDraws) <- Seq((7, 300, 2500), (13, 60, 300),
        (29, 40, 700), (42, 500, 1200), (99, 25, 280))) {
      val rnd = new scala.util.Random(seed)
      val rand = Seq.fill(nDraws) {
        val a = rnd.nextInt(nNodes).toLong; val b = rnd.nextInt(nNodes).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct.toDF("u", "v").localCheckpoint()
      val (wR, _) = GraphQueries.trianglesFromPairs(rand)
      val (aR, _) = GraphQueries.trianglesFromPairsAdj(rand)
      val ws = triSet(wR); val as = triSet(aR)
      assert(as == ws, s"seed $seed: sets differ: only-wedge=${(ws -- as).take(3)} " +
        s"only-adj=${(as -- ws).take(3)}")
      sawTriangles |= ws.nonEmpty
    }
    assert(sawTriangles, "fixture degenerate: no triangles in any random graph")
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

  test("lpa communities: two planted cliques bridged by one edge") {
    import spark.implicits._
    // triangles {1,2,3} and {4,5,6} plus bridge 3-4; hand-traced 4
    // synchronous min-tie-break rounds converge to labels 1 and 3 —
    // two communities of size 3 (the bridge never flips a clique)
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("u", "v")
    val census = GraphQueries.lpaCensus(pairs, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(census == Map(3L -> 2L), s"got $census")
    // determinism: a second run produces the identical census
    val again = GraphQueries.lpaCensus(pairs, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == census)
  }
}
