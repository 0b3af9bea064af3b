package graft.tools

import org.apache.spark.sql.functions._

/** Race the two degree-ordered triangle enumerations — the wedge
  * stream + closing join (the registered path, broadcast vs
  * shuffle_hash routed) against the adjacency-intersect twin (O(m)
  * shuffle, only triangle rows materialize) — on the co-purchase
  * graph at a given SF, asserting the per-node census is identical
  * before printing walls. `capZero = 1` additionally times the wedge
  * path with broadcastEdgeCap = 0 (the shuffle_hash big-graph route)
  * for the comparison that matters at 100 TB.
  *
  * Usage: runMain graft.tools.TriBench <sfDir> [capZero 0|1|adj]
  *
  * `adj` times ONLY the adjacency path (for scale points where the
  * wedge stream is prohibitive — e.g. sf10's 120M edges would put
  * ~15B wedge rows through the closing join); the census then checks
  * against the replication law instead of the wedge twin when the
  * corpus is a gen_sf1-style key-offset replication.
  */
object TriBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mode = args.drop(1).headOption.getOrElse("0")
    val capZero = mode == "1"
    val adjOnly = mode == "adj"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    // the SAME edge derivation the registered query uses — the race is
    // meaningless if the contestants measure different graphs
    val pairs = graft.queries.GraphQueries.coPurchasePairs(li)
    val nEdges = pairs.count()

    def census(tri: org.apache.spark.sql.DataFrame,
               deg: org.apache.spark.sql.DataFrame): Array[(Long, Long)] = {
      val perNode = graft.queries.GraphQueries.perNodeTriCensus(tri)
      deg.join(perNode, Seq("node"), "left_outer")
        .select(coalesce(col("tri_count"), lit(0L)).as("tri_count"))
        .groupBy("tri_count").agg(count(lit(1)).as("n_parts"))
        .orderBy("tri_count")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
    }
    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val (cAdj, sAdj) = timed {
      val (t, d) = graft.queries.GraphQueries.trianglesFromPairsAdj(pairs)
      census(t, d)
    }
    if (adjOnly) {
      println(
        s"""{"metric":"tri_adj_scale","sf":"$sfDir","n_edges":$nEdges,""" +
        s""""census_rows":${cAdj.length},""" +
        s""""census":${cAdj.take(8).map(p => s"[${p._1},${p._2}]").mkString("[", ",", "]")},""" +
        s""""adj_intersect_sec":${math.rint(sAdj * 100) / 100}}""")
      spark.stop()
      return
    }
    val (cWedge, sWedge) = timed {
      val (t, d) = graft.queries.GraphQueries.trianglesFromPairs(pairs)
      census(t, d)
    }
    require(cWedge.sameElements(cAdj),
      s"census mismatch: wedge=${cWedge.take(5).toSeq} adj=${cAdj.take(5).toSeq}")
    val shuffleLine = if (capZero) {
      val (cW0, sW0) = timed {
        val (t, d) = graft.queries.GraphQueries.trianglesFromPairs(pairs, 0L)
        census(t, d)
      }
      require(cWedge.sameElements(cW0), "cap-0 census mismatch")
      s""","wedge_shuffle_sec":${math.rint(sW0 * 100) / 100}"""
    } else ""
    def r2(d: Double) = math.rint(d * 100) / 100
    println(
      s"""{"metric":"tri_race","sf":"$sfDir","n_edges":$nEdges,""" +
      s""""census_rows":${cWedge.length},"census_equal":true,""" +
      s""""wedge_broadcast_sec":${r2(sWedge)},"adj_intersect_sec":${r2(sAdj)}""" +
      shuffleLine + "}")
    spark.stop()
  }
}
