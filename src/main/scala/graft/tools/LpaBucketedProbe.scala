package graft.tools

import org.apache.spark.sql.functions._

/** Decade-drill harness for the LPA BUCKETED-EDGE deployment route
  * (graft.queries.GraphQueries.lpaCensusBucketed): times the three
  * phases separately — pair generation, the write-once bucketed-table
  * ingest, and the 4-round LPA loop over the stored layout — then
  * races the registered broadcast-route operator on the same box for
  * an apples-to-apples wall. The deployment claim under test: the
  * stored dst-bucketing removes every per-round edge exchange, so the
  * loop's residual cost is the vote shuffle alone; the ingest shuffle
  * is paid once and amortized over every query that reads the table.
  */
object LpaBucketedProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def now() = System.nanoTime()
    def sec(t0: Long) = (now() - t0) / 1e9

    var t0 = now()
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val pairs = graft.queries.GraphQueries.coPurchasePairs(li)
    val m = pairs.count()
    println(f"[lpab] pairs: $m%,d in ${sec(t0)}%.1f s")

    t0 = now()
    val tbl = "graft_lpa_probe_edges"
    val base = graft.core.Scratch.dir(spark, "lpa-probe")
    val buckets = graft.queries.GraphQueries.lpaBuckets(spark)
    graft.queries.GraphQueries
      .saveLpaEdgesBucketed(pairs, tbl, s"$base/edges", buckets)
    println(f"[lpab] bucketed ingest ($buckets buckets) in ${sec(t0)}%.1f s")

    t0 = now()
    graft.queries.GraphQueries.lpaCensusBucketed(spark, tbl, rounds)
      .show(10, false)
    println(f"[lpab] bucketed loop ($rounds rounds) + census in ${sec(t0)}%.1f s")

    t0 = now()
    graft.queries.GraphQueries.lpaCensus(pairs, rounds).show(10, false)
    println(f"[lpab] classic (registered broadcast route) in ${sec(t0)}%.1f s")

    // the regime bucketing exists for: nodes ABOVE the broadcast cap,
    // where the classic route must shuffle_hash — re-exchanging the
    // m-row edge relation every round — while the stored bucketing
    // keeps the edge side exchange-free at any node count
    t0 = now()
    graft.queries.GraphQueries
      .lpaCensus(pairs, rounds, broadcastNodeCap = 0L).show(10, false)
    println(f"[lpab] classic ABOVE-CAP (shuffle_hash labels, " +
      f"edges re-exchanged per round) in ${sec(t0)}%.1f s")
    spark.stop()
  }
}
