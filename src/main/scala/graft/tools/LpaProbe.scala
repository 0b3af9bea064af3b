package graft.tools

import org.apache.spark.sql.functions._

/** Per-stage wall breakdown for the LPA community operator at a given
  * SF dir — the decade-drill diagnosis harness. Round-16 history: the
  * first shape hash-partitioned edges by dst per round (localCheckpoint
  * does not carry partitioning into the next plan, so every round
  * re-exchanged the m-row edge relation — 30x wall for 10x data at
  * sf10); the registered shape now broadcasts the node-dimension label
  * relation and pays ONE m-row exchange per round (see
  * graft.queries.GraphQueries.lpaCensus). This probe times pair-gen,
  * edge build, and each round under that registered shape, printing
  * the round-2 plan so an accidental extra exchange is visible.
  */
object LpaProbe {
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
    val pairs = li.as("a")
      .join(li.as("b"), col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v")).distinct()
      .localCheckpoint()
    val m = pairs.count()
    println(f"[lpa] pairs: $m%,d in ${sec(t0)}%.1f s")

    t0 = now()
    val edges = pairs.select(col("u").as("src"), col("v").as("dst"))
      .union(pairs.select(col("v").as("src"), col("u").as("dst")))
      .localCheckpoint()
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("lab", col("node")).localCheckpoint()
    val nNodes = labels.count()
    println(f"[lpa] edges + l0 built in ${sec(t0)}%.1f s ($nNodes%,d nodes)")

    for (r <- 1 to rounds) {
      t0 = now()
      val next = edges
        .join(broadcast(labels.select(col("node").as("dst"), col("lab"))),
          Seq("dst"))
        .select(col("src"), col("lab"))
        .repartition(col("src"))
        .groupBy(col("src").as("node"), col("lab"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy("node")
        .agg(max(struct(col("cnt"), (-col("lab")).as("neg"))).as("w"))
        .select(col("node"), (-col("w.neg")).as("lab"))
      if (r == 2) next.explain()
      labels = next.localCheckpoint()
      println(f"[lpa] round $r in ${sec(t0)}%.1f s")
    }
    t0 = now()
    labels.groupBy("lab").agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").as("community_size"))
      .agg(count(lit(1)).as("n_communities"))
      .orderBy("community_size")
      .show(10, false)
    println(f"[lpa] census in ${sec(t0)}%.1f s")
    spark.stop()
  }
}
