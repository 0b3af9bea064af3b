package graft.tools

object ExplainQ {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder(master = "local[8]", shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, args(0))
      val t0 = System.nanoTime()
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      println(s"$name REUSED=${plan.contains("ReusedExchange")} cold=${(System.nanoTime()-t0)/1e9}")
      val t1 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, args(0)).collect()
      println(f"$name warm: ${(System.nanoTime()-t1)/1e9}%.2f s")
    }
    spark.stop()
  }
}
