package graft.tools

/** Dev probe: run ONE registered batch query and print every Spark
  * job's wall time, task count and first line of its call site, so a
  * multi-job query (iterative loops, checkpoint chains, write+readback
  * composites) can be attributed job by job instead of guessed at.
  *
  *   JobProbe <name> <sfDir>
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val Array(name, dir) = args.take(2)
    val spark = graft.core.GraftSession.get()
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val site = e.stageInfos.map(si => s"${si.name.takeWhile(_ != '\n').take(60)}(${si.numTasks}t)")
            .mkString(" | ")
          jobs.put(e.jobId, (e.time, site))
        }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(jobs.get(e.jobId)).foreach { case (t0, site) =>
            println(f"[job] id=${e.jobId}%3d wall=${(e.time - t0) / 1000.0}%6.2fs  $site")
          }
        }
      })
    // mirror Bench's JVM warmup so job walls are comparable to bench walls
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.SparkEntry.entry(spark).count()
    val t0 = System.nanoTime()
    val df = graft.SparkEntry.queries(name)(spark, dir)
    val t1 = System.nanoTime()
    val n = df.count()
    val t2 = System.nanoTime()
    Thread.sleep(300)
    println(f"[probe] $name construct=${(t1 - t0) / 1e9}%.2f exec=${(t2 - t1) / 1e9}%.2f rows=$n")
    spark.stop()
  }
}
