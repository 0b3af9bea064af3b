package graft.tools

/** Dev probe: run ONE registered stream query and print every
  * micro-batch's StreamingQueryProgress duration breakdown
  * (triggerExecution / queryPlanning / addBatch / getBatch /
  * walCommit / commitOffsets / latestOffset) plus wall phases, so a
  * slow drain can be attributed to state-store commits, per-batch
  * re-planning, or the batch-side fixture prep instead of guessed at.
  *
  *   StreamProbe <name> <sfDir>
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val Array(name, dir) = args.take(2)
    val spark = graft.core.GraftSession.get()
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit =
        println(s"[probe] stream started: ${e.name}")
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        val d = p.durationMs
        println(s"[probe] batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=${new java.util.TreeMap[String, java.lang.Long](d)}")
      }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
        println(s"[probe] stream terminated")
    }
    spark.streams.addListener(listener)
    val t0 = System.nanoTime()
    val df = graft.SparkEntry.queries(name)(spark, dir)
    val t1 = System.nanoTime()
    val n = df.count()
    val t2 = System.nanoTime()
    println(f"[probe] $name construct+drain=${(t1 - t0) / 1e9}%.2f " +
      f"result_exec=${(t2 - t1) / 1e9}%.2f rows=$n")
    spark.stop()
  }
}
