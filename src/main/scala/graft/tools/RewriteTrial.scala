package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** A/B sweep for the naive-inequality-join rewrite
  * (`spark.graft.rangeJoin.rewriteNaive`): constructs every registered
  * batch query's physical plan with the flag OFF and ON and reports
  * the queries whose plans differ — the evidence base for the
  * default-on decision (BASELINE.md round-14 trial). Streaming
  * queries are excluded: their construction executes a stream, and
  * the rewrite rule skips streaming plans by contract anyway.
  *
  * Usage: runMain graft.tools.RewriteTrial <sfDir>
  */
object RewriteTrial {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.core.GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val flag = "spark.graft.rangeJoin.rewriteNaive"
    // exprIds, plan ids and temp paths renumber per construction —
    // strip them so only structural differences count (the off-vs-off
    // control below pins the noise floor at zero)
    def normalize(p: String): String = p
      .replaceAll("#\\d+", "#_")
      .replaceAll("plan_id=\\d+", "plan_id=_")
      .replaceAll("/tmp/[^\\s,\\)\\]]+", "/tmp/_")
      .replaceAll("@[0-9a-f]{6,}", "@_")
    def planOf(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : String =
      normalize(fn(spark, sfDir).queryExecution.sparkPlan.toString)
    val skip = SparkEntry.queries.keySet.filter(_.startsWith("q_stream"))
    val names = (SparkEntry.queries.keySet -- skip).toSeq.sorted
    var changed = Vector.empty[String]
    var noisy = Vector.empty[String]
    var errs = Vector.empty[String]
    names.foreach { name =>
      try {
        spark.conf.set(flag, "false")
        val off = planOf(SparkEntry.queries(name))
        val off2 = planOf(SparkEntry.queries(name))
        spark.conf.set(flag, "true")
        val on = planOf(SparkEntry.queries(name))
        if (off != off2) noisy :+= name // non-deterministic construction
        else if (off != on) changed :+= name
      } catch {
        case e: Throwable =>
          errs :+= s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}"
      } finally spark.conf.unset(flag)
    }
    println(s"[rewrite-trial] swept=${names.size} changed=${changed.size} " +
      s"noisy=${noisy.size} errs=${errs.size}")
    changed.foreach(n => println(s"[rewrite-trial] changed: $n"))
    noisy.foreach(n => println(s"[rewrite-trial] noisy: $n"))
    errs.foreach(e => println(s"[rewrite-trial] err: $e"))
    spark.stop()
  }
}
