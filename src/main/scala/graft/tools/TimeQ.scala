package graft.tools

object TimeQ {
  def main(args: Array[String]): Unit = {
    val Array(name, dir) = args.take(2)
    val spark = graft.core.GraftSession.get()
    val t0 = System.nanoTime()
    val df = graft.SparkEntry.queries(name)(spark, dir)
    val t1 = System.nanoTime()
    val n = df.count()
    val t2 = System.nanoTime()
    val n2 = df.count()
    val t3 = System.nanoTime()
    println(f"construct=${(t1 - t0) / 1e9}%.2f exec1=${(t2 - t1) / 1e9}%.2f exec2=${(t3 - t2) / 1e9}%.2f rows=$n/$n2")
    spark.stop()
  }
}
