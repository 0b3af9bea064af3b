package graft.tools

import graft.SparkEntry

/** Dev tool: print the formatted physical plan of selected queries
  * (args: sfDir queryName...) so pushdown, join strategy and codegen
  * spans can be inspected per round.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else Seq("q06_forecast_revenue")
    val spark = graft.core.GraftSession.get()
    names.foreach { n =>
      println(s"===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
