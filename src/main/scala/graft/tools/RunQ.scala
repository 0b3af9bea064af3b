package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev loop: run ONE registered query against an sf dir, write its
  * result parquet + its oracle SQL (if any) for a local DuckDB diff.
  *
  *   RunQ <name> <sfDir> <outDir>
  */
object RunQ {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args.take(3)
    val spark: SparkSession = graft.core.GraftSession.get()
    try {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      graft.SparkEntry.oracleSql.get(name).foreach { sql =>
        Files.writeString(Paths.get(s"$outDir/$name.sql"), sql)
      }
      println(s"rows=${spark.read.parquet(s"$outDir/$name").count()}")
    } finally spark.stop()
  }
}
