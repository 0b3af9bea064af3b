package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming surface (SURVEY.md §2.10): the reference has
  * no streaming runtime, but the engine exposes the event pipeline as
  * a stream — watermarked tumbling-window aggregation and streaming
  * dedup — so "dynamic" data can arrive incrementally instead of as a
  * batch tensor.
  *
  * For local verification the stream is driven synchronously from the
  * same parquet (`processAllAvailable` + memory sink); on a cluster
  * the identical plan runs against a live source with the watermark
  * bounding state.
  */
object StreamOps {

  /** Watermarked hourly counts per event type; returns the final
    * result table after draining the (file-backed) stream. The ns->us
    * rebase mirrors graft.queries.Q.t.
    */
  def hourlyCounts(spark: SparkSession, sfDir: String,
                   queryName: String = "stream_hourly"): DataFrame = {
    val batchSchema = spark.read.parquet(s"$sfDir/events.parquet").schema
    // streaming file source needs a directory; glob-filter to events
    var stream = spark.readStream
      .schema(batchSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
    if (batchSchema("ts").dataType == org.apache.spark.sql.types.LongType)
      stream = stream.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val agg = stream
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("sum_value"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName).orderBy("hour", "event_type")
  }
}
