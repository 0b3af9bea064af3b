package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S15/S16/F10 job-log layer (log_file.py:36-73,
  * figure_eight_functions.py:43-99): upload-log CSV sink/source,
  * latest-log selection, and the caliban viewer URL / log-name string
  * functions — expressed as column expressions so they run wherever
  * the job table lives. The REST lifecycle calls themselves (S18) are
  * driver-side service code, outside the query engine; any
  * Hadoop-compatible URI (file://, hdfs://, s3a://caliban-input/...)
  * works as the log destination.
  */
object JobLog {

  /** F10 `_format_url`: `https://caliban.deepcell.org/{input_bucket}__
    * {output_bucket}__{folder}__{stage}__{npz}?{flags}` with '/' in the
    * folder flattened to '__' (figure_eight_functions.py:43-54).
    */
  def calibanUrl(folder: org.apache.spark.sql.Column, stage: org.apache.spark.sql.Column,
                 npz: org.apache.spark.sql.Column,
                 pixelOnly: org.apache.spark.sql.Column,
                 labelOnly: org.apache.spark.sql.Column,
                 rgbMode: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(
      lit("https://caliban.deepcell.org/caliban-input__caliban-output__"),
      regexp_replace(folder, "/", "__"), lit("__"), stage, lit("__"), npz,
      lit("?"),
      concat_ws("&",
        when(pixelOnly, lit("pixel_only=true")),
        when(labelOnly, lit("label_only=true")),
        when(rgbMode, lit("rgb=true"))))

  /** F10 `_create_next_log_name`: `stage_{n}_{stage}_upload_log.csv`. */
  def nextLogName(stageNum: Int, stage: String): String =
    s"stage_${stageNum}_${stage}_upload_log.csv"

  /** S15 `create_upload_log`: build the job-row table for a batch of
    * NPZ work units.
    */
  def createUploadLog(filenames: DataFrame, stage: String, awsFolder: String,
                      jobId: Long, pixelOnly: Boolean = false,
                      labelOnly: Boolean = false, rgbMode: Boolean = false): DataFrame =
    filenames
      .withColumn("stage", lit(stage))
      .withColumn("aws_folder", lit(awsFolder))
      .withColumn("job_id", lit(jobId))
      .withColumn("pixel_only", lit(pixelOnly))
      .withColumn("label_only", lit(labelOnly))
      .withColumn("rgb_mode", lit(rgbMode))
      .withColumn("project_url",
        calibanUrl(col("aws_folder"), col("stage"), col("filename"),
          col("pixel_only"), col("label_only"), col("rgb_mode")))

  /** CSV sink (header on, one part per partition; `coalesce(1)` for a
    * single reference-shaped file).
    */
  def writeLog(log: DataFrame, path: String, singleFile: Boolean = true): Unit = {
    val out = if (singleFile) log.coalesce(1) else log
    out.write.mode("overwrite").option("header", "true").csv(path)
  }

  def readLog(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** S16 `get_latest_log_file`: lexicographically-last upload log in a
    * directory (stage numbers sort the stages).
    */
  def latestLogName(names: Seq[String]): Option[String] =
    names.filter(_.endsWith("upload_log.csv")).sorted.lastOption
}
