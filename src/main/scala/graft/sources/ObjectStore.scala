package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** S17 `aws_functions` (aws_functions.py:54-144) re-expressed over the
  * Hadoop FileSystem API: upload, server-side copy between stores, and
  * download with missing-file tracking. Any scheme the cluster mounts
  * works — `file://` in tests, `s3a://caliban-input/...` in
  * production (credentials/endpoint via standard `spark.hadoop.fs.s3a.*`
  * conf) — so the reference's bucket choreography is configuration,
  * not code.
  */
object ObjectStore {

  private def fs(spark: SparkSession, uri: String): FileSystem =
    new Path(uri).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** `aws_upload_files`: copy local files to the store. */
  def upload(spark: SparkSession, localFiles: Seq[String], destDir: String): Unit = {
    val target = fs(spark, destDir)
    target.mkdirs(new Path(destDir))
    localFiles.foreach { f =>
      target.copyFromLocalFile(new Path(f), new Path(destDir, new java.io.File(f).getName))
    }
  }

  /** `aws_copy_files`: store-to-store copy (caliban-output ->
    * caliban-input in the reference).
    */
  def copy(spark: SparkSession, srcDir: String, names: Seq[String], destDir: String): Unit = {
    val src = fs(spark, srcDir)
    val dst = fs(spark, destDir)
    dst.mkdirs(new Path(destDir))
    names.foreach { n =>
      org.apache.hadoop.fs.FileUtil.copy(
        src, new Path(srcDir, n), dst, new Path(destDir, n),
        false, spark.sparkContext.hadoopConfiguration)
    }
  }

  /** `aws_download_files` (aws_functions.py:106-144): fetch the
    * requested names; returns the missing list instead of failing —
    * the annotator-never-returned-it path that S12's grid completion
    * consumes.
    */
  def downloadTracking(spark: SparkSession, srcDir: String, names: Seq[String],
                       localDir: String): Seq[String] = {
    val src = fs(spark, srcDir)
    new java.io.File(localDir).mkdirs()
    names.filterNot { n =>
      val p = new Path(srcDir, n)
      if (src.exists(p)) {
        src.copyToLocalFile(p, new Path(localDir, n))
        true
      } else false
    }
  }

  /** S11 `get_saved_file_path` (io_utils.py:136-163): resolve a work
    * unit's file among possible `_save_version_N` suffixes; error on
    * ambiguity.
    */
  def resolveSavedFile(names: Seq[String], fov: String, crop: Int, slice: Int,
                       ext: String = "npz"): Option[String] = {
    val base = s"fov_${fov}_crop_${crop}_slice_${slice}"
    val re = java.util.regex.Pattern.quote(base) + "(_save_version_(\\d+))?\\." + ext
    val matches = names.filter(_.matches(re))
    require(matches.length <= 1 || matches.map(m =>
      "_save_version_(\\d+)".r.findFirstMatchIn(m).map(_.group(1).toInt).getOrElse(0))
      .distinct.length == matches.length,
      s"multiple conflicting saves for $base: $matches")
    matches.sortBy(m =>
      "_save_version_(\\d+)".r.findFirstMatchIn(m).map(_.group(1).toInt).getOrElse(0))
      .lastOption
  }
}
