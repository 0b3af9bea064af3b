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

  /** Per-object attributes the reference sets on upload
    * (aws_functions.py:80-81): ACL `public-read` so annotators can
    * fetch work units without credentials, plus the originating local
    * path recorded as object metadata; store-to-store copies re-assert
    * the ACL (aws_functions.py:102).
    */
  final case class ObjectAttrs(acl: String = "public-read",
                               metadata: Map[String, String] = Map.empty)

  /** Client seam for per-object attributes the Hadoop FileSystem API
    * cannot express. Production binds an AWS-SDK-backed adapter here
    * (one `putObject`/`copyObject` per call); tests inject a recording
    * fake — the reference's own test pattern
    * (aws_functions_test.py FakeS3).
    */
  trait AttributedStore {
    def put(localFile: String, destUri: String, attrs: ObjectAttrs): Unit
    def copy(srcUri: String, destUri: String, attrs: ObjectAttrs): Unit
  }

  /** Default binding when no SDK client is injected: Hadoop FS moves
    * the bytes; the per-object ACL is approximated by the s3a
    * connector's bucket-wide conf — set
    * `spark.hadoop.fs.s3a.acl.default=PublicRead` to match the
    * reference's annotator-readable uploads. `source_path` metadata is
    * NOT expressible through s3a; inject an SDK adapter when it must
    * land on the object.
    */
  final class HadoopAttributedStore(spark: SparkSession) extends AttributedStore {
    def put(localFile: String, destUri: String, attrs: ObjectAttrs): Unit = {
      val target = fs(spark, destUri)
      target.copyFromLocalFile(new Path(localFile), new Path(destUri))
    }
    def copy(srcUri: String, destUri: String, attrs: ObjectAttrs): Unit =
      org.apache.hadoop.fs.FileUtil.copy(
        fs(spark, srcUri), new Path(srcUri),
        fs(spark, destUri), new Path(destUri),
        false, spark.sparkContext.hadoopConfiguration)
  }

  /** `aws_upload_files` with the reference's per-object extras
    * (aws_functions.py:76-81): every file uploads with
    * `ACL=public-read` and `Metadata.source_path=<local path>`.
    */
  def uploadWithAttrs(spark: SparkSession, localFiles: Seq[String],
                      destDir: String, store: AttributedStore = null,
                      acl: String = "public-read"): Unit = {
    val s = Option(store).getOrElse(new HadoopAttributedStore(spark))
    localFiles.foreach { f =>
      val dest = new Path(destDir, new java.io.File(f).getName).toString
      s.put(f, dest, ObjectAttrs(acl, Map("source_path" -> f)))
    }
  }

  /** `aws_copy_files` with the ACL re-asserted on the copied object
    * (aws_functions.py:98-102).
    */
  def copyWithAttrs(spark: SparkSession, srcDir: String, names: Seq[String],
                    destDir: String, store: AttributedStore = null,
                    acl: String = "public-read"): Unit = {
    val s = Option(store).getOrElse(new HadoopAttributedStore(spark))
    names.foreach { n =>
      s.copy(new Path(srcDir, n).toString, new Path(destDir, n).toString,
        ObjectAttrs(acl))
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
