package graft.jobs

import com.fasterxml.jackson.databind.ObjectMapper
import graft.functions.Strings
import graft.sources.ObjectStore
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.ZipInputStream

/** S18 crowdsourcing job lifecycle (figure_eight_functions.py:116-389)
  * as a thin DRIVER-SIDE service: copy/rename a template job, upload
  * the job log, download the report, and the composed create /
  * transfer / download-output flows. This is orchestration around the
  * engine, not a query operator — the tabular halves (upload log,
  * URL strings, latest-log selection) live in [[JobLog]], the store
  * moves in [[graft.sources.ObjectStore]].
  *
  * The HTTP transport is injectable so specs run against a recording
  * fake (the reference tests do the same with mocked FakeResponses,
  * figure_eight_functions_test.py); the default is the JDK client.
  * All filesystem access goes through Hadoop FS so `baseDir` and the
  * store may live on any mounted scheme.
  */
object CrowdService {

  final case class Response(status: Int, body: Array[Byte]) {
    def text: String = new String(body, UTF_8)
  }

  trait HttpTransport {
    def get(url: String): Response
    def put(url: String, body: Array[Byte], contentType: String): Response
  }

  /** Production transport: `java.net.http` (driver-side only). */
  object JdkTransport extends HttpTransport {
    private lazy val client = java.net.http.HttpClient.newHttpClient()
    def get(url: String): Response = {
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .GET().build()
      val res = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofByteArray())
      Response(res.statusCode(), res.body())
    }
    def put(url: String, body: Array[Byte], contentType: String): Response = {
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .header("Content-Type", contentType)
        .PUT(java.net.http.HttpRequest.BodyPublishers.ofByteArray(body))
        .build()
      val res = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofByteArray())
      Response(res.statusCode(), res.body())
    }
  }

  private val Api = "https://api.appen.com/v1"

  /** `copy_job` (figure_eight_functions.py:115-136): clone a template
    * job, return the new job id from the JSON response.
    */
  def copyJob(jobId: Long, key: String, http: HttpTransport): Long = {
    val res = http.get(s"$Api/jobs/$jobId/copy.json?key=$key")
    require(res.status == 200, s"copy_job not successful. Status code: ${res.status}")
    new ObjectMapper().readTree(res.body).get("id").asLong
  }

  /** `rename_job` (figure_eight_functions.py:139-153). */
  def renameJob(jobId: Long, key: String, name: String, http: HttpTransport): Unit = {
    val m = new ObjectMapper()
    val root = m.createObjectNode()
    root.put("key", key)
    root.putObject("job").put("title", name)
    http.put(s"$Api/jobs/$jobId.json", m.writeValueAsBytes(root), "application/json")
    () // the reference ignores the rename response
  }

  /** `upload_log_file` (figure_eight_functions.py:156-178): PUT the
    * log CSV to populate the job's rows.
    */
  def uploadLogFile(logCsv: String, jobId: Long, key: String,
                    http: HttpTransport): Int = {
    val res = http.put(s"$Api/jobs/$jobId/upload.json?key=$key&force=true",
      logCsv.getBytes(UTF_8), "text/csv")
    require(res.status == 200,
      s"Upload_data not successful. Status code: ${res.status}")
    res.status
  }

  /** `_format_url` with the reference's exact flag encoding
    * (figure_eight_functions.py:43-47 + urlencode of a python bool
    * dict — `pixel_only=False&label_only=False&rgb=False`). The column
    * variant [[JobLog.calibanUrl]] compresses false flags; this one is
    * byte-exact with the reference for the service path.
    */
  def formatUrl(awsFolder: String, stage: String, npz: String,
                pixelOnly: Boolean, labelOnly: Boolean, rgbMode: Boolean): String = {
    def py(b: Boolean) = if (b) "True" else "False"
    val sub = awsFolder.split("/").mkString("__")
    val flags = s"pixel_only=${py(pixelOnly)}&label_only=${py(labelOnly)}&rgb=${py(rgbMode)}"
    s"https://caliban.deepcell.org/caliban-input__caliban-output__${sub}__${stage}__$npz?$flags"
  }

  /** `list_npzs_folder` (misc_utils.py:107-118): naturally-sorted NPZ
    * names of a directory, via Hadoop FS.
    */
  def listNpzs(spark: SparkSession, dir: String): Seq[String] = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    Strings.sortedNicely(
      fs.globStatus(new Path(dir, "*.npz")).map(_.getPath.getName).toSeq)
  }

  /** `create_job_urls` (figure_eight_functions.py:74-113): local paths,
    * store keys and caliban viewer URLs for every NPZ of a crop dir.
    */
  def createJobUrls(spark: SparkSession, cropDir: String, awsFolder: String,
                    stage: String, pixelOnly: Boolean, labelOnly: Boolean,
                    rgbMode: Boolean): Seq[(String, String, String, String)] =
    listNpzs(spark, cropDir).map { npz =>
      (s"$cropDir/$npz", s"$awsFolder/$stage/$npz",
        formatUrl(awsFolder, stage, npz, pixelOnly, labelOnly, rgbMode), npz)
    }

  /** Reference-shaped upload-log CSV (log_file.py:53-73 column order,
    * python-style booleans). The log is job-sized (one row per NPZ), so
    * building it driver-side is the declared design for this service.
    */
  def logCsv(rows: Seq[(String, String)], stage: String, awsFolder: String,
             jobId: Long, pixelOnly: Boolean, labelOnly: Boolean,
             rgbMode: Boolean): String = {
    def py(b: Boolean) = if (b) "True" else "False"
    val header = "project_url,filename,stage,aws_folder,job_id,pixel_only,label_only,rgb_mode"
    val body = rows.map { case (url, npz) =>
      s""""$url",$npz,$stage,$awsFolder,$jobId,${py(pixelOnly)},${py(labelOnly)},${py(rgbMode)}"""
    }
    (header +: body).mkString("", "\n", "\n")
  }

  private def writeString(spark: SparkSession, path: String, text: String): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(path), true)
    try out.write(text.getBytes(UTF_8)) finally out.close()
  }

  private def latestLog(spark: SparkSession, logDir: String): String = {
    val fs = new Path(logDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(new Path(logDir)).map(_.getPath.getName).toSeq
    JobLog.latestLogName(names)
      .getOrElse(sys.error(s"no upload log found in $logDir"))
  }

  /** `create_figure_eight_job` (figure_eight_functions.py:180-245):
    * validate the crop dir, clone + rename the template job, upload
    * NPZs to `storeDir` (the caliban-input bucket in production, any
    * Hadoop URI here), write `logs/stage_0_{stage}_upload_log.csv`,
    * and PUT the log to the job. Returns the upload status code.
    */
  def createJob(spark: SparkSession, baseDir: String, jobIdToCopy: Long,
                awsFolder: String, stage: String, key: String,
                storeDir: String, jobName: Option[String] = None,
                pixelOnly: Boolean = false, labelOnly: Boolean = false,
                rgbMode: Boolean = false,
                http: HttpTransport = JdkTransport): Int = {
    val fs = new Path(baseDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.isDirectory(new Path(baseDir)), "Invalid directory name")
    val cropDir = s"$baseDir/crop_dir"
    require(fs.isDirectory(new Path(cropDir)),
      "No crop directory found within base directory")
    val units = createJobUrls(spark, cropDir, awsFolder, stage,
      pixelOnly, labelOnly, rgbMode)
    require(units.nonEmpty, "No NPZs found in crop dir")

    val newJobId = copyJob(jobIdToCopy, key, http)
    jobName.foreach(renameJob(newJobId, key, _, http))

    ObjectStore.upload(spark, units.map(_._1), s"$storeDir/$awsFolder/$stage")

    val csv = logCsv(units.map(u => (u._3, u._4)), stage, awsFolder,
      newJobId, pixelOnly, labelOnly, rgbMode)
    writeString(spark, s"$baseDir/logs/${JobLog.nextLogName(0, stage)}", csv)
    uploadLogFile(csv, newJobId, key, http)
  }

  /** `transfer_figure_eight_job` (figure_eight_functions.py:248-303):
    * clone a job for the next annotation stage, server-side-copy the
    * previous stage's files, write the next-numbered log, upload it.
    * Returns the new log CSV.
    */
  def transferJob(spark: SparkSession, baseDir: String, jobIdToCopy: Long,
                  newStage: String, jobName: String, key: String,
                  storeDir: String, pixelOnly: Boolean = false,
                  labelOnly: Boolean = false, rgbMode: Boolean = false,
                  http: HttpTransport = JdkTransport): String = {
    val newJobId = copyJob(jobIdToCopy, key, http)
    renameJob(newJobId, key, jobName, http)

    val logDir = s"$baseDir/logs"
    val prevName = latestLog(spark, logDir)
    val prev = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(s"$logDir/$prevName")
    val first = prev.select("stage", "aws_folder").first()
    val (prevStage, awsFolder) = (first.getString(0), first.getString(1))
    val filenames = prev.select("filename").collect().map(_.getString(0)).toSeq

    ObjectStore.copy(spark, s"$storeDir/$awsFolder/$prevStage", filenames,
      s"$storeDir/$awsFolder/$newStage")

    val prevNum = prevName.split("_")(1).toInt
    val urls = filenames.map(npz =>
      (formatUrl(awsFolder, newStage, npz, pixelOnly, labelOnly, rgbMode), npz))
    val csv = logCsv(urls, newStage, awsFolder, newJobId,
      pixelOnly, labelOnly, rgbMode)
    writeString(spark, s"$logDir/${JobLog.nextLogName(prevNum + 1, newStage)}", csv)
    uploadLogFile(csv, newJobId, key, http)
    csv
  }

  /** `download_report` + `unzip_report`
    * (figure_eight_functions.py:306-355): fetch the job report zip and
    * extract it as `job_report.csv`.
    */
  def downloadReport(spark: SparkSession, jobId: Long, key: String,
                     logDir: String, http: HttpTransport = JdkTransport): Unit = {
    val fs = new Path(logDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(logDir))
    val res = http.get(s"$Api/jobs/$jobId.csv?type=full&key=$key")
    val out = fs.create(new Path(logDir, "job_report.zip"), true)
    try out.write(res.body) finally out.close()
  }

  def unzipReport(spark: SparkSession, logDir: String): Unit = {
    val fs = new Path(logDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = new ZipInputStream(fs.open(new Path(logDir, "job_report.zip")))
    val entry = in.getNextEntry
    require(entry != null, "empty job_report.zip")
    val out = fs.create(new Path(logDir, "job_report.csv"), true)
    val buf = new Array[Byte](65536)
    var n = in.read(buf)
    while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.close()
    in.close()
  }

  /** `download_figure_eight_output` (figure_eight_functions.py:358-389):
    * read the latest log, fetch + unzip the report, download the
    * annotated NPZs; returns the names never returned by annotators
    * (fed to S12's grid completion downstream).
    */
  def downloadOutput(spark: SparkSession, baseDir: String, key: String,
                     storeDir: String,
                     http: HttpTransport = JdkTransport): Seq[String] = {
    val logDir = s"$baseDir/logs"
    val name = latestLog(spark, logDir)
    val log = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(s"$logDir/$name")
    val first = log.select(org.apache.spark.sql.functions.col("job_id").cast("long"),
      log("stage"), log("aws_folder")).first()
    val (jobId, stage, awsFolder) = (first.getLong(0), first.getString(1), first.getString(2))

    downloadReport(spark, jobId, key, logDir, http)
    unzipReport(spark, logDir)

    val filenames = log.select("filename").collect().map(_.getString(0)).toSeq
    ObjectStore.downloadTracking(spark, s"$storeDir/$awsFolder/$stage",
      filenames, s"$baseDir/output")
  }

  /** Exposes the reference's latest-log helper for this service's dir
    * layout (figure_eight_functions.py:57-70).
    */
  def getLatestLogFile(spark: SparkSession, logDir: String): String =
    latestLog(spark, logDir)
}
