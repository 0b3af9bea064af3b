package graft.sources

import graft.core.ImagePlane
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.storage.StorageLevel

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataOutputStream, File}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

/** NPZ (zip of NPY) source/sink — the reference's unit of annotation
  * work and training data (io_utils.py:37-239, S10/S12/S13/S14 in
  * SURVEY.md §2.1).
  *
  * Read path: `spark.read.format("binaryFile")` over a directory +
  * per-file decode in a `flatMap` — each executor decodes its own
  * files; nothing funnels through the driver. Legacy key `annotated`
  * is accepted for `y` (io_utils.py:206). A training NPZ
  * `{X: [batch, rows, cols, chan], y: [batch, rows, cols, 1]}` fans
  * out to one ImagePlane per batch index.
  *
  * Write path: one NPZ per (fov, crop, slice) named
  * `fov_{f}_crop_{c}_slice_{s}.npz` (io_utils.py:73) with the blank-
  * label routing of S10 (include / skip / separate), executed with
  * `foreachPartition` so files are written where the data lives.
  */
object Npz {

  def readEntries(bytes: Array[Byte]): Map[String, Npy.Data] =
    readEntriesFiltered(bytes, _ => true)

  /** Selective decode: zip entries whose name fails `keep` are skipped
    * without decompression (column pruning at the container level).
    */
  def readEntriesFiltered(bytes: Array[Byte], keep: String => Boolean)
      : Map[String, Npy.Data] = {
    val zis = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Map.newBuilder[String, Npy.Data]
    var e: ZipEntry = zis.getNextEntry
    while (e != null) {
      val name = e.getName.stripSuffix(".npy")
      if (keep(name)) {
        val bos = new ByteArrayOutputStream()
        val buf = new Array[Byte](65536)
        var n = zis.read(buf)
        while (n > 0) { bos.write(buf, 0, n); n = zis.read(buf) }
        out += name -> Npy.read(bos.toByteArray)
      }
      e = zis.getNextEntry
    }
    zis.close()
    out.result()
  }

  def writeEntries(entries: Map[String, Array[Byte]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    entries.foreach { case (name, bytes) =>
      zos.putNextEntry(new ZipEntry(s"$name.npy"))
      zos.write(bytes)
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  /** Decode one training NPZ into planes; `fov` is derived from the
    * file name, batch index becomes `stack`.
    */
  def decodeTrainingNpz(fileName: String, bytes: Array[Byte],
                        channels: Seq[String] = Seq.empty): Seq[ImagePlane] = {
    val entries = readEntries(bytes)
    val x = entries.getOrElse("X", sys.error(s"$fileName: no X key"))
    val y = entries.get("y").orElse(entries.get("annotated"))
      .getOrElse(sys.error(s"$fileName: no y/annotated key"))
    val Seq(batch, rows, cols, nCh) = x.shape match {
      case s if s.length == 4 => s
      case s if s.length == 3 => Seq(1) ++ s
      case s => sys.error(s"$fileName: unsupported X shape $s")
    }
    val chNames = if (channels.nonEmpty) channels else (0 until nCh).map(i => s"channel$i")
    val xv = x.toFloats
    val yv = y.toInts
    val base = new File(fileName).getName.stripSuffix(".npz")
    (0 until batch).map { b =>
      // reference layout is [batch, rows, cols, channels] (channel-last);
      // repack to our channel-major planes
      val pixels = new Array[Float](nCh * rows * cols)
      var r = 0
      while (r < rows) {
        var c = 0
        while (c < cols) {
          var ch = 0
          while (ch < nCh) {
            pixels(ch * rows * cols + r * cols + c) =
              xv(((b * rows + r) * cols + c) * nCh + ch)
            ch += 1
          }
          c += 1
        }
        r += 1
      }
      val labels = new Array[Int](rows * cols)
      var i = 0
      while (i < rows * cols) {
        labels(i) = yv(b * rows * cols + i)
        i += 1
      }
      ImagePlane(base, b, 0, 0, rows, cols, chNames, pixels, labels)
    }
  }

  /** S12-flavored source: read every NPZ under `dir` into planes. */
  def readTrainingNpzDir(spark: SparkSession, dir: String,
                         channels: Seq[String] = Seq.empty): Dataset[ImagePlane] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.npz")
      .load(dir)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) => decodeTrainingNpz(path, bytes, channels) }
  }

  /** Encode one work unit (all stacks of a (fov, crop, slice)) as a
    * channel-last `[stacks, rows, cols, chan]` NPZ, the reference
    * layout.
    */
  def encodeStack(planes: Seq[ImagePlane]): Array[Byte] = {
    val sorted = planes.sortBy(_.stack)
    val h = sorted.head
    val nCh = h.channels.length
    val n = sorted.length
    val x = new Array[Float](n * h.nRows * h.nCols * nCh)
    val y = new Array[Int](n * h.nRows * h.nCols)
    sorted.zipWithIndex.foreach { case (p, b) =>
      var r = 0
      while (r < p.nRows) {
        var c = 0
        while (c < p.nCols) {
          var ch = 0
          while (ch < nCh) {
            x(((b * p.nRows + r) * p.nCols + c) * nCh + ch) =
              p.pixels(ch * p.nRows * p.nCols + r * p.nCols + c)
            ch += 1
          }
          y(b * p.nRows * p.nCols + r * p.nCols + c) = p.labels(r * p.nCols + c)
          c += 1
        }
        r += 1
      }
    }
    writeEntries(Map(
      "X" -> Npy.writeFloats(x, Seq(n, h.nRows, h.nCols, nCh)),
      "y" -> Npy.writeInts(y, Seq(n, h.nRows, h.nCols, 1))))
  }

  def encodePlane(p: ImagePlane): Array[Byte] = encodeStack(Seq(p))

  /** S10 `save_npzs_for_caliban`: one NPZ per (fov, crop, slice) work
    * unit — `fov_{f}_crop_{c}_slice_{s}.npz` (io_utils.py:73) holding
    * that unit's whole sub-stack — with blank-label routing: "include"
    * (write normally), "skip" (drop blanks), "separate" (blanks into
    * `separate/`). Grouping happens executor-side (groupByKey), one
    * file written per group where the data lives, through the Hadoop
    * `FileSystem` for `saveDir`'s scheme — so the shared dir can be
    * `file://` in tests and `s3a://`/`hdfs://` on a cluster, where the
    * executors' local disks are NOT the driver's.
    */
  def saveNpzsForCaliban(ds: Dataset[ImagePlane], saveDir: String,
                         blankLabels: String = "include"): Unit = {
    require(Seq("include", "skip", "separate").contains(blankLabels),
      s"invalid blank_labels $blankLabels")
    val spark = ds.sparkSession
    val hconf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    val dirFs = new Path(saveDir).getFileSystem(hconf.value)
    dirFs.mkdirs(new Path(saveDir))
    if (blankLabels == "separate") dirFs.mkdirs(new Path(saveDir, "separate"))
    import spark.implicits._
    ds.groupByKey(p => (p.fov, p.crop, p.slice))
      .mapGroups { (key, it) =>
        val planes = it.toSeq
        val blank = planes.forall(_.labels.forall(_ == 0))
        (key._1, key._2, key._3, encodeStack(planes), blank)
      }
      .foreachPartition { (it: Iterator[(String, Int, Int, Array[Byte], Boolean)]) =>
        val fs = new Path(saveDir).getFileSystem(hconf.value)
        it.foreach { case (fov, crop, slice, bytes, blank) =>
          val target =
            if (!blank || blankLabels == "include") Some(saveDir)
            else if (blankLabels == "separate") Some(s"$saveDir/separate")
            else None
          target.foreach { d =>
            val out = fs.create(new Path(d, s"fov_${fov}_crop_${crop}_slice_${slice}.npz"), true)
            try out.write(bytes) finally out.close()
          }
        }
      }
  }

  /** Channel-last little-endian float bytes of one plane (the NPY
    * payload row of the combined X tensor).
    */
  private def channelLastFloatBytes(p: ImagePlane): Array[Byte] = {
    val nCh = p.channels.length
    val planeSize = p.nRows * p.nCols
    val bb = ByteBuffer.allocate(planeSize * nCh * 4).order(ByteOrder.LITTLE_ENDIAN)
    val fb = bb.asFloatBuffer()
    var r = 0
    while (r < p.nRows) {
      var c = 0
      while (c < p.nCols) {
        var ch = 0
        while (ch < nCh) {
          fb.put(p.pixels(ch * planeSize + r * p.nCols + c))
          ch += 1
        }
        c += 1
      }
      r += 1
    }
    bb.array()
  }

  private def labelIntBytes(p: ImagePlane): Array[Byte] = {
    val bb = ByteBuffer.allocate(p.labels.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    bb.asIntBuffer().put(p.labels)
    bb.array()
  }

  /** S14 `concatenate_npz_files` / `create_combined_npz`
    * (pipeline.py:70-110): fold a dataset of planes into one combined
    * training NPZ `{X: [n, rows, cols, chan], y: [n, rows, cols, 1]}`.
    *
    * Single-file output is inherently driver-written, but the encode
    * STREAMS: a first pass establishes the count and the (uniform)
    * plane shape, then the X and y NPY entries are written header
    * first and appended plane-by-plane from `toLocalIterator` — driver
    * heap holds one plane at a time, never the dataset. The sorted
    * input is disk-persisted so the three passes don't recompute
    * upstream, and the file goes through the Hadoop FileSystem so
    * `outFile` may live on any mounted store. The distributed form of
    * the same data is PlaneStore.save.
    */
  def createCombinedNpz(ds: Dataset[ImagePlane], outFile: String): Unit = {
    val spark = ds.sparkSession
    val sorted = ds.sort("fov", "crop", "slice", "stack")
      .persist(StorageLevel.DISK_ONLY)
    try {
      val n = sorted.count().toInt
      require(n > 0, "no planes to combine")
      import org.apache.spark.sql.functions.size
      import spark.implicits._
      val shapes = sorted
        .select($"nRows", $"nCols", size($"channels").as("nCh"))
        .distinct().limit(2).collect()
      require(shapes.length == 1,
        s"combined NPZ requires uniform plane shape, got ${shapes.mkString(", ")}")
      val (rows, cols, nCh) =
        (shapes(0).getInt(0), shapes(0).getInt(1), shapes(0).getInt(2))
      val fs = new Path(outFile).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val zos = new ZipOutputStream(fs.create(new Path(outFile), true))
      try {
        val dout = new DataOutputStream(zos)
        zos.putNextEntry(new ZipEntry("X.npy"))
        Npy.writeHeaderTo(dout, "<f4", Seq(n, rows, cols, nCh))
        sorted.toLocalIterator().forEachRemaining(p => dout.write(channelLastFloatBytes(p)))
        dout.flush()
        zos.closeEntry()
        zos.putNextEntry(new ZipEntry("y.npy"))
        Npy.writeHeaderTo(dout, "<i4", Seq(n, rows, cols, 1))
        sorted.toLocalIterator().forEachRemaining(p => dout.write(labelIntBytes(p)))
        dout.flush()
        zos.closeEntry()
      } finally zos.close()
    } finally sorted.unpersist()
  }

  /** S12 `load_npzs` (io_utils.py:166-239): read a caliban crop dir
    * back, zero-filling planes whose NPZ is missing (annotator never
    * returned it) against the expected (fov, crop, slice, stackLen)
    * grid — the truncated last slice simply declares a shorter
    * stackLen, as the reference handles it. The per-unit stack
    * expansion runs distributed (narrow explode), so only one row per
    * work unit ever exists driver-side.
    */
  def loadNpzsWithGrid(spark: SparkSession, dir: String,
                       expected: Seq[(String, Int, Int, Int)],
                       nRows: Int, nCols: Int,
                       channels: Seq[String] = Seq("channel0")): Dataset[ImagePlane] = {
    import spark.implicits._
    val grid = spark.createDataset(expected)
      .toDF("fov", "crop", "slice", "stackLen")
    loadNpzsWithGridDf(spark, dir, grid, nRows, nCols, channels)
  }

  /** Distributed-grid variant: `expectedGrid` has columns
    * (fov, crop, slice, stackLen) and may come from any plan — e.g.
    * the narrow fov-fanout Reconstruct builds, which never
    * materializes the fovs x crops x slices product on the driver.
    */
  def loadNpzsWithGridDf(spark: SparkSession, dir: String,
                         expectedGrid: org.apache.spark.sql.DataFrame,
                         nRows: Int, nCols: Int,
                         channels: Seq[String] = Seq("channel0")): Dataset[ImagePlane] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{array, col, explode, lit, sequence, when}
    val present = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.npz")
      .load(dir)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val name = new File(path).getName.stripSuffix(".npz")
        "fov_(.+)_crop_(\\d+)_slice_(\\d+)".r.findFirstMatchIn(name).toSeq.flatMap { m =>
          decodeTrainingNpz(path, bytes, channels).map(
            _.copy(fov = m.group(1), crop = m.group(2).toInt, slice = m.group(3).toInt))
        }
      }
    // sequence(0, -1) would step BACKWARD ([0, -1]) for stackLen=0 —
    // guard so an empty stack contributes zero rows, not phantom indices.
    val expectedDs = expectedGrid
      .withColumn("stack", explode(when(col("stackLen") > 0,
        sequence(lit(0), col("stackLen") - 1))
        .otherwise(array().cast("array<int>"))))
      .drop("stackLen")
    val joined = expectedDs.join(present.toDF(), Seq("fov", "crop", "slice", "stack"), "left")
    joined.as[(String, Int, Int, Int, Option[Int], Option[Int],
      Option[Seq[String]], Option[Array[Float]], Option[Array[Int]])]
      .map { case (fov, crop, slice, stack, nR, nC, ch, px, lb) =>
        ImagePlane(fov, stack, crop, slice,
          nR.getOrElse(nRows), nC.getOrElse(nCols),
          ch.getOrElse(channels),
          px.getOrElse(new Array[Float](channels.length * nRows * nCols)),
          lb.getOrElse(new Array[Int](nRows * nCols)))
      }
  }
}
