package graft.sources

import graft.core.ImagePlane
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

/** TIFF ingest (S6/S7 in SURVEY.md §2.1: data_loader.load_imagedata,
  * misc_utils.get_image) and the CellNet-ontology directory scan
  * (S1/S2: the 9-level tree whose walk-with-pruning is Hive-style
  * partition pruning).
  *
  * Decode uses the JDK's built-in TIFF ImageIO plugin (JDK 9+) inside
  * a distributed `binaryFile` scan — executors decode their own files.
  * Multi-frame TIFFs yield one plane per frame (stack index).
  */
object Tiff {

  /** Decode all frames of one TIFF into (stack, rows, cols, pixels). */
  def decodeFrames(bytes: Array[Byte]): Seq[(Int, Int, Int, Array[Float])] = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    val readers = ImageIO.getImageReaders(iis)
    require(readers.hasNext, "no ImageIO reader for input (TIFF plugin missing?)")
    val reader = readers.next()
    reader.setInput(iis)
    val n = reader.getNumImages(true)
    val out = (0 until n).map { i =>
      val img = reader.read(i)
      val raster = img.getRaster
      val rows = img.getHeight
      val cols = img.getWidth
      val pixels = new Array[Float](rows * cols)
      val row = new Array[Float](cols)
      var r = 0
      while (r < rows) {
        raster.getSamples(0, r, cols, 1, 0, row)
        System.arraycopy(row, 0, pixels, r * cols, cols)
        r += 1
      }
      (i, rows, cols, pixels)
    }
    reader.dispose()
    iis.close()
    out
  }

  /** Frame dimensions only — reads the TIFF directory headers, never
    * decodes a raster. The column-pruned metadata path of the V2
    * source: `SELECT file_name, count(*)` costs header parses, not
    * tensor decodes.
    */
  def frameDims(bytes: Array[Byte]): Seq[(Int, Int)] = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    val readers = ImageIO.getImageReaders(iis)
    require(readers.hasNext, "no ImageIO reader for input (TIFF plugin missing?)")
    val reader = readers.next()
    reader.setInput(iis)
    val n = reader.getNumImages(true)
    val out = (0 until n).map(i => (reader.getHeight(i), reader.getWidth(i)))
    reader.dispose()
    iis.close()
    out
  }

  /** S6/S7: scan a directory tree of TIFFs into planes; fov = file
    * name, stack = frame index. `pathGlobFilter` pushes the filename
    * pattern (e.g. `*_s01_p02.tif`) into the file listing — the
    * reference's filename-pattern pushdown (data_loader.py:294-316).
    */
  def readTiffDir(spark: SparkSession, dir: String,
                  glob: String = "*.tif"): Dataset[ImagePlane] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val fov = new java.io.File(path).getName.replaceAll("\\.tiff?$", "")
        decodeFrames(bytes).map { case (stack, rows, cols, pixels) =>
          ImagePlane(fov, stack, 0, 0, rows, cols, Seq("channel0"),
            pixels, new Array[Int](rows * cols))
        }
      }
  }

  /** S9 `get_images_from_directory` (misc_utils.py:72-104; the
    * reference body is dead code — it calls an undefined `K.floatx()`
    * — so semantics are reconstructed from its docstring and shape
    * logic): every file whose name contains a channel name, naturally
    * sorted per channel, aligned by list position into channel-stacked
    * planes. The per-channel listings are driver-side metadata (file
    * NAMES only); decode and stacking run distributed — each stack
    * index is one `groupByKey` group of `nChannels` single-channel
    * frames.
    */
  def readChannelStackedDir(spark: SparkSession, dir: String, channels: Seq[String],
                            glob: String = "*.tif*"): Dataset[ImagePlane] = {
    import spark.implicits._
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.globStatus(new org.apache.hadoop.fs.Path(dir, glob))
      .map(_.getPath.getName).toSeq
    val byChannel = channels.map(c =>
      graft.functions.Strings.sortedNicely(names.filter(_.contains(c))))
    val counts = byChannel.map(_.length)
    require(counts.nonEmpty && counts.head > 0 && counts.distinct.length == 1,
      s"per-channel file lists must be equal and non-empty: ${channels.zip(counts)}")
    // name -> (channelIdx, stackIdx); stack fov = channel-0 file base
    val index: Map[String, (Int, Int)] = byChannel.zipWithIndex.flatMap {
      case (files, ch) => files.zipWithIndex.map { case (f, st) => f -> (ch, st) }
    }.toMap
    val stackFov: Map[Int, String] = byChannel.head.zipWithIndex.map {
      case (f, st) => st -> f.replaceAll("\\.tiff?$", "")
    }.toMap
    val bIndex = spark.sparkContext.broadcast(index)
    val bFov = spark.sparkContext.broadcast(stackFov)
    val chNames = channels
    val nCh = channels.length
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val name = new java.io.File(path).getName
        bIndex.value.get(name).toSeq.map { case (ch, st) =>
          val (_, rows, cols, px) = decodeFrames(bytes).head
          (st, ch, rows, cols, px)
        }
      }
      .groupByKey(_._1)
      .mapGroups { (st, it) =>
        val frames = it.toSeq.sortBy(_._2)
        require(frames.length == nCh, s"stack $st has ${frames.length} of $nCh channels")
        val rows = frames.head._3
        val cols = frames.head._4
        val pixels = new Array[Float](nCh * rows * cols)
        frames.foreach { case (_, ch, r, c, px) =>
          require(r == rows && c == cols, s"stack $st frame size mismatch")
          System.arraycopy(px, 0, pixels, ch * rows * cols, rows * cols)
        }
        ImagePlane(bFov.value(st), st, 0, 0, rows, cols, chNames,
          pixels, new Array[Int](rows * cols))
      }
  }

  /** S1 vocab normalization (data_loader.py:110-146): canonicalize the
    * common misspellings of ontology enum values.
    */
  val VocabMap: Map[String, String] = Map(
    "fluorescent" -> "fluo", "fluorescence" -> "fluo",
    "nuc" -> "Nuclear", "nuclear" -> "Nuclear",
    "wholecell" -> "WholeCell", "whole_cell" -> "WholeCell")

  def normalizeVocab(term: String): String =
    VocabMap.getOrElse(term.toLowerCase, term)

  /** S2/S4: scan the ontology tree
    * `raw/<dynamic|static>/<2d|3d>/<imaging>/<specimen>/<Compartment_Marker>/<exp_id>/file.tif`
    * via the V2 source (`graft.sources.v2.TiffDataSource`): each
    * predicate becomes a Catalyst `In` filter pushed into the scan,
    * which prunes the DIRECTORY WALK itself level by level — the
    * planner never lists subtrees a predicate excludes, exactly the
    * reference's `_assemble_paths` fnmatch walk
    * (data_loader.py:197-320). Predicates passed as 'all' mean no
    * filter.
    */
  def scanOntology(spark: SparkSession, baseDir: String,
                   dataKinds: Seq[String] = Seq("all"),
                   dims: Seq[String] = Seq("all"),
                   imagingTypes: Seq[String] = Seq("all"),
                   specimenTypes: Seq[String] = Seq("all"),
                   compartments: Seq[String] = Seq("all"),
                   markers: Seq[String] = Seq("all")): DataFrame = {
    var out = spark.read.format("graft.sources.v2.TiffDataSource")
      .option("granularity", "file")
      .load(baseDir)
    def applyFilter(c: String, vals: Seq[String]): Unit =
      if (vals.nonEmpty && vals != Seq("all"))
        out = out.filter(col(c).isin(vals.map(normalizeVocab): _*))
    applyFilter("data_kind", dataKinds)
    applyFilter("dims", dims)
    applyFilter("imaging", imagingTypes)
    applyFilter("specimen", specimenTypes)
    applyFilter("compartment", compartments)
    applyFilter("marker", markers)
    out
  }

  /** S3 `_datasets_available` (data_loader.py:320-331): per-directory
    * file census, flagging empty or single-file experiment dirs.
    */
  def datasetsAvailable(spark: SparkSession, baseDir: String): DataFrame =
    scanOntology(spark, baseDir)
      .groupBy("data_kind", "dims", "imaging", "specimen", "compartment", "marker", "exp_id")
      .agg(count(lit(1)).as("n_files"))
      .withColumn("flag",
        when(col("n_files") <= 1, lit("sparse")).otherwise(lit("ok")))
      .orderBy("data_kind", "dims", "imaging", "specimen", "exp_id")

  /** S5 `_check_compatibility` (data_loader.py:333-361): assert the
    * selected datasets agree on the given columns (one distinct value
    * each); returns the offending column names.
    */
  def incompatibleColumns(df: DataFrame, cols: Seq[String]): Seq[String] = {
    val counts = df.agg(
      countDistinct(col(cols.head)).as(cols.head),
      cols.tail.map(c => countDistinct(col(c)).as(c)): _*).first()
    cols.filter(c => counts.getAs[Long](c) > 1)
  }

  /** S4 `load_metadata` (data_loader.py:375-394): one row per
    * experiment `metadata` JSON with the reference's enrichment —
    * `TYPE`/`ONTOLOGY` arrays space-joined (`str.cat(sep=' ')`,
    * data_loader.py:385-386), the single-element array wrappers around
    * scalars/structs unwrapped, and the experiment's image directory
    * attached (the `PATHS` column, data_loader.py:389-390) derived from
    * each file's own path.
    *
    * The reference's `dropna()` runs PER FILE before `pd.concat`
    * (data_loader.py:386, 393): a row drops only when a key present in
    * that document's own JSON is null. Keys the document never had —
    * introduced by other experiments' metadata during the schema union —
    * stay null, exactly as `pd.concat` fills NaN without dropping.
    */
  def loadMetadata(spark: SparkSession, baseDir: String): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val schema = spark.read.option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "metadata")
      .option("multiLine", "true")
      .json(baseDir).schema
    val parsed = spark.read.option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "metadata")
      .option("wholetext", "true")
      .text(baseDir)
      .select(
        from_json(col("value"), schema).as("_doc"),
        expr("json_object_keys(value)").as("_present"),
        input_file_name().as("metadata_path"))
    val presentKeyNull = schema.fields.map { f =>
      array_contains(col("_present"), f.name) && col("_doc").getField(f.name).isNull
    }.reduceOption(_ || _).getOrElse(lit(false))
    val cols = schema.fields.map { f =>
      val v = col("_doc").getField(f.name)
      f.dataType match {
        case ArrayType(StringType, _) if f.name == "TYPE" || f.name == "ONTOLOGY" =>
          array_join(v, " ").as(f.name)
        case ArrayType(_, _) => element_at(v, 1).as(f.name)
        case _ => v.as(f.name)
      }
    }
    parsed.filter(!presentKeyNull)
      .select(cols :+ col("metadata_path"): _*)
      .withColumn("image_path", regexp_replace(col("metadata_path"), "/metadata$", ""))
  }
}
