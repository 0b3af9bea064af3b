package graft.sources.v2

import graft.sources.Tiff
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import java.util.concurrent.atomic.AtomicInteger

/** DataSource V2 for the raw-data ontology tree (S2, data_loader.py
  * `_assemble_paths`, :197-320):
  *
  *   `raw/<dynamic|static>/<2d|3d>/<imaging>/<specimen>/<Compartment_Marker>/<exp_id>/` .tif files
  *
  *   spark.read.format("graft.sources.v2.TiffDataSource")
  *     .option("granularity", "file" | "frame").load(dir)
  *
  * Scale behaviors the binaryFile+regex path cannot give:
  *   - **directory-level predicate pushdown**: EqualTo/In filters on
  *     any ontology level prune the TREE WALK itself — a query for
  *     `imaging = 'mibi'` never lists the fluo/ or Phase/ subtrees
  *     (the reference's per-level `fnmatch` walk, done by the planner).
  *   - **filename-pattern pushdown**: session/position predicates
  *     select files by the reference's `*_s{ss}_p{pp}` filename
  *     convention (data_loader.py:294-316) during the listing.
  *   - **column pruning** (frame granularity): if `pixels` is not
  *     projected the raster is never decoded — dims come from the
  *     TIFF directory header ([[Tiff.frameDims]]).
  *
  * `granularity=file` (default) emits one row per file with NO file
  * IO at all — the listing is the result (S3 `_datasets_available`
  * census shape). `granularity=frame` emits one row per TIFF frame
  * with decoded pixels, one input partition per file.
  */
class TiffDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TiffTable.schemaFor(options.getOrDefault("granularity", "file"))
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new TiffTable(properties.get("path"),
      Option(properties.get("granularity")).getOrElse("file"))
  override def supportsExternalMetadata(): Boolean = true
}

object TiffTable {
  /** Ontology + file identity: computable from the LISTING alone. */
  val FileSchema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("length", LongType, nullable = false),
    StructField("data_kind", StringType, nullable = false),
    StructField("dims", StringType, nullable = false),
    StructField("imaging", StringType, nullable = false),
    StructField("specimen", StringType, nullable = false),
    StructField("compartment", StringType, nullable = false),
    StructField("marker", StringType, nullable = false),
    StructField("exp_id", StringType, nullable = false),
    StructField("file_name", StringType, nullable = false),
    StructField("session", IntegerType, nullable = true),
    StructField("position", IntegerType, nullable = true)))

  /** Frame granularity adds the decoded plane. */
  val FrameSchema: StructType = StructType(FileSchema.fields ++ Seq(
    StructField("frame", IntegerType, nullable = false),
    StructField("nRows", IntegerType, nullable = false),
    StructField("nCols", IntegerType, nullable = false),
    StructField("pixels", ArrayType(FloatType), nullable = false)))

  def schemaFor(granularity: String): StructType = granularity match {
    case "file" => FileSchema
    case "frame" => FrameSchema
    case other => sys.error(s"granularity must be file|frame, got $other")
  }

  /** Test observability: files planned / directories listed by the
    * most recent scan.
    */
  val lastPlannedFiles = new AtomicInteger(-1)
  val lastListedDirs = new AtomicInteger(-1)

  /** `..._s{ss}_p{pp}.<ext>` filename convention
    * (data_loader.py:294-316).
    */
  private[v2] val SessionPos = ".*_s(\\d+)_p(\\d+)\\.[^.]+$".r
}

class TiffTable(path: String, granularity: String) extends Table with SupportsRead {
  override def name(): String = s"tiff:$granularity:$path"
  override def schema(): StructType = TiffTable.schemaFor(granularity)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TiffScanBuilder(path, granularity)
}

class TiffScanBuilder(path: String, granularity: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private val Pushable = Seq("data_kind", "dims", "imaging", "specimen",
    "compartment", "marker", "exp_id", "file_name", "session", "position")
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = TiffTable.schemaFor(granularity)

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo(a, _) => Pushable.contains(a)
      case In(a, _) => Pushable.contains(a)
      case _ => false
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    // capture the SESSION Hadoop conf at scan-build time (driver):
    // spark.hadoop.* settings — s3a credentials/endpoints, custom FS
    // impls, kerberos — must reach both the planner's directory walk
    // and the executor-side file opens; a bare `new Configuration()`
    // only sees env defaults
    val conf = SparkSession.active.sessionState.newHadoopConf()
    new TiffScan(path, granularity, pushed, required,
      new SerializableConfiguration(conf))
  }
}

/** One planned unit: a file plus its already-parsed ontology levels. */
case class TiffInputPartition(file: String, length: Long, levels: Array[String],
                              session: Option[Int], position: Option[Int])
    extends InputPartition

class TiffScan(path: String, granularity: String, pushed: Array[Filter],
               required: StructType, hadoopConf: SerializableConfiguration)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"TiffScan path=$path granularity=$granularity " +
      s"pushed=${pushed.mkString(",")} columns=${required.fieldNames.mkString(",")}"

  private def okStr(name: String, value: String): Boolean = pushed.forall {
    case EqualTo(a, v) if a == name => value == String.valueOf(v)
    case In(a, vs) if a == name => vs.map(String.valueOf).contains(value)
    case _ => true
  }

  private def okInt(name: String, value: Option[Int]): Boolean = pushed.forall {
    case EqualTo(a, v) if a == name =>
      value.contains(v.asInstanceOf[Number].intValue())
    case In(a, vs) if a == name =>
      value.exists(x => vs.map(_.asInstanceOf[Number].intValue()).contains(x))
    case _ => true
  }

  /** The reference's `_assemble_paths` walk with predicates applied AT
    * EACH LEVEL: a filtered level never lists its excluded subtrees.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val base = new Path(path)
    val fs = base.getFileSystem(hadoopConf.value)
    var listed = 0
    def dirs(p: Path): Seq[FileStatus] = {
      listed += 1
      fs.listStatus(p).toSeq.filter(_.isDirectory)
    }
    def step(parents: Seq[(Path, Array[String])], level: String): Seq[(Path, Array[String])] =
      parents.flatMap { case (p, levels) =>
        dirs(p).map(d => (d.getPath, levels :+ d.getPath.getName))
          .filter { case (_, ls) => okStr(level, ls.last) }
      }
    val l1 = step(Seq((base, Array.empty[String])), "data_kind")
    val l2 = step(l1, "dims")
    val l3 = step(l2, "imaging")
    val l4 = step(l3, "specimen")
    // level 5 is the combined Compartment_Marker directory: both
    // predicates prune it (the reference's `item1 + '_' + item2`
    // fnmatch, data_loader.py:259-261)
    val l5 = l4.flatMap { case (p, levels) =>
      dirs(p).map { d =>
        val name = d.getPath.getName
        val comp = name.split("_").headOption.getOrElse(name)
        val marker = name.split("_").lift(1).getOrElse("")
        (d.getPath, levels :+ comp :+ marker)
      }.filter { case (_, ls) =>
        okStr("compartment", ls(ls.length - 2)) && okStr("marker", ls.last)
      }
    }
    val l6 = step(l5, "exp_id")
    val parts = l6.flatMap { case (p, levels) =>
      listed += 1
      fs.listStatus(p).toSeq
        .filter(st => st.isFile && st.getPath.getName.endsWith(".tif"))
        .flatMap { st =>
          val name = st.getPath.getName
          val (sess, pos) = name match {
            case TiffTable.SessionPos(s, pn) => (Some(s.toInt), Some(pn.toInt))
            case _ => (None, None)
          }
          if (okStr("file_name", name) && okInt("session", sess) &&
              okInt("position", pos))
            Some(TiffInputPartition(st.getPath.toString, st.getLen,
              levels :+ name, sess, pos))
          else None
        }
    }
    TiffTable.lastPlannedFiles.set(parts.length)
    TiffTable.lastListedDirs.set(listed)
    parts.toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // broadcast once per scan; each executor-side reader pulls the
    // session conf from the broadcast instead of env defaults
    val bc = SparkSession.active.sparkContext
      .broadcast(hadoopConf)
    new TiffReaderFactory(granularity, required, bc)
  }
}

class TiffReaderFactory(granularity: String, required: StructType,
                        hadoopConf: Broadcast[SerializableConfiguration])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new TiffPartitionReader(partition.asInstanceOf[TiffInputPartition],
      granularity, required, hadoopConf)
}

class TiffPartitionReader(part: TiffInputPartition, granularity: String,
                          required: StructType,
                          hadoopConf: Broadcast[SerializableConfiguration])
    extends PartitionReader[InternalRow] {

  // levels = data_kind, dims, imaging, specimen, compartment, marker,
  // exp_id, file_name (parsed at planning time — no IO needed)
  private def fileValue(name: String): Any = name match {
    case "path" => UTF8String.fromString(part.file)
    case "length" => part.length
    case "data_kind" => UTF8String.fromString(part.levels(0))
    case "dims" => UTF8String.fromString(part.levels(1))
    case "imaging" => UTF8String.fromString(part.levels(2))
    case "specimen" => UTF8String.fromString(part.levels(3))
    case "compartment" => UTF8String.fromString(part.levels(4))
    case "marker" => UTF8String.fromString(part.levels(5))
    case "exp_id" => UTF8String.fromString(part.levels(6))
    case "file_name" => UTF8String.fromString(part.levels(7))
    case "session" => part.session.map(Int.box).orNull
    case "position" => part.position.map(Int.box).orNull
    case other => sys.error(s"unknown file-level column $other")
  }

  private lazy val rows: Iterator[InternalRow] =
    if (granularity == "file") {
      // the listing IS the row — zero file IO
      Iterator.single(new GenericInternalRow(
        required.fieldNames.map(fileValue).asInstanceOf[Array[Any]]))
    } else {
      val needPixels = required.fieldNames.contains("pixels")
      require(part.length <= Int.MaxValue,
        s"TIFF file ${part.file} is ${part.length} bytes; files over 2 GiB " +
          "are not supported by the in-memory frame decoder")
      val p = new Path(part.file)
      val fs = p.getFileSystem(hadoopConf.value.value)
      val in = fs.open(p)
      val bytes = try {
        val buf = new Array[Byte](part.length.toInt)
        in.readFully(0, buf)
        buf
      } finally in.close()
      // column pruning: header-only when the projection drops pixels
      val frames: Seq[(Int, Int, Int, Option[Array[Float]])] =
        if (needPixels)
          Tiff.decodeFrames(bytes).map { case (i, r, c, px) => (i, r, c, Some(px)) }
        else
          Tiff.frameDims(bytes).zipWithIndex.map { case ((r, c), i) => (i, r, c, None) }
      frames.iterator.map { case (i, nR, nC, px) =>
        val values = required.fieldNames.map {
          case "frame" => i
          case "nRows" => nR
          case "nCols" => nC
          case "pixels" => new GenericArrayData(px.get)
          case other => fileValue(other)
        }
        new GenericInternalRow(values.asInstanceOf[Array[Any]])
      }
    }

  private var current: InternalRow = _
  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
