package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The Spark-side machinery (schema, batch shape, partition-local
  * processing, feature columns) is real and tested; the codec itself
  * is STUBBED with a deterministic fake (`stubDecode`) because no
  * image/audio libraries ship in this environment — swap `stubDecode`
  * for a real decoder (e.g. ImageIO / ffmpeg bindings) and nothing
  * else changes.
  */
object Multimodal {

  case class MediaMeta(modality: String, declaredBytes: Long)
  case class MediaRow(id: Long, meta: MediaMeta, content: Array[Byte])
  case class MediaFeatures(id: Long, modality: String, nBytes: Long,
                           byteEntropy: Double, histogram: Seq[Long],
                           thumbnail: Seq[Float])

  /** STUB decoder: a real implementation would parse the container
    * (PNG/JPEG/WAV...) and return pixels/samples. The fake derives a
    * deterministic 16-bin byte histogram + 8-float "thumbnail" from
    * the raw bytes so the pipeline shape (fixed-size feature vectors
    * out of variable-size blobs) is faithful.
    */
  def stubDecode(content: Array[Byte]): (Array[Long], Array[Float]) = {
    val hist = new Array[Long](16)
    content.foreach(b => hist((b & 0xff) >> 4) += 1)
    val thumb = new Array[Float](8)
    var i = 0
    while (i < content.length) {
      thumb(i % 8) += (content(i) & 0xff) / 255f
      i += 1
    }
    if (content.nonEmpty) {
      var j = 0
      while (j < 8) { thumb(j) /= math.max(content.length / 8, 1); j += 1 }
    }
    (hist, thumb)
  }

  private def entropy(hist: Array[Long]): Double = {
    val n = hist.sum.toDouble
    if (n == 0) 0.0
    else -hist.filter(_ > 0).map { c => val p = c / n; p * math.log(p) / math.log(2) }.sum
  }

  /** Batch feature extraction: one partition-local pass, fixed-size
    * outputs. `mapPartitions` is the Scala analog of `mapInPandas` —
    * the decoder amortizes any per-batch setup across the partition.
    */
  def extractFeatures(ds: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition decoder setup would go here (codec init, model load)
      it.map { row =>
        val (hist, thumb) = stubDecode(row.content)
        MediaFeatures(row.id, row.meta.modality, row.content.length.toLong,
          entropy(hist), hist.toSeq, thumb.toSeq)
      }
    }
  }

  /** Wrap any (id, binary) DataFrame into the media schema. */
  def asMedia(df: DataFrame, idCol: String, binCol: String, modality: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      struct(lit(modality).as("modality"),
        length(col(binCol)).cast("long").as("declaredBytes")).as("meta"),
      col(binCol).as("content"))

  case class MediaFrame(id: Long, frameIdx: Int, nBytes: Long, byteEntropy: Double)

  /** Frame sampling — the video-modality path. The stub container is
    * chunked into fixed-size frames (a real decoder would seek
    * keyframes); only every `every`-th frame is DECODED, which is the
    * contract that matters at scale: one input row fans out to a
    * bounded number of frame rows and undecoded frames cost nothing.
    * Narrow flatMap, no shuffle.
    */
  def sampleFrames(ds: Dataset[MediaRow], every: Int,
                   frameBytes: Int = 4096): Dataset[MediaFrame] = {
    require(every >= 1, s"sample every-th frame, got $every")
    import ds.sparkSession.implicits._
    ds.flatMap { row =>
      val n = math.max(1, row.content.length / frameBytes)
      (0 until n by every).map { f =>
        val from = f * frameBytes
        val until = math.min(row.content.length, from + frameBytes)
        val frame = java.util.Arrays.copyOfRange(row.content, from, until)
        val (hist, _) = stubDecode(frame)
        MediaFrame(row.id, f, (until - from).toLong, entropy(hist))
      }
    }
  }

  /** Resize — fixed-target linear resample of the decoded thumbnail
    * (the 1-D stub analog of bilinear image resize; with a real codec
    * this is graft.ops.ImageResize over decoded pixels). Variable-size
    * blob in, fixed-size vector out, per row, no shuffle.
    */
  def resizeThumbnails(ds: Dataset[MediaFeatures], outSize: Int): Dataset[MediaFeatures] = {
    require(outSize >= 1, s"bad resize target $outSize")
    import ds.sparkSession.implicits._
    ds.map { f =>
      val in = f.thumbnail.toArray
      val out = new Array[Float](outSize)
      var i = 0
      while (i < outSize) {
        val pos = if (outSize == 1) 0.0 else i.toDouble * (in.length - 1) / (outSize - 1)
        val lo = pos.toInt
        val hi = math.min(in.length - 1, lo + 1)
        val frac = (pos - lo).toFloat
        out(i) = in(lo) * (1 - frac) + in(hi) * frac
        i += 1
      }
      f.copy(thumbnail = out.toSeq)
    }
  }
}
