package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The IMAGE path is a real decoder: JDK ImageIO reads PNG/JPEG/BMP/
  * GIF/WBMP out of the box (the same toolkit `sources/Tiff.scala` uses
  * for the reference TIFFs), and features — luminance histogram,
  * pixel entropy, bilinear thumbnail via `ops.ImageResize` — come from
  * decoded pixels. The AUDIO path is real too: the JDK's sampled-sound
  * stack decodes WAV/AIFF/AU PCM ([[decodeAudio]]) and features — RMS,
  * zero-crossing count, amplitude histogram — come from the samples.
  * Only blobs with neither reader (video containers, arbitrary bytes)
  * fall back to the deterministic byte-level featurizer `stubDecode`,
  * which keeps the pipeline shape (fixed-size feature vectors out of
  * variable-size blobs) faithful until a video codec is plugged in.
  */
object Multimodal {

  // ByteArrayInputStream decode must not round-trip through ImageIO's
  // disk-backed stream cache — per-blob temp files would be the hot-path
  // cost at scale.
  ImageIO.setUseCache(false)

  /** Thumbnail side: features carry a thumbSide x thumbSide grid. */
  val thumbSide = 4

  case class MediaMeta(modality: String, declaredBytes: Long)
  case class MediaRow(id: Long, meta: MediaMeta, content: Array[Byte])
  case class MediaFeatures(id: Long, modality: String, nBytes: Long,
                           byteEntropy: Double, histogram: Seq[Long],
                           thumbnail: Seq[Float],
                           pixelWidth: Int = -1, pixelHeight: Int = -1)

  /** Real image decode: luminance plane in [0,255], row-major, plus
    * (height, width). Single-band images read the raster sample
    * EXACTLY (no sRGB conversion — `getRGB` on TYPE_BYTE_GRAY distorts
    * linear gray), so gray PNG encode->decode round-trips bit-for-bit;
    * multi-band images use the Rec.601 luma weights. Returns None for
    * anything ImageIO has no reader for.
    */
  def decodeImage(content: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    if (content == null || content.isEmpty) return None
    val img =
      try ImageIO.read(new ByteArrayInputStream(content))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val lum = new Array[Float](w * h)
      val raster = img.getRaster
      if (raster.getNumBands == 1) {
        var r = 0
        while (r < h) {
          var c = 0
          while (c < w) { lum(r * w + c) = raster.getSample(c, r, 0).toFloat; c += 1 }
          r += 1
        }
      } else {
        var r = 0
        while (r < h) {
          var c = 0
          while (c < w) {
            val rgb = img.getRGB(c, r)
            lum(r * w + c) = (0.299 * ((rgb >> 16) & 0xff) +
              0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)).toFloat
            c += 1
          }
          r += 1
        }
      }
      Some((h, w, lum))
    }
  }

  /** Encode a row-major gray plane (one byte per pixel) as PNG —
    * lossless, so decode recovers the exact samples. Test-fixture and
    * demo-query helper.
    */
  def encodeGrayPng(gray: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(gray.length == w * h, s"${gray.length} bytes for ${w}x$h")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, w, h, gray)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic side x side gray tile from a string's UTF-8 bytes
    * (cyclic fill). The seedable "render" behind the PNG decode demo.
    */
  def grayTileOf(text: String, side: Int): Array[Byte] = {
    val src = text.getBytes("UTF-8")
    Array.tabulate(side * side)(i => if (src.isEmpty) 0.toByte else src(i % src.length))
  }

  /** 16-bin histogram over luminance values in [0,255]. */
  def pixelHistogram(lum: Array[Float]): Array[Long] = {
    val hist = new Array[Long](16)
    lum.foreach { v =>
      hist(math.min(15, math.max(0, math.round(v) >> 4))) += 1
    }
    hist
  }

  /** 16-bin histogram of raw gray bytes — by construction identical to
    * `pixelHistogram` over the decoded single-band image.
    */
  def grayHistogram(gray: Array[Byte]): Array[Long] = {
    val hist = new Array[Long](16)
    gray.foreach(b => hist((b & 0xff) >> 4) += 1)
    hist
  }

  /** Real audio decode via the JDK's sampled-sound stack (WAV/AIFF/AU
    * ship with the JVM — the same no-external-deps argument as the
    * ImageIO image path). Any PCM variant the stream reports (8/16-bit,
    * signed/unsigned, either endianness, any channel count) is
    * converted by AudioSystem to 16-bit signed PCM, then folded to a
    * mono float signal in [-1, 1] by averaging channels. Returns
    * (sampleRate, channels, samples); None for blobs with no audio
    * reader (video containers, arbitrary bytes).
    */
  def decodeAudio(content: Array[Byte]): Option[(Float, Int, Array[Float])] = {
    if (content == null || content.isEmpty) return None
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(content))
      try {
        val fmt = in.getFormat
        val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          fmt.getSampleRate, 16, fmt.getChannels, fmt.getChannels * 2,
          fmt.getSampleRate, false)
        val pcm = if (fmt.matches(target)) in
                  else AudioSystem.getAudioInputStream(target, in)
        val bytes = pcm.readAllBytes()
        val ch = target.getChannels
        val nFrames = bytes.length / (2 * ch)
        val mono = new Array[Float](nFrames)
        var f = 0
        while (f < nFrames) {
          var acc = 0f
          var c = 0
          while (c < ch) {
            val idx = (f * ch + c) * 2
            val lo = bytes(idx) & 0xff
            val hi = bytes(idx + 1).toInt // sign-carrying high byte
            acc += ((hi << 8) | lo) / 32768f
            c += 1
          }
          mono(f) = acc / ch
          f += 1
        }
        Some((fmt.getSampleRate, fmt.getChannels, mono))
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Encode a mono float signal in [-1, 1] as 16-bit PCM WAV —
    * [[decodeAudio]] recovers the samples up to one quantization step
    * (1/32768). Test-fixture and demo-query helper.
    */
  def encodePcm16Wav(samples: Array[Float], sampleRate: Float): Array[Byte] = {
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      val v = math.max(-1f, math.min(1f, samples(i)))
      val s = math.round(v * 32767f).toShort
      bytes(2 * i) = (s & 0xff).toByte
      bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, sampleRate,
      16, 1, 2, sampleRate, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(bytes), fmt,
      samples.length.toLong)
    val bos = new ByteArrayOutputStream()
    try AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos) finally ais.close()
    bos.toByteArray
  }

  /** Goertzel single-bin DFT power at DFT bin `k` over n samples —
    * O(n) per probed frequency, the right tool when only a few target
    * frequencies matter (tone detection) instead of a full FFT.
    * Returns |X_k|^2 / n^2 (normalized so a unit-amplitude sine at bin
    * k yields 0.25).
    */
  def goertzelPower(samples: Array[Float], k: Int): Double = {
    val n = samples.length
    if (n == 0) return 0.0
    val w = 2.0 * math.Pi * k / n
    val coeff = 2.0 * math.cos(w)
    var s0 = 0.0
    var s1 = 0.0
    var s2 = 0.0
    var i = 0
    while (i < n) {
      s0 = samples(i) + coeff * s1 - s2
      s2 = s1
      s1 = s0
      i += 1
    }
    val power = s1 * s1 + s2 * s2 - coeff * s1 * s2
    power / (n.toDouble * n)
  }

  /** One-pass Goertzel bank: powers at DFT bins 1..maxBin from a SINGLE
    * sweep of the samples — all maxBin recurrences advance per sample,
    * instead of maxBin full re-scans of the buffer. Each bin's state is
    * independent, so `bank(k-1)` is bit-identical to
    * `goertzelPower(samples, k)`.
    */
  def goertzelBank(samples: Array[Float], maxBin: Int): Array[Double] = {
    val n = samples.length
    val out = new Array[Double](math.max(maxBin, 0))
    if (n == 0 || maxBin <= 0) return out
    val coeff = new Array[Double](maxBin)
    val s1 = new Array[Double](maxBin)
    val s2 = new Array[Double](maxBin)
    var k = 0
    while (k < maxBin) {
      coeff(k) = 2.0 * math.cos(2.0 * math.Pi * (k + 1) / n)
      k += 1
    }
    var i = 0
    while (i < n) {
      val x = samples(i)
      var j = 0
      while (j < maxBin) {
        val s0 = x + coeff(j) * s1(j) - s2(j)
        s2(j) = s1(j)
        s1(j) = s0
        j += 1
      }
      i += 1
    }
    k = 0
    while (k < maxBin) {
      out(k) = (s1(k) * s1(k) + s2(k) * s2(k) - coeff(k) * s1(k) * s2(k)) /
        (n.toDouble * n)
      k += 1
    }
    out
  }

  /** 16-bin amplitude histogram over [-1, 1]. */
  def amplitudeHistogram(samples: Array[Float]): Array[Long] = {
    val hist = new Array[Long](16)
    samples.foreach { v =>
      val bin = ((v + 1f) / 2f * 16f).toInt
      hist(math.min(15, math.max(0, bin))) += 1
    }
    hist
  }

  /** Sample-level audio features. `zeroCrossings` counts strict sign
    * changes between consecutive samples (exact-zero samples carry the
    * previous sign, so a synthesized k-cycle sine yields exactly 2k).
    * `dominantBin` is the argmax of [[goertzelPower]] over DFT bins
    * 1..probeBins — bounded-cost tone detection on the DECODED samples
    * (a k-cycle sine detects as exactly bin k).
    */
  case class AudioFeatures(id: Long, modality: String, sampleRate: Float,
                           nChannels: Int, nSamples: Long, rms: Double,
                           zeroCrossings: Long, dominantBin: Int,
                           histogram: Seq[Long])

  /** Batch audio feature extraction (mapPartitions — decoder state
    * amortizes per partition, one fixed-size row per decodable blob).
    * Blobs without an audio reader are DROPPED, not faked: the byte
    * fallback now covers only the video path ([[sampleFrames]]).
    */
  def extractAudioFeatures(ds: Dataset[MediaRow],
                           probeBins: Int = 16): Dataset[AudioFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { row =>
        decodeAudio(row.content).map { case (rate, ch, mono) =>
          var sumSq = 0.0
          var crossings = 0L
          var prevSign = 0
          var i = 0
          while (i < mono.length) {
            val v = mono(i)
            sumSq += v.toDouble * v
            val sign = if (v > 0f) 1 else if (v < 0f) -1 else prevSign
            if (prevSign != 0 && sign != 0 && sign != prevSign) crossings += 1
            if (sign != 0) prevSign = sign
            i += 1
          }
          val rms = if (mono.isEmpty) 0.0 else math.sqrt(sumSq / mono.length)
          var best = 0
          var bestPow = -1.0
          val maxBin = math.min(probeBins, mono.length / 2)
          val powers = goertzelBank(mono, maxBin)
          var k = 1
          while (k <= maxBin) {
            val p = powers(k - 1)
            if (p > bestPow) { bestPow = p; best = k }
            k += 1
          }
          AudioFeatures(row.id, row.meta.modality, rate, ch,
            mono.length.toLong, rms, crossings, best,
            amplitudeHistogram(mono).toSeq)
        }
      }
    }
  }

  /** Byte-level fallback featurizer for modalities without an in-JVM
    * decoder (video containers, unrecognized blobs): 16-bin byte
    * histogram + 8-float byte "thumbnail", deterministic, so the
    * pipeline shape stays faithful where the codec is not yet real.
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
    * per-partition decoder setup amortizes across the batch. Images
    * (anything ImageIO recognizes) get PIXEL features: luminance
    * histogram, pixel entropy, and a bilinear thumbSide x thumbSide
    * thumbnail through `ops.ImageResize`'s kernel, normalized to [0,1].
    * Unrecognized blobs keep the byte-level fallback and report
    * pixelWidth/pixelHeight = -1.
    */
  def extractFeatures(ds: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition decoder setup would go here (codec init, model load)
      it.map { row =>
        decodeImage(row.content) match {
          case Some((h, w, lum)) =>
            val hist = pixelHistogram(lum)
            val thumb = graft.ops.ImageResize
              .bilinear(lum, h, w, 1, thumbSide, thumbSide).map(_ / 255f)
            MediaFeatures(row.id, row.meta.modality, row.content.length.toLong,
              entropy(hist), hist.toSeq, thumb.toSeq, w, h)
          case None =>
            val (hist, thumb) = stubDecode(row.content)
            MediaFeatures(row.id, row.meta.modality, row.content.length.toLong,
              entropy(hist), hist.toSeq, thumb.toSeq)
        }
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

  case class MediaFrame(id: Long, frameIdx: Int, nBytes: Long, byteEntropy: Double,
                        pixelWidth: Int = -1, pixelHeight: Int = -1,
                        meanLuma: Double = -1.0)

  /** YUV4MPEG2 ("Y4M") — the uncompressed interchange video container
    * (mjpegtools; the format ffmpeg/x264 pipe raw video through). A
    * REAL public codec parseable in pure JVM: ASCII stream header
    * `YUV4MPEG2 W<w> H<h> …` with an optional `C<chroma>` tag, then
    * per frame an ASCII `FRAME…\n` marker followed by raw planar YUV.
    */
  object Y4m {
    /** Bytes of one frame's pixel payload for a chroma tag. */
    private def frameBytes(w: Int, h: Int, chroma: String): Long = {
      val y = w.toLong * h
      chroma match {
        case c if c.startsWith("420") => y + 2 * ((w / 2).toLong * (h / 2))
        case c if c.startsWith("422") => y + 2 * ((w / 2).toLong * h)
        case c if c.startsWith("444") => y * 3
        case c if c.startsWith("mono") => y
        case other => throw new IllegalArgumentException(s"unsupported chroma C$other")
      }
    }

    /** Encode constant-chroma gray frames (luma planes, w*h bytes each)
      * as C420jpeg Y4M — the deterministic fixture writer.
      */
    def encodeGray(frames: Seq[Array[Byte]], w: Int, h: Int): Array[Byte] = {
      require(w % 2 == 0 && h % 2 == 0, s"C420 needs even dims, got ${w}x$h")
      frames.foreach(f => require(f.length == w * h, "bad luma plane size"))
      val out = new java.io.ByteArrayOutputStream()
      out.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420jpeg\n"
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      val chromaPlane = Array.fill[Byte]((w / 2) * (h / 2))(128.toByte)
      frames.foreach { y =>
        out.write("FRAME\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        out.write(y)
        out.write(chromaPlane) // U
        out.write(chromaPlane) // V
      }
      out.toByteArray
    }

    /** Walk a Y4M stream and decode ONLY every `every`-th frame's luma
      * plane; skipped frames advance by plane-size arithmetic without
      * copying a byte — the seek contract that matters when one row
      * holds thousands of frames. Returns None unless the header
      * parses and every present frame is complete (a truncated tail
      * frame rejects the blob rather than yielding garbage pixels).
      */
    def decodeSampledLuma(content: Array[Byte], every: Int)
        : Option[(Int, Int, Seq[(Int, Array[Byte])])] = {
      val magic = "YUV4MPEG2 ".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      if (content.length < magic.length ||
        !java.util.Arrays.equals(java.util.Arrays.copyOf(content, magic.length), magic))
        return None
      val headerEnd = content.indexOf('\n'.toByte)
      if (headerEnd < 0) return None
      val header = new String(content, 0, headerEnd,
        java.nio.charset.StandardCharsets.US_ASCII)
      val params = header.split(' ').drop(1)
      def intParam(tag: Char): Option[Int] =
        params.collectFirst { case p if p.nonEmpty && p.head == tag => p.tail.toInt }
      try {
        val w = intParam('W').getOrElse(return None)
        val h = intParam('H').getOrElse(return None)
        if (w <= 0 || h <= 0) return None
        val chroma = params.collectFirst { case p if p.startsWith("C") => p.tail }
          .getOrElse("420jpeg")
        val fb = frameBytes(w, h, chroma)
        val lumaLen = w * h
        val sampled = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Byte])]
        var pos = headerEnd + 1L
        var idx = 0
        while (pos < content.length) {
          // FRAME marker line (may carry per-frame params up to '\n')
          val lineEnd = {
            var i = pos.toInt
            while (i < content.length && content(i) != '\n'.toByte) i += 1
            i
          }
          if (lineEnd >= content.length) return None // truncated marker
          val marker = new String(content, pos.toInt, lineEnd - pos.toInt,
            java.nio.charset.StandardCharsets.US_ASCII)
          if (!marker.startsWith("FRAME")) return None
          val dataStart = lineEnd + 1L
          if (dataStart + fb > content.length) return None // truncated frame
          if (idx % every == 0)
            sampled += ((idx, java.util.Arrays.copyOfRange(
              content, dataStart.toInt, dataStart.toInt + lumaLen)))
          pos = dataStart + fb
          idx += 1
        }
        if (idx == 0) None else Some((w, h, sampled.toSeq))
      } catch { case _: NumberFormatException | _: IllegalArgumentException => None }
    }
  }

  /** 256-bin luma histogram entropy + mean of a decoded plane. */
  private def lumaStats(plane: Array[Byte]): (Double, Double) = {
    val hist = new Array[Long](256)
    var sum = 0L
    var i = 0
    while (i < plane.length) {
      val v = plane(i) & 0xff
      hist(v) += 1
      sum += v
      i += 1
    }
    (entropy(hist), if (plane.isEmpty) -1.0 else sum.toDouble / plane.length)
  }

  /** Frame sampling — the video-modality path. Y4M blobs get the REAL
    * decode: the walker seeks frame markers and decodes only every
    * `every`-th luma plane (skipped frames advance by arithmetic, no
    * copy), emitting true pixel dims, per-frame pixel entropy, and
    * mean luma. Non-Y4M blobs keep the declared byte-chunk fallback
    * (compressed containers have no in-JVM decoder here; the row shape
    * stays identical so the pipeline is codec-agnostic). Either way
    * one input row fans out to a bounded number of frame rows — the
    * contract that matters at scale. Narrow flatMap, no shuffle.
    */
  def sampleFrames(ds: Dataset[MediaRow], every: Int,
                   frameBytes: Int = 4096): Dataset[MediaFrame] = {
    require(every >= 1, s"sample every-th frame, got $every")
    import ds.sparkSession.implicits._
    ds.flatMap { row =>
      Y4m.decodeSampledLuma(row.content, every) match {
        case Some((w, h, frames)) =>
          frames.map { case (idx, luma) =>
            val (ent, mean) = lumaStats(luma)
            MediaFrame(row.id, idx, luma.length.toLong, ent, w, h, mean)
          }
        case None =>
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
  }

  /** Resize — fixed-target linear resample of the feature thumbnail
    * (for decoded images this rescales the real pixel thumbnail; the
    * full-resolution path is `graft.ops.ImageResize` over planes).
    * Variable-size blob in, fixed-size vector out, per row, no shuffle.
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
