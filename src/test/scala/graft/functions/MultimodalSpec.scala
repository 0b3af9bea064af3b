package graft.functions

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("extractFeatures: fixed-size features from variable blobs, deterministic") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, Multimodal.MediaMeta("image/fake", 4),
        Array[Byte](0, 16, 32, 127)),
      Multimodal.MediaRow(2L, Multimodal.MediaMeta("image/fake", 0), Array.empty[Byte]),
      Multimodal.MediaRow(3L, Multimodal.MediaMeta("audio/fake", 1000),
        Array.tabulate(1000)(i => (i % 256).toByte)))
    val out = Multimodal.extractFeatures(spark.createDataset(rows))
      .collect().map(f => f.id -> f).toMap
    assert(out(1L).histogram.length == 16 && out(1L).thumbnail.length == 8)
    assert(out(1L).nBytes == 4)
    assert(out(2L).byteEntropy == 0.0, "empty blob")
    // uniform bytes -> max entropy (log2 16 = 4)
    assert(math.abs(out(3L).byteEntropy - 4.0) < 0.01)
    val again = Multimodal.extractFeatures(spark.createDataset(rows))
      .collect().map(f => f.id -> f.histogram).toMap
    assert(again(3L) == out(3L).histogram)
  }

  test("real ImageIO decode: gray PNG round-trips pixels exactly into features") {
    import spark.implicits._
    // known pixels: gradient 0..63 scaled x4 -> values 0,4,...,252
    val gray = Array.tabulate(64)(i => (i * 4).toByte)
    val png = Multimodal.encodeGrayPng(gray, 8, 8)
    val decoded = Multimodal.decodeImage(png)
    assert(decoded.isDefined, "ImageIO reads its own PNG")
    val (h, w, lum) = decoded.get
    assert(h == 8 && w == 8)
    assert(lum.toSeq == gray.map(b => (b & 0xff).toFloat).toSeq,
      "single-band decode is sample-exact (no sRGB distortion)")
    val rows = Seq(Multimodal.MediaRow(1L,
      Multimodal.MediaMeta("image/png", png.length.toLong), png))
    val f = Multimodal.extractFeatures(spark.createDataset(rows)).collect().head
    assert(f.pixelWidth == 8 && f.pixelHeight == 8, "decoded dimensions reported")
    assert(f.histogram == Multimodal.grayHistogram(gray).toSeq,
      "pixel histogram == source-byte histogram")
    // 0..252 step 4 fills each of the 16 bins with exactly 4 pixels
    assert(f.histogram.forall(_ == 4L))
    assert(math.abs(f.byteEntropy - 4.0) < 1e-9, "uniform bins -> log2(16) bits")
    assert(f.thumbnail.length == Multimodal.thumbSide * Multimodal.thumbSide)
    assert(f.thumbnail.forall(v => v >= 0f && v <= 1f), "thumbnail normalized")
  }

  test("real ImageIO decode: RGB PNG uses Rec.601 luminance; garbage falls back") {
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (r <- 0 until 4; c <- 0 until 4) img.setRGB(c, r, 0xff8040) // r=255 g=128 b=64
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val (hh, ww, lum) = Multimodal.decodeImage(bos.toByteArray).get
    assert(hh == 4 && ww == 4)
    val expected = (0.299 * 255 + 0.587 * 128 + 0.114 * 64).toFloat
    assert(lum.forall(v => math.abs(v - expected) < 1e-3), s"got ${lum.head}")
    // constant image thumbnails to the constant value
    val rows = Seq(Multimodal.MediaRow(7L,
      Multimodal.MediaMeta("image/png", 0L), bos.toByteArray))
    val f = Multimodal.extractFeatures(spark.createDataset(rows)).collect().head
    assert(f.thumbnail.forall(v => math.abs(v - expected / 255f) < 1e-4))
    // non-image bytes: decode None -> byte-level fallback, no crash
    assert(Multimodal.decodeImage("definitely not an image".getBytes).isEmpty)
    val fb = Multimodal.extractFeatures(spark.createDataset(Seq(
      Multimodal.MediaRow(8L, Multimodal.MediaMeta("audio/fake", 3L),
        "abc".getBytes)))).collect().head
    assert(fb.pixelWidth == -1 && fb.pixelHeight == -1 && fb.thumbnail.length == 8)
  }

  test("sampleFrames decodes only every k-th fixed-size chunk") {
    import spark.implicits._
    val rows = Seq(
      // 5 frames of 100 bytes -> sampled frames 0, 2, 4
      Multimodal.MediaRow(1L, Multimodal.MediaMeta("video/fake", 500),
        Array.tabulate(500)(i => (i % 256).toByte)),
      // smaller than one frame -> single frame 0 of its own length
      Multimodal.MediaRow(2L, Multimodal.MediaMeta("video/fake", 40),
        Array.tabulate(40)(_.toByte)))
    val frames = Multimodal.sampleFrames(spark.createDataset(rows),
      every = 2, frameBytes = 100).collect()
    val byId = frames.groupBy(_.id)
    assert(byId(1L).map(_.frameIdx).sorted.toSeq == Seq(0, 2, 4))
    assert(byId(1L).forall(_.nBytes == 100))
    assert(byId(2L).map(f => (f.frameIdx, f.nBytes)).toSeq == Seq((0, 40L)))
    assert(frames.forall(_.byteEntropy >= 0.0))
  }

  test("WAV round-trip: encode 16-bit PCM, decode recovers samples") {
    val samples = Array.tabulate(1000)(i =>
      (0.7 * math.sin(2 * math.Pi * 5 * i / 1000 + 0.1)).toFloat)
    val wav = Multimodal.encodePcm16Wav(samples, 8000f)
    val Some((rate, ch, decoded)) = Multimodal.decodeAudio(wav)
    assert(rate == 8000f && ch == 1)
    assert(decoded.length == samples.length)
    // 16-bit quantization: one step is 1/32768
    val maxErr = samples.zip(decoded).map { case (a, b) => math.abs(a - b) }.max
    assert(maxErr <= 1.5f / 32768f, s"max quantization error $maxErr")
  }

  test("extractAudioFeatures: integer-cycle sine has exact RMS and ZCR") {
    import spark.implicits._
    val n = 2048
    val k = 7
    val samples = Array.tabulate(n)(i =>
      (0.5 * math.sin(2 * math.Pi * k * i / n + 0.1)).toFloat)
    val rows = Seq(
      Multimodal.MediaRow(1L, Multimodal.MediaMeta("audio/wav", 0),
        Multimodal.encodePcm16Wav(samples, 16000f)),
      // not audio: must be dropped, not faked
      Multimodal.MediaRow(2L, Multimodal.MediaMeta("text/fake", 0),
        "not a wav".getBytes("UTF-8")))
    val out = Multimodal.extractAudioFeatures(spark.createDataset(rows)).collect()
    assert(out.map(_.id).toSeq == Seq(1L))
    val f = out.head
    assert(f.sampleRate == 16000f && f.nSamples == n)
    // discrete orthogonality: RMS of an integer-cycle sine = A/sqrt(2)
    assert(math.abs(f.rms - 0.5 / math.sqrt(2)) < 1e-3, s"rms=${f.rms}")
    assert(f.zeroCrossings == 2L * k, s"zcr=${f.zeroCrossings}")
    // frequency domain: Goertzel argmax lands exactly on the planted bin
    assert(f.dominantBin == k, s"dominant bin ${f.dominantBin}")
    assert(f.histogram.sum == n)
    // amplitude 0.5 never reaches the outer bins
    assert(f.histogram.take(3).sum == 0 && f.histogram.takeRight(3).sum == 0)
  }

  test("goertzelBank: bit-identical to per-bin goertzelPower") {
    // mixed tones + noise-ish phase wobble so no bin is trivially zero
    val n = 1777 // non-power-of-2, odd: exercises the generic recurrence
    val samples = Array.tabulate(n) { i =>
      (0.4 * math.sin(2 * math.Pi * 3 * i / n + 0.2) +
        0.3 * math.sin(2 * math.Pi * 11 * i / n + 1.1) +
        0.1 * math.cos(2 * math.Pi * 29 * i / n)).toFloat
    }
    val bank = Multimodal.goertzelBank(samples, 16)
    (1 to 16).foreach { k =>
      // exact ==, not tolerance: the bank runs the same recurrence in
      // the same order per bin, only interleaved across bins
      assert(bank(k - 1) == Multimodal.goertzelPower(samples, k),
        s"bin $k: bank=${bank(k - 1)} scalar=${Multimodal.goertzelPower(samples, k)}")
    }
    assert(Multimodal.goertzelBank(Array.empty[Float], 16).forall(_ == 0.0))
    assert(Multimodal.goertzelBank(samples, 0).isEmpty)
  }

  test("decodeAudio: stereo folds to mono by channel average") {
    // hand-build a 2-channel WAV via AudioSystem with L = -R: mono fold = 0
    val nFrames = 64
    val bytes = new Array[Byte](nFrames * 4)
    (0 until nFrames).foreach { i =>
      val v = (math.sin(2 * math.Pi * i / nFrames) * 16384).toInt.toShort
      bytes(4 * i) = (v & 0xff).toByte; bytes(4 * i + 1) = ((v >> 8) & 0xff).toByte
      val w = (-v).toShort
      bytes(4 * i + 2) = (w & 0xff).toByte; bytes(4 * i + 3) = ((w >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 2, 4, 8000f, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val Some((rate, ch, mono)) = Multimodal.decodeAudio(bos.toByteArray)
    assert(rate == 8000f && ch == 2 && mono.length == nFrames)
    assert(mono.forall(v => math.abs(v) < 1f / 32768f), "L=-R folds to silence")
  }

  test("resizeThumbnails resamples to the target size, endpoint-exact") {
    import spark.implicits._
    val f = Multimodal.MediaFeatures(1L, "image/fake", 8, 0.0,
      Seq.fill(16)(0L), Seq(0f, 1f, 2f, 3f, 4f, 5f, 6f, 7f))
    val up = Multimodal.resizeThumbnails(spark.createDataset(Seq(f)), 15)
      .collect().head.thumbnail
    assert(up.length == 15)
    assert(up.head == 0f && up.last == 7f, "endpoints preserved")
    assert(up(1) == 0.5f, "linear midpoint")
    val down = Multimodal.resizeThumbnails(spark.createDataset(Seq(f)), 4)
      .collect().head.thumbnail
    assert(down.length == 4 && down.head == 0f && down.last == 7f)
  }
}
