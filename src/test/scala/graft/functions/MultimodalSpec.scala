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
