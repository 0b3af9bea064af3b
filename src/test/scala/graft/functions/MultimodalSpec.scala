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
}
