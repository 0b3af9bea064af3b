package graft.functions

import graft.SparkSpec
import graft.ops.ImageFunctions
import org.apache.spark.sql.functions._

class SkewAndClaheSpec extends SparkSpec {

  test("saltedJoin returns exactly the unsalted join rows under heavy skew") {
    import spark.implicits._
    // 90% of the big side shares one key
    val big = ((1 to 9000).map(_ => 1) ++ (1 to 1000).map(i => i % 50 + 2))
      .zipWithIndex.toDF("k", "row_id")
    val small = (1 to 60).map(k => (k, s"dim_$k")).toDF("k", "name")
    val expected = big.join(small, Seq("k")).select("row_id", "name")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    val salted = Skew.saltedJoin(big, small, "k", salts = 8)
      .select("row_id", "name")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(salted == expected)
  }

  test("saltedCountDistinct equals plain countDistinct") {
    import spark.implicits._
    val df = (1 to 5000).map(i => ("hot", i % 700)) ++ (1 to 100).map(i => ("cold", i))
    val data = df.toDF("k", "v")
    val plain = data.groupBy("k").agg(countDistinct("v").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCountDistinct(data, "k", "v", salts = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain && plain == Map("hot" -> 700L, "cold" -> 100L))
  }

  test("CLAHE: range-bounded, deterministic, adapts local contrast") {
    val rng = new scala.util.Random(9)
    val n = 64
    // left half: low-contrast dark band; right half: full-range noise
    val img = Array.tabulate(n * n) { i =>
      val c = i % n
      if (c < n / 2) 40f + rng.nextFloat() * 10f
      else rng.nextFloat() * 255f
    }
    val out = ImageFunctions.clahe(img, n, n, tilesR = 4, tilesC = 4, clipLimit = 0.05)
    assert(out.forall(v => v >= 0f && v <= 255.5f))
    assert(ImageFunctions.clahe(img, n, n, 4, 4, 0.05).toSeq == out.toSeq, "deterministic")
    def spread(a: Seq[Float]) = a.max - a.min
    val leftIn = (0 until n).flatMap(r => (0 until n / 2).map(c => img(r * n + c)))
    val leftOut = (0 until n).flatMap(r => (0 until n / 2).map(c => out(r * n + c)))
    assert(spread(leftOut) > spread(leftIn) * 2,
      s"local contrast expanded: ${spread(leftIn)} -> ${spread(leftOut)}")
    // clip limiting: tiny clip keeps the mapping near-identity-flat
    val flat = Array.fill(n * n)(100f)
    val flatOut = ImageFunctions.clahe(flat, n, n)
    assert(flatOut.forall(v => math.abs(v - flatOut.head) < 1e-3), "uniform stays uniform")
  }
}
