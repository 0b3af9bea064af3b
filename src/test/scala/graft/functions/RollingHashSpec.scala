package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RollingHashSpec extends SparkSpec {

  /** Naive per-position polynomial — the semantics the rolling
    * recurrence must reproduce exactly.
    */
  private def naive(s: String, k: Int, b: Long, m: Long): Seq[Long] = {
    val cps = s.codePoints().toArray
    if (cps.length < k) Seq.empty
    else (0 to cps.length - k).map { i =>
      cps.slice(i, i + k).foldLeft(0L)((h, c) => (h * b + c) % m)
    }
  }

  test("rolling recurrence equals the naive polynomial at every position") {
    import spark.implicits._
    val texts = Seq("abcdefgh", "aaaa", "abc", "", "the quick brown fox",
      "xyxyxyxyxyxy")
    val got = texts.toDF("t")
      .select(RollingHash.rollingHash(col("t"), 4).as("h"))
      .collect().map(_.getSeq[Long](0).toSeq)
    texts.zip(got).foreach { case (t, g) =>
      assert(g == naive(t, 4, 31L, 1000000007L), s"mismatch for '$t'")
    }
  }

  test("SQL registration and parameter validation") {
    import spark.implicits._
    Seq("hello world").toDF("t").createOrReplaceTempView("rh_t")
    val viaSql = spark.sql("SELECT rolling_hash(t, 4, 31, 1000000007) AS h FROM rh_t")
      .collect().head.getSeq[Long](0).toSeq
    assert(viaSql == naive("hello world", 4, 31L, 1000000007L))
    // identical strings -> identical fingerprints; one char change ->
    // only the k overlapping hashes change
    val a = naive("abcdefghij", 4, 31L, 1000000007L)
    val b = naive("abcdeXghij", 4, 31L, 1000000007L)
    assert(a.zip(b).count { case (x, y) => x != y } == 4, "exactly k windows differ")
  }

  test("non-BMP characters are single gram units (codepoint semantics)") {
    import spark.implicits._
    // U+1F600 is two UTF-16 code units but ONE codepoint: "a😀b" has
    // exactly one 3-gram, hashed over (97, 128512, 98).
    val s = "a😀b"
    val got = Seq(s).toDF("t")
      .select(RollingHash.rollingHash(col("t"), 3).as("h"))
      .collect().head.getSeq[Long](0).toSeq
    assert(got.length == 1, "one window over 3 codepoints")
    assert(got == naive(s, 3, 31L, 1000000007L))
    val expected = Seq(97L, 128512L, 98L).foldLeft(0L)((h, c) => (h * 31L + c) % 1000000007L)
    assert(got.head == expected)
  }
}
