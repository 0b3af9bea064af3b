package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property coverage for the DEFAULT-ON naive-inequality-join rewrite:
  * over randomly generated interval/point tables — NULL bounds,
  * inverted intervals, spans wider than the fan-out cap, duplicate
  * keys, empty sides — and randomly drawn bucket widths and caps, the
  * rewritten join must return EXACTLY the rows of the plain join it
  * replaces. This is the correctness artifact behind flipping
  * `spark.graft.rangeJoin.rewriteNaive` on by default (BASELINE.md
  * round-14 trial): the plan sweep shows where the rule fires, this
  * spec shows that wherever it fires, results cannot change.
  */
class NaiveRewritePropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(1400L + i)))

  private val caseGen: Gen[(Seq[(Long, Long, Option[Long], Option[Long])],
      Seq[(Long, Long)], Long, Int)] = for {
    nLeft <- Gen.choose(0, 30)
    nRight <- Gen.choose(0, 60)
    width <- Gen.oneOf(1L, 3L, 10L, 100L)
    cap <- Gen.oneOf(1, 2, 8, 64)
    left <- Gen.listOfN(nLeft, for {
      k <- Gen.choose(0L, 4L)
      id <- Gen.choose(0L, 1000000L)
      // spans from sub-bucket to far beyond any cap; 10% NULL bounds,
      // and lo > hi inversions arise naturally from independent draws
      lo <- Gen.option(Gen.choose(-500L, 500L))
        .map(o => if (o.isEmpty) None else o)
      span <- Gen.oneOf(Gen.choose(0L, 20L), Gen.choose(0L, 10000L))
      inverted <- Gen.prob(0.15)
      noHi <- Gen.prob(0.1)
    } yield {
      val hi = lo.map(l => if (inverted) l - span - 1 else l + span)
      (k, id, lo, if (noHi) None else hi)
    })
    right <- Gen.listOfN(nRight, for {
      k <- Gen.choose(0L, 4L)
      t <- Gen.choose(-600L, 600L)
    } yield (k, t))
  } yield (left, right, width, cap)

  test("rewrite-on == rewrite-off over random intervals, widths and caps") {
    val flag = "spark.graft.rangeJoin.rewriteNaive"
    val wKey = "spark.graft.rangeJoin.bucketWidthUs"
    val cKey = "spark.graft.rangeJoin.maxBucketsPerRow"
    try {
      samples(caseGen, 60).zipWithIndex.foreach {
        case ((left, right, width, cap), i) =>
          val l = left.toDF("k", "id", "lo", "hi")
          val r = right.toDF("rk", "t")
          def joined() = l.join(r,
            col("k") === col("rk") &&
              col("t") >= col("lo") && col("t") <= col("hi"))
          spark.conf.set(flag, "false")
          val expected = joined().collect().map(_.toString).sorted.toSeq
          spark.conf.set(flag, "true")
          spark.conf.set(wKey, width.toString)
          spark.conf.set(cKey, cap.toString)
          val got = joined().collect().map(_.toString).sorted.toSeq
          assert(got == expected,
            s"case $i (width=$width cap=$cap nL=${left.size} nR=${right.size}): " +
              s"missing=${(expected.diff(got)).take(3)} " +
              s"extra=${(got.diff(expected)).take(3)}")
      }
    } finally {
      spark.conf.unset(flag); spark.conf.unset(wKey); spark.conf.unset(cKey)
    }
  }
}
