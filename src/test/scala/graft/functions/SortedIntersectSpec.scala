package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SortedLongIntersectCount: merge-intersection over sorted distinct
  * long arrays, checked against a Scala Set oracle on random inputs
  * (exercises the codegen path — DataFrame select — and null handling).
  */
class SortedIntersectSpec extends SparkSpec {
  import spark.implicits._
  import SortedLongIntersectCount.sortedIntersectCount

  test("matches set-intersection oracle on random sorted arrays") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 200).map { _ =>
      val a = Seq.fill(rnd.nextInt(50))(rnd.nextInt(80).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(50))(rnd.nextInt(80).toLong).distinct.sorted
      (a, b, a.toSet.intersect(b.toSet).size)
    }
    val out = rows.toDF("a", "b", "expected")
      .withColumn("got", sortedIntersectCount(col("a"), col("b")))
      .filter(col("got") =!= col("expected"))
    assert(out.isEmpty, "codegen merge disagrees with Set oracle")
  }

  test("empty and disjoint arrays, SQL surface") {
    val df = Seq(
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(1L, 3L, 5L), Seq(2L, 4L, 6L)),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L))).toDF("a", "b")
    df.createOrReplaceTempView("si_t")
    val got = spark.sql("SELECT sorted_intersect_count(a, b) AS c FROM si_t")
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(0, 0, 3))
  }

  test("null input yields null") {
    val df = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
    val r = df.select(sortedIntersectCount(col("a"), col("b"))).collect()
    assert(r.head.isNullAt(0))
  }
}
