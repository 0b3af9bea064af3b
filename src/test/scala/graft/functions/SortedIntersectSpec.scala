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

  test("sorted_intersect (values) matches array_intersect on random sorted arrays") {
    import SortedLongIntersect.sortedIntersect
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { _ =>
      val a = Seq.fill(rnd.nextInt(50))(rnd.nextInt(80).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(50))(rnd.nextInt(80).toLong).distinct.sorted
      (a, b)
    }
    val out = rows.toDF("a", "b")
      .withColumn("got", sortedIntersect(col("a"), col("b")))
      // array_intersect preserves left order; on sorted inputs both are
      // ascending, so direct equality is the right check
      .withColumn("want", array_intersect(col("a"), col("b")))
      .filter(not(col("got") <=> col("want")))
    assert(out.isEmpty, "codegen sorted merge disagrees with array_intersect")
    // count twin agrees with size(values)
    val cnt = rows.toDF("a", "b")
      .withColumn("n1", sortedIntersectCount(col("a"), col("b")))
      .withColumn("n2", size(sortedIntersect(col("a"), col("b"))))
      .filter(col("n1") =!= col("n2"))
    assert(cnt.isEmpty)
    // nulls propagate; empties intersect to empty (SQL surface)
    val df = Seq((Some(Seq(1L, 2L)), Option.empty[Seq[Long]]),
      (Some(Seq.empty[Long]), Some(Seq(1L)))).toDF("a", "b")
    df.createOrReplaceTempView("si_v")
    val got = spark.sql("SELECT sorted_intersect(a, b) AS v FROM si_v").collect()
    assert(got(0).isNullAt(0))
    assert(got(1).getSeq[Long](0).isEmpty)
  }
}
