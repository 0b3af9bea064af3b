package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MinhashEstimateSpec extends SparkSpec {

  test("estimates agree with the Scala reference implementation") {
    import spark.implicits._
    val df = Seq(
      (Seq(1L, 2L, 3L, 4L), Seq(1L, 9L, 3L, 8L)), // 2/4 agree
      (Seq(5L, 5L), Seq(5L, 5L)),                 // identical
      (Seq(1L), Seq(2L))                          // disjoint
    ).toDF("a", "b")
    val got = df.select(MinhashEstimate.minhashEst(col("a"), col("b"))).collect()
      .map(_.getDouble(0))
    assert(got.toSeq == Seq(0.5, 1.0, 0.0))
    // matches Dedup.estimateJaccard exactly
    assert(Dedup.estimateJaccard(Array(1L, 2L, 3L, 4L), Array(1L, 9L, 3L, 8L)) == 0.5)
  }

  test("SQL registration and null/empty handling") {
    import spark.implicits._
    val one = Seq((Seq(7L, 8L), Seq(7L, 9L))).toDF("a", "b")
    one.createOrReplaceTempView("mh_pairs")
    val viaSql = spark.sql("SELECT minhash_est(a, b) AS e FROM mh_pairs")
      .collect().head.getDouble(0)
    assert(viaSql == 0.5)
    val empty = Seq((Seq.empty[Long], Seq.empty[Long])).toDF("a", "b")
    assert(empty.select(MinhashEstimate.minhashEst(col("a"), col("b")))
      .collect().head.isNullAt(0), "empty signatures -> null")
  }
}
