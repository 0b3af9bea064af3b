package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class L2SquaredSpec extends SparkSpec {

  test("native expression matches the built-in composition bit-for-bit") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(50)
      .withColumn("vec", transform(col("embedding"), (x: org.apache.spark.sql.Column) => x.cast("double")))
    val probe = df.filter(col("vec_id") === 0).select(col("vec").as("q"))
    val both = df.crossJoin(probe)
      .withColumn("native", L2Squared.l2Sq(col("vec"), col("q")))
      .withColumn("builtin",
        aggregate(zip_with(col("vec"), col("q"), (x, y) => (x - y) * (x - y)),
          lit(0.0), _ + _))
      .select("native", "builtin").collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), s"bitwise equal: $r")
    }
  }

  test("float arrays, SQL registration and null handling") {
    import spark.implicits._
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(5)
    val self = df.withColumn("d", L2Squared.l2Sq(col("embedding"), col("embedding")))
      .select("d").collect().map(_.getDouble(0))
    assert(self.forall(_ == 0.0), "self-distance = 0")
    df.createOrReplaceTempView("emb_l2_test")
    val viaSql = spark.sql("SELECT l2_sq(embedding, embedding) AS d FROM emb_l2_test")
      .collect().map(_.getDouble(0))
    assert(viaSql.forall(_ == 0.0), "SQL surface registered")
    val nulls = Seq((Option.empty[Seq[Float]], Seq(1f, 2f)))
      .toDF("a", "b")
      .select(L2Squared.l2Sq(col("a"), col("b"))).collect()
    assert(nulls.forall(_.isNullAt(0)), "null input -> null")
  }
}
