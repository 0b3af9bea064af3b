package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSpec {

  test("native expression matches the built-in composition bit-for-bit") {
    import spark.implicits._
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(50)
      .withColumn("vec", transform(col("embedding"), (x: org.apache.spark.sql.Column) => x.cast("double")))
    val probe = df.filter(col("vec_id") === 0).select(col("vec").as("q"))
    val both = df.crossJoin(probe)
      .withColumn("native", CosineSimilarity.cosineSim(col("vec"), col("q")))
      .withColumn("builtin",
        aggregate(zip_with(col("vec"), col("q"), _ * _), lit(0.0), _ + _) /
          (sqrt(aggregate(transform(col("vec"), x => x * x), lit(0.0), _ + _)) *
           sqrt(aggregate(transform(col("q"), x => x * x), lit(0.0), _ + _))))
      .select("native", "builtin").collect()
    both.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), s"bitwise equal: $r")
    }
  }

  test("works on float arrays directly and via SQL registration") {
    import spark.implicits._
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(5)
    val self = df.withColumn("s",
      CosineSimilarity.cosineSim(col("embedding"), col("embedding")))
      .select("s").collect().map(_.getDouble(0))
    assert(self.forall(s => math.abs(s - 1.0) < 1e-6), "self-similarity = 1")
    df.createOrReplaceTempView("emb_cos_test")
    val viaSql = spark.sql(
      "SELECT cosine_sim(embedding, embedding) AS s FROM emb_cos_test")
      .collect().map(_.getDouble(0))
    assert(viaSql.forall(s => math.abs(s - 1.0) < 1e-6), "SQL surface registered")
  }

  test("null and zero-vector handling") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(0f, 0f)), Seq(1f, 2f)),
      (None, Seq(1f, 2f))).toDF("a", "b")
    val out = df.select(CosineSimilarity.cosineSim(col("a"), col("b"))).collect()
    assert(out.forall(_.isNullAt(0)), "zero vector and null input -> null")
  }
}
