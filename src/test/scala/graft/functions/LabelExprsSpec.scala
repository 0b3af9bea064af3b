package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LabelExprsSpec extends SparkSpec {

  test("distinct_nonzero_count equals the built-in composition on random masks") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val rows = (0 until 200).map { i =>
      (i, Array.fill(rng.nextInt(500) + 1)(rng.nextInt(40)))
    }
    val df = rows.toDF("id", "labels")
    val both = df.select(
      LabelExprs.distinctNonzeroCount(col("labels")).as("native"),
      size(array_distinct(filter(col("labels"), l => l =!= 0))).as("builtin"))
      .collect()
    both.foreach(r => assert(r.getInt(0) == r.getInt(1), s"$r"))
  }

  test("edge cases: empty, all-zero, all-distinct") {
    import spark.implicits._
    val df = Seq(
      (1, Array.empty[Int]),
      (2, Array(0, 0, 0)),
      (3, (1 to 1000).toArray),
      (4, Array(7, 7, 7, 0))).toDF("id", "labels")
    val out = df.select(col("id"), LabelExprs.distinctNonzeroCount(col("labels")).as("n"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(out == Map(1 -> 0, 2 -> 0, 3 -> 1000, 4 -> 1))
  }

  test("registered on the SQL surface") {
    import spark.implicits._
    Seq((1, Array(3, 3, 5, 0))).toDF("id", "labels")
      .createOrReplaceTempView("label_expr_spec")
    assert(spark.sql("SELECT distinct_nonzero_count(labels) FROM label_expr_spec")
      .collect().head.getInt(0) == 2)
  }
}
