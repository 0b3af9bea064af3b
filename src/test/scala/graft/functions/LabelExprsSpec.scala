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

  test("label_areas equals the explode+groupBy composition on random masks") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val rows = (0 until 100).map { i =>
      (i, Array.fill(rng.nextInt(600) + 1)(rng.nextInt(30)))
    }
    val df = rows.toDF("id", "labels")
    val native = df.select(col("id"),
      explode(LabelExprs.labelAreasCol(col("labels"))))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getInt(2)).toMap
    val oracle = rows.flatMap { case (id, ls) =>
      ls.filter(_ != 0).groupBy(identity).map { case (l, g) => (id, l) -> g.length }
    }.toMap
    assert(native == oracle)
    // keys sorted ascending (deterministic map layout)
    val keys = df.select(map_keys(LabelExprs.labelAreasCol(col("labels"))).as("k"))
      .collect().map(_.getSeq[Int](0))
    keys.foreach(k => assert(k == k.sorted, s"unsorted: $k"))
  }

  test("label_areas edge cases and SQL registration") {
    import spark.implicits._
    val df = Seq(
      (1, Array.empty[Int]),
      (2, Array(0, 0)),
      (3, Array(5, 5, 2, 0, 2, 2))).toDF("id", "labels")
    df.createOrReplaceTempView("label_areas_spec")
    val out = spark.sql("SELECT id, label_areas(labels) AS a FROM label_areas_spec")
      .collect().map(r => r.getInt(0) -> r.getMap[Int, Int](1).toMap).toMap
    assert(out == Map(1 -> Map.empty, 2 -> Map.empty, 3 -> Map(2 -> 3, 5 -> 2)))
  }

  test("cellSizes plans as a narrow projection: no typed-map stage") {
    val planes = graft.core.ImagePlane.blankPlanes(2, 2, 16, 16)
      .map(p => graft.core.ImagePlane.gridLabels(p, 4))
    val q = graft.ops.ImageResize.cellSizes(
      graft.core.ImagePlane.toDataset(spark, planes))
    val plan = q.queryExecution.optimizedPlan.toString
    assert(!plan.contains("SerializeFromObject") || !plan.contains("MapPartitions"),
      s"area extraction must not round-trip through typed objects:\n$plan")
    // correctness: 16 cells of (4-1)x(4-1)=9 px per plane (gridLabels
    // leaves a 1-px boundary gap)
    val rows = q.collect()
    assert(rows.length == 4 * 16)
    assert(rows.forall(_.getAs[Int]("area") == 9))
  }

  test("registered on the SQL surface") {
    import spark.implicits._
    Seq((1, Array(3, 3, 5, 0))).toDF("id", "labels")
      .createOrReplaceTempView("label_expr_spec")
    assert(spark.sql("SELECT distinct_nonzero_count(labels) FROM label_expr_spec")
      .collect().head.getInt(0) == 2)
  }
}
