package graft.dataset

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mirrors dataset_splitter_test.py:135-227 and build.py's split
  * rules: seed determinism, nested prefix property, min-size tiling,
  * small-N counts.
  */
class SplitterSpec extends SparkSpec {

  private def range(n: Int) = {
    import spark.implicits._
    (0 until n).toDF("id")
  }

  test("splitCounts reproduces the reference small-N rules (build.py:213-256)") {
    assert(Splitter.splitCounts(1, (0.8, 0.1, 0.1)) == ((1L, 0L, 0L)))
    assert(Splitter.splitCounts(2, (0.8, 0.1, 0.1)) == ((1L, 1L, 0L)))
    // n=3: 3*0.2 < 1 -> (n-2, 1, 1)
    assert(Splitter.splitCounts(3, (0.8, 0.1, 0.1)) == ((1L, 1L, 1L)))
    // n=10: remainder=2, test=1, val=1
    assert(Splitter.splitCounts(10, (0.8, 0.1, 0.1)) == ((8L, 1L, 1L)))
    assert(Splitter.splitCounts(100, (0.8, 0.1, 0.1)) == ((80L, 10L, 10L)))
    intercept[IllegalArgumentException](Splitter.splitCounts(10, (0.5, 0.2, 0.2)))
    intercept[IllegalArgumentException](Splitter.splitCounts(10, (0.9, 0.1, 0.0)))
  }

  test("trainValTestSplit: exact counts and seed determinism") {
    val df = range(100)
    val s1 = Splitter.trainValTestSplit(df, (0.8, 0.1, 0.1), seed = 42)
    val counts = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("train" -> 80L, "val" -> 10L, "test" -> 10L))
    val a = s1.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    val b = Splitter.trainValTestSplit(df, (0.8, 0.1, 0.1), seed = 42)
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(a == b, "same seed => identical assignment")
    val c = Splitter.trainValTestSplit(df, (0.8, 0.1, 0.1), seed = 7)
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(a != c, "different seed => different assignment")
  }

  test("nestedSplit: prefix property and proportions") {
    val df = range(50)
    val splits = Splitter.nestedSplit(df, splitCounts = Seq(5, 15, 50), seed = 3)
    val s5 = splits("5").collect().map(_.getInt(0)).toSet
    val s15 = splits("15").collect().map(_.getInt(0)).toSet
    val s50 = splits("50").collect().map(_.getInt(0)).toSet
    assert(s5.size == 5 && s15.size == 15 && s50.size == 50)
    assert(s5.subsetOf(s15) && s15.subsetOf(s50), "smaller splits are prefixes")
    val props = Splitter.nestedSplit(df, splitProportions = Seq(0.1, 0.5), seed = 3)
    assert(props("0.1").count() == 5 && props("0.5").count() == 25)
  }

  test("nestedSplit: minSize tiles cyclically (dataset_splitter.py:77-92)") {
    val df = range(50)
    val splits = Splitter.nestedSplit(df, splitCounts = Seq(2), minSize = 5, seed = 3)
    val rows = splits("2").collect().map(_.getInt(0))
    assert(rows.length == 5)
    assert(rows.distinct.length == 2, "only the 2 selected rows, tiled")
  }

  test("balance: every category reaches the max count, originals kept") {
    import spark.implicits._
    val df = (Seq.fill(10)("a") ++ Seq.fill(3)("b") ++ Seq.fill(6)("c"))
      .zipWithIndex.toDF("cat", "id")
    val out = Balancer.balance(df, "cat", seed = 11)
    val counts = out.groupBy("cat").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("a" -> 10L, "b" -> 10L, "c" -> 10L))
    // every original row survives at least once
    val origIds = df.select("id").collect().map(_.getInt(0)).toSet
    val keptIds = out.select("id").collect().map(_.getInt(0)).toSet
    assert(origIds == keptIds)
    // determinism
    val again = Balancer.balance(df, "cat", seed = 11)
      .groupBy("id").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val first = out.groupBy("id").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(again == first)
  }
}
