package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

/** The native as-of operator (logical node + injected strategy +
  * physical merge) must be indistinguishable from the proven window
  * composition [[graft.ops.Asof.joinLastBefore]] — same rows on real
  * data at several partitionings and with the tolerance rule — and
  * its physical plan must look like an as-of join: an AsOfJoinExec
  * fed by exactly one exchange per side, no window, no union.
  */
class AsOfJoinSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private val dir = "/root/testdata/sf0.001"

  private def sides(nParts: Int) = {
    val e = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("us", expr("unix_micros(cast(ts as timestamp))"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("us").as("p_us"), col("value"))
      .repartition(nParts)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("us").as("click_us"))
      .repartition(nParts)
    (purchases, clicks)
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("bit-equal to the window composition, at several partitionings") {
    for (nParts <- Seq(1, 7, 32)) {
      val (p, c) = sides(nParts)
      val composed = graft.ops.Asof.joinLastBefore(p, c, Seq("user_id"),
        "p_us", "click_us", Seq("click_us"))
      val native = AsOfJoinPlan.joinLastBefore(p, c, Seq("user_id"),
        "p_us", "click_us", Seq("click_us"))
      assert(canon(native) == canon(composed), s"mismatch at nParts=$nParts")
      assert(native.count() == p.count(), "left-outer: every left row survives")
    }
  }

  test("tolerance rule matches the composition") {
    val (p, c) = sides(7)
    for (tol <- Seq(0L, 60000000L, 900000000L)) {
      val composed = graft.ops.Asof.joinLastBefore(p, c, Seq("user_id"),
        "p_us", "click_us", Seq("click_us"), tolerance = Some(tol))
      val native = AsOfJoinPlan.joinLastBefore(p, c, Seq("user_id"),
        "p_us", "click_us", Seq("click_us"), tolerance = Some(tol))
      assert(canon(native) == canon(composed), s"mismatch at tol=$tol")
    }
  }

  test("physical plan: AsOfJoinExec with one exchange per side, no window/union") {
    val (p, c) = sides(3)
    val native = AsOfJoinPlan.joinLastBefore(p, c, Seq("user_id"),
      "p_us", "click_us", Seq("click_us"))
    native.collect() // finalize any adaptive plan
    val plan = native.queryExecution.executedPlan
    def all(p: SparkPlan): Seq[SparkPlan] = collect(p) { case n => n }
    val nodes = all(plan)
    assert(nodes.exists(_.isInstanceOf[AsOfJoinExec]), s"no AsOfJoinExec in:\n$plan")
    val exchanges = nodes.count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])
    // the two repartition(3) exchanges belong to the fixture; the join
    // itself adds exactly one hash exchange per side
    assert(exchanges <= 4, s"as-of join added extra exchanges ($exchanges):\n$plan")
    assert(!plan.toString.contains("WindowExec"), "native path must not plan a window")
    assert(!plan.toString.contains("UnionExec"), "native path must not union the sides")
  }

  test("unmatched keys pad with nulls; ties at equal time are inclusive") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L), (1L, 20L, 101L), (2L, 5L, 102L), (3L, 7L, 103L))
      .toDF("k", "t", "lv")
    val right = Seq((1L, 10L, 1000L), (1L, 15L, 1001L), (2L, 6L, 1002L))
      .toDF("k", "rt", "payload")
    val out = AsOfJoinPlan.joinLastBefore(left, right, Seq("k"),
        "t", "rt", Seq("payload", "rt"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long]))).toSet
    assert(out == Set(
      (1L, 10L, Some(1000L), Some(10L)),  // tie at t=10 matches (inclusive)
      (1L, 20L, Some(1001L), Some(15L)),  // latest of the two priors
      (2L, 5L, None, None),               // right row is LATER: no match
      (3L, 7L, None, None)))              // key absent on the right
  }
}
