package graft.sources

import graft.SparkSpec

/** The co-located join layout for repeated big-big joins: both fact
  * tables written `bucketBy(N, key).sortBy(key)` so every future join
  * and aggregation on that key runs with ZERO exchanges — at 100 TB
  * the one-off bucketed write amortizes the shuffle that would
  * otherwise repeat on every orders⋈lineitem query. This spec pins
  * the three properties that make bucketing worth it:
  *   1. the bucketed equi-join plans with no Exchange on either side;
  *   2. a groupBy on the bucket key after the join ALSO adds no
  *      exchange (the join preserves the bucketed partitioning);
  *   3. an equality filter on the bucket key prunes to 1 of N buckets
  *      at planning time (SelectedBucketsCount in the scan).
  */
class BucketJoinSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val buckets = 8

  private def withTables[A](body: => A): A = {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
    o.write.mode("overwrite").bucketBy(buckets, "o_orderkey")
      .sortBy("o_orderkey").format("parquet").saveAsTable("bkt_orders")
    l.write.mode("overwrite").bucketBy(buckets, "l_orderkey")
      .sortBy("l_orderkey").format("parquet").saveAsTable("bkt_lineitem")
    try body
    finally {
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    }
  }

  /** Run with broadcast disabled so the sf0.001 tables exercise the
    * big-big (sort-merge) path the layout exists for.
    */
  private def noBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed orders⋈lineitem joins and re-aggregates with zero exchanges") {
    withTables {
      noBroadcast {
        import org.apache.spark.sql.functions._
        val j = spark.table("bkt_orders")
          .join(spark.table("bkt_lineitem"),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy("o_orderkey")
          .agg(count(lit(1)).as("n_items"), sum("l_quantity").as("qty"))
        val rows = j.collect()
        assert(rows.nonEmpty)
        val plan = j.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
        assert(!plan.contains("Exchange"),
          s"bucketed join/agg must not shuffle:\n$plan")
        // cross-check the result against the plain (shuffling) plan
        val expect = spark.read.parquet(s"$sfDir/orders.parquet")
          .join(spark.read.parquet(s"$sfDir/lineitem.parquet"),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy("o_orderkey")
          .agg(count(lit(1)).as("n_items"), sum("l_quantity").as("qty"))
          .collect()
        assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet ==
          expect.map(r => (r.getLong(0), r.getLong(1))).toSet)
      }
    }
  }

  test("equality filter on the bucket key prunes to a single bucket at planning time") {
    withTables {
      import org.apache.spark.sql.functions._
      val q = spark.table("bkt_orders").filter(col("o_orderkey") === 42L)
      val scan = q.queryExecution.executedPlan.collectLeaves()
        .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
        .headOption
      val selected = scan.flatMap(_.optionalBucketSet).map(_.cardinality())
      assert(selected.contains(1),
        s"bucket pruning missing; selected buckets: $selected; " +
          s"metadata: ${scan.map(_.metadata)}")
    }
  }
}
