package graft.ql

import graft.SparkSpec

/** SURVEY §7.1 `ql` contract: after registration, plain `spark.sql`
  * text (the same ANSI strings the DuckDB oracle replays) returns the
  * byte-same results as the DataFrame registrations.
  */
class QlSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def viaSql(name: String): Array[String] = {
    Ql.registerTables(spark, dir)
    spark.sql(graft.SparkEntry.oracleSql(name))
      .collect().map(_.mkString("|"))
  }

  private def viaDf(name: String): Array[String] =
    graft.SparkEntry.queries(name)(spark, dir)
      .collect().map(_.mkString("|"))

  test("spark.sql(oracle text) == DataFrame registration: q01_pricing_summary") {
    assert(viaSql("q01_pricing_summary").toSeq == viaDf("q01_pricing_summary").toSeq)
  }

  test("spark.sql(oracle text) == DataFrame registration: q_a4_rollup") {
    assert(viaSql("q_a4_rollup").toSeq == viaDf("q_a4_rollup").toSeq)
  }

  test("spark.sql(oracle text) == DataFrame registration: q_topk_per_group") {
    assert(viaSql("q_topk_per_group").toSeq == viaDf("q_topk_per_group").toSeq)
  }

  test("inventory queries are addressable as views") {
    Ql.registerTables(spark, dir)
    Ql.registerQueries(spark, dir, Seq("q_a5_distinct", "q_natural_sort"))
    val n = spark.sql(
      "SELECT count(*) AS n FROM q_a5_distinct").collect().head.getLong(0)
    assert(n == graft.SparkEntry.queries("q_a5_distinct")(spark, dir).count())
    // composes with further SQL over the view
    val top = spark.sql(
      "SELECT * FROM q_natural_sort LIMIT 1").collect()
    assert(top.length == 1)
  }

  test("registered table views hit the pruned parquet scan") {
    Ql.registerTables(spark, dir)
    val plan = spark.sql(
      "SELECT o_orderkey FROM orders WHERE o_custkey = 7")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_custkey), EqualTo(o_custkey,7"),
      s"pushdown missing in:\n$plan")
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint>"),
      s"pruning missing in:\n$plan")
  }
}
