package graft.queries

import graft.SparkSpec

/** Law and plan contracts of the deterministic partsupp family
  * (TPC-H Q2/Q9/Q11/Q16/Q20 over the dbgen-rule relation both engines
  * generate — RelationalQueries.partsupp).
  */
class PartsuppSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("partsupp law: every part stocked by exactly 4 distinct in-range suppliers") {
    val q = graft.SparkEntry.queries
    // derive the relation through a registered consumer's source tables:
    // rebuild it directly via the same private helper the queries use
    val ps = {
      val m = graft.queries.RelationalQueries.getClass
        .getDeclaredMethods.find(_.getName == "partsupp").get
      m.setAccessible(true)
      m.invoke(graft.queries.RelationalQueries, spark, sfDir)
        .asInstanceOf[org.apache.spark.sql.DataFrame]
    }
    import org.apache.spark.sql.functions._
    val nSupp = spark.read.parquet(s"$sfDir/supplier.parquet").count()
    val nPart = spark.read.parquet(s"$sfDir/part.parquet").count()
    assert(ps.count() == 4 * nPart)
    // supplier spread: at driver scale (S >= 100) the dbgen step
    // S/4 + p/S never collides mod S for i in 0..3, so every part has
    // exactly 4 DISTINCT suppliers; sf0.001's S = 10 is the tiny-S
    // degeneracy where steps ≡ 0/5 (mod 10) collide — semantically
    // harmless (both engines replay the same law; Q16's census counts
    // distincts), so the exact-4 contract is pinned on sf0.01
    val d001 = ps.groupBy("ps_partkey")
      .agg(countDistinct("ps_suppkey").as("d")).agg(min("d"), max("d")).head()
    assert(d001.getLong(0) >= 1 && d001.getLong(1) <= 4)
    val ps01 = {
      val m = graft.queries.RelationalQueries.getClass
        .getDeclaredMethods.find(_.getName == "partsupp").get
      m.setAccessible(true)
      m.invoke(graft.queries.RelationalQueries, spark, "/root/testdata/sf0.01")
        .asInstanceOf[org.apache.spark.sql.DataFrame]
    }
    val collided01 = ps01.groupBy("ps_partkey")
      .agg(countDistinct("ps_suppkey").as("d"))
      .filter(col("d") =!= 4).count()
    assert(collided01 == 0, s"$collided01 sf0.01 parts with colliding suppliers")
    val range = ps.agg(min("ps_suppkey"), max("ps_suppkey"),
      min("ps_availqty"), max("ps_availqty"),
      min("ps_supplycost_cents")).head()
    assert(range.getLong(0) >= 0 && range.getLong(1) < nSupp)
    assert(range.getLong(2) >= 1 && range.getLong(3) <= 9999)
    assert(range.getLong(4) >= 100)
  }

  test("q02 min-cost contract: one row per (part, min-cost supplier); costs are the per-part minimum") {
    val out = graft.SparkEntry.queries("q02_min_cost_supplier")(spark, sfDir)
      .collect()
    assert(out.nonEmpty)
    // within a part, every emitted cost equals that part's single min
    val byPart = out.groupBy(_.getAs[Long]("p_partkey"))
    byPart.foreach { case (pk, rows) =>
      val costs = rows.map(_.getAs[Long]("min_cost_cents")).distinct
      assert(costs.length == 1, s"part $pk emitted ${costs.length} costs")
    }
  }

  test("q20 half-stock predicate is strict and the law relation drives it") {
    val out = graft.SparkEntry.queries("q20_potential_promotion")(spark, sfDir)
      .collect()
    // sf0.001 has exactly the suppliers the oracle found (cross-checked
    // by the driver); here pin non-emptiness and schema
    assert(out.nonEmpty)
    assert(out.forall(r => !r.isNullAt(0) && !r.isNullAt(1)))
  }

  test("partsupp-family plans: dimensions broadcast, no shuffle for the generator") {
    val plan = graft.SparkEntry.queries("q16_parts_supplier")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the part filter and bad-supplier exclusion ride broadcasts
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the generator itself is Generate(explode) over a 1-row broadcast
    // count -- it must NOT introduce a shuffle Exchange of its own
    assert(plan.contains("Generate explode"), plan)
  }
}
