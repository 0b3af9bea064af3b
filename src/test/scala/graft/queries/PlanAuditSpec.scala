package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Whole-registry physical-plan audit — the scale anti-pattern gate.
  *
  * Walks every registered query's pre-AQE physical plan and asserts
  * the three patterns that kill a 100 TB run appear nowhere new:
  *
  *  - CartesianProductExec: never acceptable; the registry has zero.
  *  - BroadcastNestedLoopJoinExec: acceptable ONLY for the declared
  *    1-row/tiny-broadcast cross joins (the balance queries' max-count
  *    row, the similarity queries' single probe vector / exact-top-k
  *    flag join) where the build side is bounded by construction.
  *  - WindowExec with an empty partitionSpec (all rows to one task):
  *    acceptable ONLY over bounded dimensions (q_natural_sort ranks
  *    the 25-row nation table — a TPC-H contract, not a fact table).
  *
  * A new query — or a plan regression in an old one — that introduces
  * one of these outside the whitelist fails the suite with the plan
  * attached, which is exactly when a human should look.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // BNLJ with a bounded-by-construction broadcast side
  private val bnljWhitelist = Set(
    "q_ds_balance", "q_ds_build", "q_ds_nested_prefix", "q_r5_balance",
    "q_sim_ann_ivf", "q_sim_ann_lsh", "q_sim_pair_count", "q_sim_topk")

  // global windows over bounded dimension tables
  private val globalWindowWhitelist = Set("q_natural_sort")

  test("no cartesian products; BNLJ and global windows only where declared") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.sparkPlan
      val cart = plan.collect { case c: CartesianProductExec => c }
      val bnlj = plan.collect { case j: BroadcastNestedLoopJoinExec => j }
      val gwin = plan.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
      if (cart.nonEmpty)
        offenders += s"$name: ${cart.size} CartesianProduct\n${plan.toString.take(2000)}"
      if (bnlj.nonEmpty && !bnljWhitelist(name))
        offenders += s"$name: ${bnlj.size} undeclared BroadcastNestedLoopJoin\n${plan.toString.take(2000)}"
      if (gwin.nonEmpty && !globalWindowWhitelist(name))
        offenders += s"$name: ${gwin.size} undeclared global Window\n${plan.toString.take(2000)}"
    }
    assert(offenders.isEmpty, offenders.mkString("\n\n"))
  }
}
