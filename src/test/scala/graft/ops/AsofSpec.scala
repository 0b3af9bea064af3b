package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Asof.joinLastBefore semantics on planted timelines: latest-at-or-
  * before matching, inclusive ties, no-match nulls, key isolation,
  * struct-atomic payloads, and the no-explosion plan shape.
  */
class AsofSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(
    // (id, key, t)
    (1L, "a", 100L), (2L, "a", 200L), (3L, "a", 50L),
    (4L, "b", 100L), (5L, "c", 100L)
  ).toDF("id", "k", "t")

  private val right = Seq(
    // (key, t, tag, aux)
    ("a", 100L, "a@100", Some(10)), // tie with left id=1 -> matches it
    ("a", 150L, "a@150", None),     // aux null: struct carry stays atomic
    ("b", 101L, "b@101", Some(30))  // after left id=4 -> no match
  ).toDF("k", "rt", "tag", "aux")

  private def run() =
    Asof.joinLastBefore(left, right, Seq("k"), "t", "rt", Seq("tag", "aux"))
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(3)), Option(r.get(4))))

  test("latest at-or-before per key; ties inclusive; no match -> null") {
    assert(run().toSeq == Seq(
      (1L, Some("a@100"), Some(10)), // tie at t=100 matches
      (2L, Some("a@150"), None),     // latest of {100,150}; aux from SAME row
      (3L, None, None),              // before any right row
      (4L, None, None),              // right row is strictly after
      (5L, None, None)               // key with no right rows at all
    ).map { case (i, t, a) => (i, t, a.map(_.asInstanceOf[Any])) })
  }

  test("payload is row-atomic: null aux comes from the matched row, not an earlier one") {
    // left id=2 matches a@150 whose aux is null — a per-column carry
    // would leak aux=10 from a@100
    val row = run().find(_._1 == 2L).get
    assert(row._2.contains("a@150") && row._3.isEmpty)
  }

  test("plan is one window over a union — no join node, no row explosion") {
    val out = Asof.joinLastBefore(left, right, Seq("k"), "t", "rt", Seq("tag"))
    val plan = out.queryExecution.optimizedPlan
    val joins = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.isEmpty, s"asof should not plan a join: $plan")
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "asof window must be key-partitioned")
  }

  test("tolerance: a latest-before match beyond the staleness bound nulls out") {
    // left id=2 (t=200) matches a@150: gap 50
    def run(tol: Long) =
      Asof.joinLastBefore(left, right, Seq("k"), "t", "rt", Seq("tag"),
          tolerance = Some(tol))
        .orderBy("id").collect().map(r => (r.getLong(0), Option(r.getString(3))))
    val strict = run(49)
    assert(strict.find(_._1 == 2L).get._2.isEmpty, "gap 50 > tol 49 must null")
    assert(strict.find(_._1 == 1L).get._2.contains("a@100"), "tie gap 0 survives")
    val loose = run(50)
    assert(loose.find(_._1 == 2L).get._2.contains("a@150"),
      "gap 50 <= tol 50 (inclusive) must match")
  }

  test("payload name collision with left is rejected") {
    intercept[IllegalArgumentException] {
      Asof.joinLastBefore(left, right.withColumnRenamed("tag", "id"),
        Seq("k"), "t", "rt", Seq("id"))
    }
  }
}
