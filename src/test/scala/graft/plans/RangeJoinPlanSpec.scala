package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Contract of the native bucketed range join (logical node +
  * optimizer rewrite) against the hand-applied DataFrame composition
  * in graft.ops.RangeJoin, plus the plan shape and the opt-in
  * naive-join rewrite.
  */
class RangeJoinPlanSpec extends SparkSpec {
  import spark.implicits._

  // left intervals: key, id, [lo, hi]; one inverted-interval-free mix
  // of matched / unmatched / multi-bucket rows
  private def leftDf: DataFrame = Seq(
    (1L, 10L, 100L, 250L),   // spans 3 buckets of 100
    (1L, 11L, 400L, 450L),   // no clicks inside
    (2L, 20L, 0L, 99L),      // single bucket
    (3L, 30L, 500L, 700L)    // key with no right rows
  ).toDF("k", "id", "lo", "hi")

  private def rightDf: DataFrame = Seq(
    (1L, 120L, "a"), (1L, 250L, "b"), (1L, 260L, "c"), (1L, 399L, "d"),
    (2L, 50L, "e"), (2L, 100L, "f"),
    (4L, 600L, "g")
  ).toDF("k", "t", "payload")

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("native node equals the ops composition (inner and left_outer)") {
    for (jt <- Seq("inner", "left_outer")) {
      val ops = graft.ops.RangeJoin.joinPointsInInterval(
        leftDf, rightDf, Seq("k"), "lo", "hi", "t",
        bucketWidth = 100L, payloadCols = Seq("t", "payload"), joinType = jt)
      val native = RangeJoinPlan.joinPointsInInterval(
        leftDf, rightDf, Seq("k"), "lo", "hi", "t",
        bucketWidth = 100L, payloadCols = Seq("t", "payload"), joinType = jt)
      assert(sortedRows(native) == sortedRows(ops), s"joinType=$jt")
    }
    // value sanity on the inner pair set, independent of both impls
    val inner = RangeJoinPlan.joinPointsInInterval(
      leftDf, rightDf, Seq("k"), "lo", "hi", "t",
      bucketWidth = 100L, payloadCols = Seq("payload"))
    val pairs = inner.select("id", "payload").as[(Long, String)]
      .collect().sorted.toSeq
    assert(pairs == Seq((10L, "a"), (10L, "b"), (20L, "e")))
  }

  test("expanded plan: generate + single equi join on (key, bucket), no NLJ") {
    val native = RangeJoinPlan.joinPointsInInterval(
      leftDf, rightDf, Seq("k"), "lo", "hi", "t",
      bucketWidth = 100L, payloadCols = Seq("payload"))
    val physical = native.queryExecution.executedPlan.toString
    assert(physical.contains("Generate explode"), physical)
    assert(!physical.contains("BroadcastNestedLoopJoin"), physical)
    assert(!physical.contains("CartesianProduct"), physical)
    // the bucket column is an EQUI key of the join (the rewrite's whole
    // point: candidates meet on (key, bucket), not via an inequality)
    val optimized = native.queryExecution.optimizedPlan
    val joins = optimized.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.nonEmpty)
    val equiKeyNames = joins.flatMap(_.condition).flatMap { c =>
      c.collect {
        case org.apache.spark.sql.catalyst.expressions.EqualTo(
            a: org.apache.spark.sql.catalyst.expressions.Attribute,
            b: org.apache.spark.sql.catalyst.expressions.Attribute) =>
          Seq(a.name, b.name)
      }.flatten
    }
    assert(equiKeyNames.contains("__graft_bkt") &&
      equiKeyNames.contains("__graft_rbkt"), equiKeyNames.toString)
  }

  test("inverted or over-wide intervals raise instead of exploding") {
    val bad = Seq((1L, 99L, 500L, 100L)).toDF("k", "id", "lo", "hi")
    val native = RangeJoinPlan.joinPointsInInterval(
      bad, rightDf, Seq("k"), "lo", "hi", "t",
      bucketWidth = 100L, payloadCols = Seq("payload"))
    val e = intercept[Exception](native.count())
    assert(e.getMessage.contains("range join interval"),
      s"unexpected: ${e.getMessage}")
  }

  test("default-on rule rebuckets a naive inequality join written as a plain join") {
    def naive(): DataFrame = leftDf.as("l").join(rightDf.as("r"),
      col("l.k") === col("r.k") &&
        col("r.t") >= col("l.lo") && col("r.t") <= col("l.hi"))
    // the flag can turn the rewrite OFF (the reference plan)...
    spark.conf.set("spark.graft.rangeJoin.rewriteNaive", "false")
    val expected = sortedRows(naive())
    val off = naive().queryExecution.optimizedPlan.toString
    assert(!off.contains("__graft_bkt"), off)
    // ...and UNSET means ON (round-14 default, measured plan-neutral
    // on the registered inventory — see BASELINE.md trial)
    spark.conf.unset("spark.graft.rangeJoin.rewriteNaive")
    spark.conf.set("spark.graft.rangeJoin.bucketWidthUs", "100")
    try {
      assert(naive().queryExecution.optimizedPlan.toString
        .contains("__graft_bkt"), "unset flag must default to rewrite-on")
      spark.conf.set("spark.graft.rangeJoin.rewriteNaive", "true")
      val on = naive()
      val opt = on.queryExecution.optimizedPlan.toString
      assert(opt.contains("__graft_bkt"), opt)
      assert(sortedRows(on) == expected)
      // strict bounds keep their strictness through the rewrite
      val strict = leftDf.as("l").join(rightDf.as("r"),
        col("l.k") === col("r.k") &&
          col("r.t") > col("l.lo") && col("r.t") < col("l.hi"))
      assert(strict.queryExecution.optimizedPlan.toString
        .contains("__graft_bkt"))
      val strictPairs = strict.select(col("id"), col("payload"))
        .as[(Long, String)].collect().sorted.toSeq
      assert(strictPairs == Seq((10L, "a"), (20L, "e"))) // b (t=hi), e? t=50 in (0,99) yes
    } finally {
      spark.conf.unset("spark.graft.rangeJoin.rewriteNaive")
      spark.conf.unset("spark.graft.rangeJoin.bucketWidthUs")
    }
  }

  test("native overlap node equals the ops composition, dedups, and rejects malformed") {
    // left sessions and right windows with touching, nested, disjoint
    // and multi-shared-bucket overlaps
    val lIv = Seq(
      (1L, 10L, 100L, 250L),  // overlaps w1 (shares 2 buckets) + touches w2
      (1L, 11L, 400L, 450L),  // disjoint from all
      (2L, 20L, 0L, 320L),    // nests w3
      (3L, 30L, 500L, 700L)   // key with no right rows
    ).toDF("k", "id", "s_lo", "s_hi")
    val rIv = Seq(
      (1L, 150L, 260L, "w1"), (1L, 250L, 300L, "w2"), (1L, 460L, 470L, "w3x"),
      (2L, 100L, 150L, "w3"),
      (4L, 600L, 650L, "w4")
    ).toDF("k", "w_lo", "w_hi", "wname")
    val ops = graft.ops.RangeJoin.joinIntervalsOverlap(
      lIv, rIv, Seq("k"), "s_lo", "s_hi", "w_lo", "w_hi",
      bucketWidth = 100L, payloadCols = Seq("w_lo", "w_hi", "wname"))
    val native = RangeJoinPlan.joinIntervalsOverlap(
      lIv, rIv, Seq("k"), "s_lo", "s_hi", "w_lo", "w_hi",
      bucketWidth = 100L, payloadCols = Seq("w_lo", "w_hi", "wname"))
    assert(sortedRows(native) == sortedRows(ops))
    // each overlapping pair exactly once (canonical-bucket dedup), and
    // the expected pair set: (10,w1) shares buckets 1 and 2, (10,w2)
    // touches at 250, (20,w3) nested
    val pairs = native.select("id", "wname").as[(Long, String)]
      .collect().sorted.toSeq
    assert(pairs == Seq((10L, "w1"), (10L, "w2"), (20L, "w3")))
    // plan shape: two Generates, equi join on the bucket attrs, no NLJ
    val phys = native.queryExecution.executedPlan.toString
    assert(!phys.contains("BroadcastNestedLoopJoin") &&
      !phys.contains("CartesianProduct"), phys)
    assert(phys.contains("Generate explode"), phys)
    val opt = native.queryExecution.optimizedPlan.toString
    assert(opt.contains("__graft_bkt") && opt.contains("__graft_rbkt"), opt)
    // malformed (inverted) intervals keep the explicit-node raise
    val bad = Seq((1L, 99L, 500L, 100L)).toDF("k", "id", "s_lo", "s_hi")
    val e = intercept[Exception](RangeJoinPlan.joinIntervalsOverlap(
      bad, rIv, Seq("k"), "s_lo", "s_hi", "w_lo", "w_hi",
      bucketWidth = 100L, payloadCols = Seq("wname")).count())
    assert(e.getMessage.contains("overlap join left interval"),
      s"unexpected: ${e.getMessage}")
  }

  test("naive rewrite preserves inner-join semantics for NULL and inverted intervals") {
    // the ORIGINAL join emits no match for a NULL or inverted interval
    // row; the rewrite must do the same instead of raising (raise is
    // reserved for the explicit node and the fan-out cap)
    val messy = Seq(
      (1L, Some(10L), Some(100L), Some(250L)), // normal: matches a, b
      (1L, Some(12L), None, Some(300L)),       // NULL lo
      (1L, Some(13L), Some(100L), None),       // NULL hi
      (2L, Some(21L), Some(99L), Some(50L))    // inverted hi < lo
    ).toDF("k", "id", "lo", "hi")
    def naive(): DataFrame = messy.as("l").join(rightDf.as("r"),
      col("l.k") === col("r.k") &&
        col("r.t") >= col("l.lo") && col("r.t") <= col("l.hi"))
    val expected = sortedRows(naive())
    spark.conf.set("spark.graft.rangeJoin.rewriteNaive", "true")
    spark.conf.set("spark.graft.rangeJoin.bucketWidthUs", "100")
    try {
      val on = naive()
      assert(on.queryExecution.optimizedPlan.toString.contains("__graft_bkt"))
      assert(sortedRows(on) == expected) // no crash, identical rows
      // over-wide intervals take the wide-row fallback (the original
      // join restricted to those rows) instead of raising: with the
      // cap at 1 bucket EVERY normal row is "wide", so the whole
      // result flows through the fallback branch of the Union and must
      // still equal the original join
      spark.conf.set("spark.graft.rangeJoin.maxBucketsPerRow", "1")
      val capped = naive()
      assert(capped.queryExecution.optimizedPlan.toString.contains("Union"),
        capped.queryExecution.optimizedPlan.toString)
      assert(sortedRows(capped) == expected)
    } finally {
      spark.conf.unset("spark.graft.rangeJoin.rewriteNaive")
      spark.conf.unset("spark.graft.rangeJoin.bucketWidthUs")
      spark.conf.unset("spark.graft.rangeJoin.maxBucketsPerRow")
    }
  }

  test("wide-row fallback: narrow and wide intervals split across the Union, no dupes") {
    def naive(): DataFrame = leftDf.as("l").join(rightDf.as("r"),
      col("l.k") === col("r.k") &&
        col("r.t") >= col("l.lo") && col("r.t") <= col("l.hi"))
    spark.conf.set("spark.graft.rangeJoin.rewriteNaive", "false")
    val expected = sortedRows(naive())
    spark.conf.set("spark.graft.rangeJoin.rewriteNaive", "true")
    spark.conf.set("spark.graft.rangeJoin.bucketWidthUs", "100")
    // cap 2: the 3-bucket interval (id=10) goes wide-fallback, the
    // single-bucket ones (id=20, id=11) stay bucketed — every expected
    // row must arrive exactly once through exactly one branch
    spark.conf.set("spark.graft.rangeJoin.maxBucketsPerRow", "2")
    try {
      val mixed = naive()
      val opt = mixed.queryExecution.optimizedPlan.toString
      assert(opt.contains("Union") && opt.contains("__graft_bkt"), opt)
      assert(sortedRows(mixed) == expected)
    } finally {
      spark.conf.unset("spark.graft.rangeJoin.rewriteNaive")
      spark.conf.unset("spark.graft.rangeJoin.bucketWidthUs")
      spark.conf.unset("spark.graft.rangeJoin.maxBucketsPerRow")
    }
  }

  test("keyless naive inequality join rebuckets away from NLJ") {
    spark.conf.set("spark.graft.rangeJoin.rewriteNaive", "true")
    spark.conf.set("spark.graft.rangeJoin.bucketWidthUs", "100")
    try {
      val keyless = leftDf.join(rightDf,
        col("t") >= col("lo") && col("t") <= col("hi"))
      // reference: the same join with the rule off
      spark.conf.set("spark.graft.rangeJoin.rewriteNaive", "false")
      val ref = sortedRows(leftDf.join(rightDf,
        col("t") >= col("lo") && col("t") <= col("hi")))
      spark.conf.set("spark.graft.rangeJoin.rewriteNaive", "true")
      assert(sortedRows(keyless) == ref)
      // the data path is the bucket explode; a nested-loop join may
      // exist ONLY as the wide-row fallback branch, which must process
      // zero rows on this all-narrow fixture
      val phys = keyless.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] = {
        val kids = p match {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            Seq(q.plan)
          case other => other.children
        }
        p +: kids.flatMap(allNodes)
      }
      val nodes = allNodes(phys)
      assert(nodes.exists(_.toString.startsWith("Generate explode")) ||
        phys.toString.contains("Generate explode"), phys.toString)
      val nljRows = nodes.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec =>
          b.metrics("numOutputRows").value
      }
      assert(nljRows.forall(_ == 0L),
        s"wide-row fallback NLJ must see no rows here: $nljRows\n$phys")
    } finally {
      spark.conf.unset("spark.graft.rangeJoin.rewriteNaive")
      spark.conf.unset("spark.graft.rangeJoin.bucketWidthUs")
    }
  }
  test("naive rewrite skips joins whose children can't be safely duplicated") {
    // The rewrite's Union shape evaluates both child subtrees once per
    // branch; children with nondeterministic expressions or
    // Sample/Limit operators would yield a different row set per
    // evaluation, so such joins must be left exactly as written.
    spark.conf.set("spark.graft.rangeJoin.rewriteNaive", "true")
    try {
      def cond = col("l.k") === col("r.k") &&
        col("r.t") >= col("l.lo") && col("r.t") <= col("l.hi")
      def planOf(df: DataFrame): String =
        df.queryExecution.optimizedPlan.toString
      // control: plain deterministic children ARE rewritten
      val ctl = leftDf.as("l").join(rightDf.as("r"), cond)
      assert(planOf(ctl).contains("__graft_bkt"), planOf(ctl))
      // ConvertToLocalRelation eagerly folds Project/Filter/Limit over
      // a LocalRelation (even nondeterministic ones — they become
      // materialized literals, at which point duplication IS safe), so
      // each hazard sits above a repartition, the shape it takes over
      // any real source.
      // nondeterministic filter (the rand()-sampling idiom): left alone
      val nd = leftDf.repartition(2).filter(rand(seed = 7L) < lit(0.9))
        .as("l").join(rightDf.as("r"), cond)
      assert(!planOf(nd).contains("__graft_bkt"), planOf(nd))
      // Sample on the interval side: left alone
      val samp = leftDf.repartition(2).sample(0.9, seed = 7L).as("l")
        .join(rightDf.as("r"), cond)
      assert(!planOf(samp).contains("__graft_bkt"), planOf(samp))
      // Limit on the point side: left alone
      val lim = leftDf.as("l")
        .join(rightDf.repartition(2).limit(5).as("r"), cond)
      assert(!planOf(lim).contains("__graft_bkt"), planOf(lim))
    } finally spark.conf.unset("spark.graft.rangeJoin.rewriteNaive")
  }

  test("naive OVERLAP rewrite: bucketed + fallback union equals the plain join") {
    // intervals covering every routing class: normal overlap
    // (bucketed), inverted lo>hi (still matches naively when the
    // bounds straddle the partner — MUST take the fallback, the
    // bucketed branch would wrongly drop it), NULL bound (matches
    // nothing), and over-wide spans (>= maxBucketsPerRow buckets,
    // fallback)
    val lhs = Seq(
      (1L, 10L, Option(100L), Option(250L)),   // normal
      (1L, 11L, Option(500L), Option(400L)),   // inverted, can match
      (1L, 12L, Option.empty[Long], Option(300L)), // NULL lo
      (2L, 20L, Option(0L), Option(2000L)),    // wide at width=100/cap=4
      (2L, 21L, Option(150L), Option(160L))    // normal
    ).toDF("k", "id", "lo", "hi")
    val rhs = Seq(
      (1L, 90L, Option(200L), Option(300L)),   // overlaps 10
      (1L, 91L, Option(300L), Option(600L)),   // straddles inverted 11
      (1L, 92L, Option(260L), Option(270L)),   // overlaps nothing valid
      (2L, 93L, Option(100L), Option(180L)),   // overlaps 20 (wide) + 21
      (2L, 94L, Option(5000L), Option(90L))    // inverted right side
    ).toDF("k", "rid", "rlo", "rhi")
    lhs.createOrReplaceTempView("ovl_l")
    rhs.createOrReplaceTempView("ovl_r")
    def run(): DataFrame = spark.sql(
      """SELECT l.k, l.id, r.rid FROM ovl_l l JOIN ovl_r r
        |  ON l.k = r.k AND l.lo <= r.rhi AND r.rlo <= l.hi""".stripMargin)
    spark.conf.set("spark.graft.rangeJoin.bucketWidthUs", "100")
    spark.conf.set("spark.graft.rangeJoin.maxBucketsPerRow", "4")
    try {
      spark.conf.set("spark.graft.rangeJoin.rewriteNaive", "false")
      val expected = sortedRows(run())
      assert(!run().queryExecution.optimizedPlan.toString
        .contains("__graft_bkt"))
      spark.conf.set("spark.graft.rangeJoin.rewriteNaive", "true")
      val on = run()
      val opt = on.queryExecution.optimizedPlan.toString
      assert(opt.contains("__graft_bkt") && opt.contains("__graft_rbkt"), opt)
      assert(opt.contains("Union"), opt)
      assert(sortedRows(on) == expected,
        s"on=${sortedRows(on)}\nexpected=$expected")
      // the inverted-but-matching pair (11, 91) must be present — it
      // can only come through the fallback branch
      assert(expected.exists(r => r.contains("11") && r.contains("91")),
        expected.toString)
    } finally {
      spark.conf.unset("spark.graft.rangeJoin.rewriteNaive")
      spark.conf.unset("spark.graft.rangeJoin.bucketWidthUs")
      spark.conf.unset("spark.graft.rangeJoin.maxBucketsPerRow")
    }
  }
}
