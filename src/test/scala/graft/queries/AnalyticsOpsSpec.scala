package graft.queries

import graft.SparkSpec
import scala.math.BigDecimal.RoundingMode.HALF_UP

/** Round-12 event-analytics operators — exact/sketch percentiles, A/B
  * z-test, pivot. Each replayed in plain Scala at sf0.001 (DuckDB
  * hash-gates the same values at sf0.01/sf0.1).
  */
class AnalyticsOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def r6(x: Double): Double = BigDecimal(x).setScale(6, HALF_UP).toDouble

  private def events =
    Q.t(spark, dir, "events")
      .select("user_id", "event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))

  test("value percentiles: nearest-rank exacts replay; sketch verdicts all true") {
    val out = graft.SparkEntry.queries("q_evt_value_pctl")(spark, dir).collect()
    val byType = events.groupBy(_._3)
    assert(out.length == byType.size)
    out.foreach { r =>
      val vs = byType(r.getAs[String]("event_type"))
        .sortBy(e => (e._4, e._2)).map(_._4)
      val n = vs.length
      def pct(q: Double): Double = vs(math.ceil(n * q).toInt - 1)
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Double]("p50") == pct(0.5))
      assert(r.getAs[Double]("p95") == pct(0.95))
      assert(r.getAs[Double]("p99") == pct(0.99))
      assert(r.getAs[Boolean]("sk50_ok") && r.getAs[Boolean]("sk95_ok") &&
        r.getAs[Boolean]("sk99_ok"))
      assert(pct(0.5) <= pct(0.95) && pct(0.95) <= pct(0.99))
    }
  }

  test("abtest: hash assignment, conversion rates and pooled z replay") {
    val out = graft.SparkEntry.queries("q_evt_abtest")(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    val perUser = events.groupBy(_._1).toSeq.map { case (uid, evs) =>
      val conv = if (evs.exists(e => e._3 == "purchase" && e._4 > 90)) 1L else 0L
      val variant = java.lang.Math.floorMod(uid * 2654435761L, 4294967296L) % 2
      (variant, conv)
    }
    val nA = perUser.count(_._1 == 0L); val nB = perUser.count(_._1 == 1L)
    val cA = perUser.filter(_._1 == 0L).map(_._2).sum
    val cB = perUser.filter(_._1 == 1L).map(_._2).sum
    assert(r.getAs[Long]("n_a") == nA && r.getAs[Long]("n_b") == nB)
    assert(r.getAs[Long]("c_a") == cA && r.getAs[Long]("c_b") == cB)
    val p = (cA + cB).toDouble / (nA + nB)
    val z = (cB.toDouble / nB - cA.toDouble / nA) /
      math.sqrt(p * (1.0 - p) * (1.0 / nA + 1.0 / nB))
    assert(r.getAs[Double]("rate_a") == r6(cA.toDouble / nA))
    assert(r.getAs[Double]("rate_b") == r6(cB.toDouble / nB))
    assert(r.getAs[Double]("z") == r6(z))
    assert(r.getAs[Boolean]("significant") == (math.abs(r6(z)) > 1.96))
  }

  test("dq constraints: violation counts replay; the two real defects are flagged") {
    val out = graft.SparkEntry.queries("q_dq_constraints")(spark, dir).collect()
      .map(r => (r.getAs[String]("tbl"), r.getAs[String]("cname")) ->
        (r.getAs[Long]("n_checked"), r.getAs[Long]("n_violations"), r.getAs[Boolean]("ok")))
      .toMap
    assert(out.size == 9)
    out.foreach { case (_, (_, v, ok)) => assert(ok == (v == 0L)) }
    // composite-key uniqueness: replay count(*) - distinct (lo, ln)
    val li = Q.t(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val (n, viol, _) = out(("lineitem", "orderkey_linenumber_unique"))
    assert(n == li.length && viol == li.length - li.distinct.length)
    // reconciliation: replay the 1% tolerance comparison
    val ext = Q.t(spark, dir, "lineitem")
      .select("l_orderkey", "l_extendedprice").collect()
      .map(r => (r.getLong(0), BigDecimal(r.getDouble(1)).setScale(2, scala.math.BigDecimal.RoundingMode.HALF_UP)))
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
    val tot = Q.t(spark, dir, "orders")
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val expViol = ext.count { case (k, s) =>
      tot.contains(k) && math.abs(tot(k) - s.toDouble) > tot(k) * 0.01
    }
    val (nRec, violRec, okRec) = out(("orders", "totalprice_reconciles_1pct"))
    assert(nRec == ext.count(e => tot.contains(e._1)))
    assert(violRec == expViol && !okRec,
      "synthetic totals must NOT reconcile — a vacuous all-green report would hide a broken check")
    // the referential/domain checks genuinely hold on this corpus
    assert(out(("orders", "fk_custkey_resolves"))._3)
    assert(out(("events", "event_type_in_domain"))._3)
  }

  test("rank family: percent_rank/cume_dist/ntile/first replay per customer") {
    val out = graft.SparkEntry.queries("q_w_rank_family")(spark, dir).collect()
    val orders = Q.t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byCust = orders.groupBy(_._2)
    def ntileOf(idx: Int, n: Int, tiles: Int): Int = {
      // Spark/DuckDB ntile: first (n % tiles) buckets get one extra row
      val base = n / tiles; val extra = n % tiles
      var rows = 0
      (1 to tiles).find { b =>
        rows += base + (if (b <= extra) 1 else 0); idx < rows
      }.get
    }
    out.foreach { r =>
      val g = byCust(r.getAs[Long]("o_custkey")).sortBy(o => (o._3, o._1))
      val n = g.length
      val idx = g.indexWhere(_._1 == r.getAs[Long]("o_orderkey"))
      assert(idx >= 0)
      val pr = if (n == 1) 0.0 else idx.toDouble / (n - 1)
      assert(r.getAs[Double]("pr") == pr)
      assert(r.getAs[Double]("cd") == (idx + 1).toDouble / n)
      assert(r.getAs[Int]("quartile") == ntileOf(idx, n, 4))
      assert(r.getAs[Long]("cheapest_key") == g.head._1)
    }
  }

  test("rfm: segment census is a partition of users; quartiles are balanced") {
    val out = graft.SparkEntry.queries("q_evt_rfm")(spark, dir).collect()
    val nUsers = Q.t(spark, dir, "events").select("user_id").distinct().count()
    assert(out.map(_.getAs[Long]("n_users")).sum == nUsers)
    // each dimension's quartiles partition users into n/4 +- 1 cells
    Seq("r_q", "f_q", "m_q").foreach { dim =>
      val byQ = out.groupBy(_.getAs[Int](dim))
        .map { case (q, rs) => q -> rs.map(_.getAs[Long]("n_users")).sum }
      assert(byQ.keySet == Set(1, 2, 3, 4))
      assert(byQ.values.forall(v => math.abs(v - nUsers / 4.0) <= 1))
    }
    val totalEvents = Q.t(spark, dir, "events").count()
    assert(out.map(_.getAs[Long]("n_events")).sum == totalEvents)
  }

  test("skew preflight: factors replay; the one genuinely skewed key is flagged") {
    val out = graft.SparkEntry.queries("q_skew_preflight")(spark, dir).collect()
      .map(r => (r.getAs[String]("tbl"), r.getAs[String]("key")) ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_keys"), r.getAs[Long]("max_rows"),
          r.getAs[Long]("skew_x100"), r.getAs[Boolean]("salt_recommended"))).toMap
    assert(out.size == 6)
    out.foreach { case (_, (nr, nk, mx, sk, rec)) =>
      assert(mx >= nr / nk && mx <= nr)
      assert(sk == math.floor(100.0 * mx * nk / nr).toLong)
      assert(rec == (sk > 1600L))
      assert(sk >= 100L) // max >= mean always
    }
    // uniform synthetic keys must NOT trigger salting recommendations
    assert(!out(("events", "user_id"))._5)
  }

  test("degree dist: log2 bins are exact at power-of-two boundaries") {
    val out = graft.SparkEntry.queries("q_graph_degree_dist")(spark, dir).collect()
    out.foreach { r =>
      val b = r.getAs[Int]("bucket")
      val lo = r.getAs[Long]("min_deg"); val hi = r.getAs[Long]("max_deg")
      assert(lo >= (1L << b) && hi < (1L << (b + 1)),
        s"bucket $b must hold degrees in [2^$b, 2^${b + 1})")
      assert(r.getAs[Long]("n_nodes") > 0)
    }
  }

  test("holt forecast: dyadic level/trend fold replays in plain Scala") {
    val out = graft.SparkEntry.queries("q_evt_forecast")(spark, dir).collect()
    val daily = Q.t(spark, dir, "events")
      .selectExpr("event_type", "to_date(ts) AS day").collect()
      .map(r => (r.getString(0), r.getDate(1).toString))
      .groupBy(identity).map { case ((t0, d), xs) => (t0, d, xs.size.toDouble) }
      .toSeq.groupBy(_._1)
    assert(out.length == daily.size)
    out.foreach { r =>
      val ys = daily(r.getAs[String]("event_type")).sortBy(_._2).map(_._3)
      var l = ys.head; var b = 0.0
      ys.tail.foreach { y =>
        val l2 = (y + l + b) / 2
        b = (l2 - l) / 2 + b / 2
        l = l2
      }
      assert(r.getAs[Int]("n_days") == ys.length)
      assert(r.getAs[Double]("level") == r6(l))
      assert(r.getAs[Double]("trend") == r6(b))
      assert(r.getAs[Double]("forecast_next") == r6(l + b))
    }
  }

  test("cusum: window drawdown form equals the recursive max(0, S+dev) fold") {
    val out = graft.SparkEntry.queries("q_evt_cusum")(spark, dir).collect()
    val daily = Q.t(spark, dir, "events")
      .selectExpr("event_type", "to_date(ts) AS day").collect()
      .map(r => (r.getString(0), r.getDate(1).toString))
      .groupBy(identity).map { case ((t0, d), xs) => (t0, d, xs.size.toLong) }
      .toSeq.groupBy(_._1)
    assert(out.length == daily.size)
    out.foreach { r =>
      val ys = daily(r.getAs[String]("event_type")).sortBy(_._2)
      val n = ys.length.toLong
      val total = ys.map(_._3).sum
      // the RECURSIVE definition, folded directly
      var s = 0L; var best = 0L; var bestDay = ys.head._2
      ys.foreach { case (_, d, y) =>
        s = math.max(0L, s + (n * y - total))
        if (s > best) { best = s; bestDay = d }
      }
      assert(r.getAs[Int]("n_days") == n)
      assert(r.getAs[Long]("total") == total)
      assert(r.getAs[Long]("peak_cusum") == best)
      if (best > 0L) assert(r.getAs[String]("peak_day") == bestDay)
      assert(r.getAs[Boolean]("shift_detected") == (best > total * 2))
    }
  }

  test("events pipeline: every census section partitions the same user base") {
    val out = graft.SparkEntry.queries("q_evt_pipeline")(spark, dir).collect()
    val nUsers = Q.t(spark, dir, "events").select("user_id").distinct().count()
    val nEvents = Q.t(spark, dir, "events").count()
    Seq("arm", "engagement", "lifetime").foreach { sec =>
      val rows = out.filter(_.getAs[String]("section") == sec)
      assert(rows.nonEmpty, s"section $sec missing")
      assert(rows.map(_.getAs[Long]("n_users")).sum == nUsers, s"$sec user partition")
      assert(rows.map(_.getAs[Long]("n_events_sum")).sum == nEvents, s"$sec event mass")
    }
    // conversions are consistent across sections (same per-user flag summed)
    val convBySec = Seq("arm", "engagement", "lifetime").map { sec =>
      out.filter(_.getAs[String]("section") == sec).map(_.getAs[Long]("n_conv")).sum
    }
    assert(convBySec.distinct.size == 1)
  }

  test("pivot: per-day wide counts replay and row-sums equal the day totals") {
    val out = graft.SparkEntry.queries("q_evt_pivot")(spark, dir).collect()
    val days = Q.t(spark, dir, "events")
      .selectExpr("date_format(ts, 'yyyy-MM-dd') AS day", "event_type").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expect = days.groupBy(_._1).map { case (d, es) =>
      d -> es.groupBy(_._2).map { case (t, xs) => t -> xs.length.toLong }
    }
    assert(out.length == expect.size)
    out.foreach { r =>
      val m = expect(r.getAs[String]("day")).withDefaultValue(0L)
      Seq("click", "error", "purchase", "signup", "view").foreach { t =>
        assert(r.getAs[Long](t) == m(t), s"day ${r.getAs[String]("day")} type $t")
      }
    }
  }
}
