package graft.queries

import graft.SparkSpec
import scala.math.BigDecimal.RoundingMode.HALF_UP

/** Round-11 pipeline-quality operators — each checked against an
  * independent plain-Scala recompute of the full contract (the DuckDB
  * oracle hash-checks the same values at sf0.01; these pin semantics
  * at the row level with no SQL in the loop).
  */
class PipelineQualitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // Spark's round(e, 6) on DoubleType: BigDecimal(x).setScale(6, HALF_UP)
  private def r6(x: Double): Double = BigDecimal(x).setScale(6, HALF_UP).toDouble

  test("repetition filter: metrics replay a plain-Scala recompute") {
    val out = graft.SparkEntry.queries("q_txt_repetition")(spark, dir).collect()
    val docs = Q.t(spark, dir, "documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.length == docs.size)
    assert(out.exists(_.getAs[Boolean]("gopher_ok")))
    out.foreach { r =>
      val tk = docs(r.getAs[Long]("doc_id")).split(" ", -1).toSeq
      val bg = tk.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      val tg = tk.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq
      def rate(g: Seq[String]): Double =
        if (g.isEmpty) 0.0 else r6(1.0 - g.distinct.length.toDouble / g.length)
      val top2 = if (bg.isEmpty) 0 else bg.groupBy(identity).values.map(_.size).max
      val top2Frac = r6(top2 * 2.0 / tk.length)
      assert(r.getAs[Int]("n_tokens") == tk.length)
      assert(r.getAs[Double]("rep2") == rate(bg))
      assert(r.getAs[Double]("rep3") == rate(tg))
      assert(r.getAs[Int]("top2_n") == top2)
      assert(r.getAs[Double]("top2_frac") == top2Frac)
      assert(r.getAs[Boolean]("gopher_ok") == (rate(bg) <= 0.05 && top2Frac <= 0.15))
    }
  }

  test("dup spans: cross-document census replays a plain-Scala recompute") {
    val out = graft.SparkEntry.queries("q_txt_dup_spans")(spark, dir).collect()
    val sets = Q.t(spark, dir, "documents").select("doc_id", "text").collect()
      .map { r =>
        val tk = r.getString(1).split(" ", -1).toSeq
        r.getLong(0) -> tk.sliding(5).filter(_.length == 5).map(_.mkString(" ")).toSet
      }.toMap
    // span census over distinct-per-doc spans (set semantics, like the query)
    val census: Map[String, Int] =
      sets.values.flatten.groupBy(identity).map { case (h, occ) => h -> occ.size }
    assert(out.length == sets.count(_._2.nonEmpty))
    assert(out.exists(_.getAs[Boolean]("dup_doc")), "fixture has planted duplicates")
    out.foreach { r =>
      val sh = sets(r.getAs[Long]("doc_id"))
      val shared = sh.count(x => census(x) >= 2)
      assert(r.getAs[Long]("n_spans") == sh.size)
      assert(r.getAs[Long]("n_shared") == shared)
      assert(r.getAs[Long]("max_span_docs") == sh.map(census).max)
      assert(r.getAs[Double]("shared_frac") == r6(shared.toDouble / sh.size))
      assert(r.getAs[Boolean]("dup_doc") ==
        (r6(shared.toDouble / sh.size) >= 0.5))
    }
  }

  test("rolling anomaly: flags replay a plain-Scala trailing-window recompute") {
    val out = graft.SparkEntry.queries("q_evt_anomaly")(spark, dir).collect()
    val evs = Q.t(spark, dir, "events")
      .select("user_id", "event_id", "value", "ts").collect()
      .map { r =>
        val ts = r.getAs[java.sql.Timestamp]("ts")
        val micros = ts.getTime / 1000 * 1000000L + ts.getNanos / 1000
        (r.getLong(0), r.getLong(1), r.getDouble(2), micros)
      }
    val expected = evs.toSeq.groupBy(_._1).flatMap { case (uid, rows) =>
      val ordered = rows.sortBy(e => (e._4, e._2))
      ordered.zipWithIndex.flatMap { case ((_, eid, value, _), i) =>
        val frame = ordered.slice(math.max(0, i - 10), i)
        if (frame.length < 5) None
        else {
          // exact decimal window sums -> one fixed double expression
          val decs = frame.map(e => BigDecimal(e._3).setScale(2, HALF_UP))
          val s1 = decs.sum.toDouble
          val s2 = decs.map(d => d * d).sum.toDouble
          val n = frame.length.toDouble
          val mu = s1 / n
          val sd = math.sqrt(math.max(s2 / n - mu * mu, 0.0))
          val flag = sd > 0 && math.abs(value - mu) > 3.0 * sd
          Some((uid, eid) -> ((r6(mu), r6(sd), flag, value)))
        }
      }
    }
    assert(out.length == expected.size)
    assert(out.exists(_.getAs[Boolean]("is_anomaly")))
    assert(out.exists(r => !r.getAs[Boolean]("is_anomaly")))
    out.foreach { r =>
      val key = (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"))
      val (mu, sd, flag, value) = expected(key)
      assert(r.getAs[Double]("value") == value)
      assert(r.getAs[Double]("mu") == mu, s"mu mismatch at $key")
      assert(r.getAs[Double]("sd") == sd, s"sd mismatch at $key")
      assert(r.getAs[Boolean]("is_anomaly") == flag, s"flag mismatch at $key")
    }
  }
}
