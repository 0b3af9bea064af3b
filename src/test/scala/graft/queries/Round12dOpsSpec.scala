package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Round-12d operators replayed in plain Scala at sf0.001 (DuckDB
  * hash-gates the same values at sf0.01/sf0.1/sf1): triangle census
  * against a brute-force enumerator, link prediction against
  * brute-force common-neighbor top-5, the inter-arrival and
  * audience-overlap set algebra, the INT8 quantizer's mathematical
  * error bound, and the bigram LM's probability algebra.
  */
class Round12dOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Undirected part co-purchase adjacency, brute-forced in Scala. */
  private lazy val adj: Map[Long, Set[Long]] = {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder: Seq[Seq[Long]] =
      li.toSeq.distinct.groupBy(_._1).values.toSeq.map(_.map(_._2).distinct)
    val edges: Set[(Long, Long)] = byOrder.flatMap { ps =>
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.toSet
    val nodes: Set[Long] = edges.flatMap(e => Seq(e._1, e._2))
    nodes.map(n => n -> edges.collect {
      case (a, b) if a == n => b
      case (a, b) if b == n => a
    }).toMap
  }

  test("triangle census equals the brute-force per-node enumeration") {
    val triPerNode = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val nodes = adj.keys.toSeq.sorted
    for (u <- nodes; v <- adj(u) if v > u; w <- adj(u) if w > v && adj(v)(w)) {
      triPerNode(u) += 1; triPerNode(v) += 1; triPerNode(w) += 1
    }
    val expected = nodes.groupBy(n => triPerNode(n))
      .map { case (t, ns) => (t, ns.length.toLong) }
    val got = SparkEntry.queries("q_graph_triangles")(spark, dir).collect()
      .map(r => (r.getAs[Long]("tri_count"), r.getAs[Long]("n_parts"))).toMap
    assert(got == expected, s"census mismatch: got $got expected $expected")
    // the census covers every node exactly once
    assert(got.values.sum == nodes.length)
  }

  test("link prediction equals brute-force common-neighbor top-5 per probe") {
    val probes = spark.read.parquet(s"$dir/part.parquet")
      .select("p_partkey").collect().map(_.getLong(0))
      .filter(_ % 101 == 0).sorted.take(GraphQueries.linkpredProbes)
    val out = SparkEntry.queries("q_graph_linkpred")(spark, dir).collect()
    val byProbe = out.groupBy(_.getAs[Long]("u"))
    for (u <- probes if adj.contains(u)) {
      val cand = adj.keys.filter(v => v != u && !adj(u)(v))
        .map(v => (v, (adj(u) & adj(v)).size.toLong)).filter(_._2 > 0)
      val top = cand.toSeq.sortBy { case (v, cn) => (-cn, v) }.take(5)
      val got = byProbe.getOrElse(u, Array.empty).sortBy(_.getAs[Int]("rnk"))
        .map(r => (r.getAs[Long]("v"), r.getAs[Long]("cn"))).toSeq
      assert(got == top, s"probe $u: got $got expected $top")
      // jaccard myriad replays from degrees
      byProbe.getOrElse(u, Array.empty).foreach { r =>
        val v = r.getAs[Long]("v"); val cn = r.getAs[Long]("cn")
        val expJac = math.floor(10000.0 * cn / (adj(u).size + adj(v).size - cn)).toLong
        assert(r.getAs[Long]("jac_myriad") == expJac)
      }
    }
    // no probe outside the slice leaked in
    assert(byProbe.keySet.subsetOf(probes.toSet))
  }

  test("inter-arrival census: totals and bucket bounds replay") {
    val evs = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("user_id", "event_id", "unix_micros(cast(ts as timestamp)) as us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gaps = evs.groupBy(_._1).values.flatMap { es =>
      val s = es.sortBy(e => (e._3, e._2)).map(_._3)
      s.zip(s.tail).map { case (a, b) => b - a }
    }.toSeq
    val out = SparkEntry.queries("q_evt_interarrival")(spark, dir).collect()
    assert(out.map(_.getAs[Long]("n_gaps")).sum == gaps.length)
    assert(out.map(_.getAs[Long]("sum_gap_us")).sum == gaps.sum)
    out.foreach { r =>
      val b = r.getAs[Int]("bucket")
      val lo = r.getAs[Long]("min_gap_us"); val hi = r.getAs[Long]("max_gap_us")
      assert(lo <= hi)
      // bucket b holds gaps with floor(log2) == b (bucket 0 also holds 0)
      if (b > 0) assert(lo >= (1L << b) && hi < (1L << (b + 1)))
      else assert(hi <= 1L)
    }
  }

  test("audience overlap: set algebra replays and jaccard is bounded") {
    val inc = spark.read.parquet(s"$dir/events.parquet")
      .select("event_type", "user_id").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val audience = inc.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).toSet }
    val out = SparkEntry.queries("q_evt_audience_overlap")(spark, dir).collect()
    val types = audience.keys.toSeq.sorted
    assert(out.length == types.combinations(2).length)
    out.foreach { r =>
      val a = audience(r.getAs[String]("type_a")); val b = audience(r.getAs[String]("type_b"))
      assert(r.getAs[String]("type_a") < r.getAs[String]("type_b"))
      assert(r.getAs[Long]("n_a") == a.size && r.getAs[Long]("n_b") == b.size)
      assert(r.getAs[Long]("n_both") == (a & b).size)
      val jac = r.getAs[Long]("jac_myriad")
      assert(jac == math.floor(10000.0 * (a & b).size / (a | b).size).toLong)
      assert(jac >= 0 && jac <= 10000)
    }
  }

  test("int8 quantizer: level occupancy and the half-step error bound hold") {
    val out = SparkEntry.queries("q_emb_int8")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_levels") >= 1 && r.getAs[Long]("n_levels") <= 255)
      assert(r.getAs[Long]("min_q") >= -127 && r.getAs[Long]("max_q") <= 127)
      // |x - q·s/127| <= s/254 (round-to-nearest half-step), so the
      // normalized nano error is bounded by 1e9/254 (+1 for the floor)
      assert(r.getAs[Long]("max_err_nano") <= 1000000000L / 254 + 1,
        s"dim ${r.getAs[Long]("dim")} err ${r.getAs[Long]("max_err_nano")}")
    }
  }

  test("top paths: prefix census replays and the top-20 cut is maximal") {
    val evs = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("user_id", "event_id", "unix_micros(cast(ts as timestamp)) as us",
        "substr(event_type, 1, 1) as l")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val journeys = evs.groupBy(_._1).values.map { es =>
      es.sortBy(e => (e._3, e._2)).map(_._4).mkString
    }.toSeq
    val census = journeys.groupBy(_.take(5)).map { case (p, js) =>
      (p, js.length.toLong, js.count(_.contains("p")).toLong)
    }.toSeq.sortBy { case (p, n, _) => (-n, p) }
    val out = SparkEntry.queries("q_evt_top_paths")(spark, dir).collect()
      .map(r => (r.getAs[String]("path_prefix"), r.getAs[Long]("n_users"),
        r.getAs[Long]("n_converted")))
      .sortBy { case (p, n, _) => (-n, p) }
    assert(out.toSeq == census.take(out.length))
    assert(out.length == math.min(20, census.length))
  }

  test("cohort LTV: triangle replays in exact cents and cumsum telescopes") {
    val os = spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("o_custkey", "year(o_orderdate)*12 + month(o_orderdate) - 1 as m",
        "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getInt(1), math.floor(r.getDouble(2) * 100.0 + 0.5).toLong))
    val m0 = os.groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).min }
    val out = SparkEntry.queries("q_evt_cohort_ltv")(spark, dir).collect()
    val expected = os.groupBy(x => (m0(x._1), x._2 - m0(x._1))).map { case ((c0, age), xs) =>
      (f"${c0 / 12}%04d-${c0 % 12 + 1}%02d", age.toLong) ->
        ((xs.map(_._1).distinct.length.toLong, xs.length.toLong, xs.map(_._3).sum))
    }
    assert(out.length == expected.size)
    out.foreach { r =>
      val k = (r.getAs[String]("cohort"), r.getAs[Int]("age_months").toLong)
      val (nc, no, rev) = expected(k)
      assert(r.getAs[Long]("n_custs") == nc && r.getAs[Long]("n_orders") == no &&
        r.getAs[Long]("rev_cents") == rev, s"mismatch at $k")
    }
    // cumulative telescopes: per cohort, cum at max age == sum of rev
    out.groupBy(_.getAs[String]("cohort")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("age_months"))
      assert(sorted.last.getAs[Long]("cum_rev_cents") ==
        sorted.map(_.getAs[Long]("rev_cents")).sum)
    }
  }

  test("bigram LM: probabilities and context mass replay from raw counts") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("lang", "text").collect().map(r => (r.getString(0), r.getString(1)))
    val bigrams = docs.flatMap { case (lang, text) =>
      val w = text.split(" ", -1)
      w.zip(w.tail).map { case (a, b) => ((lang, a, b), 1L) }
    }.groupBy(_._1).map { case (k, xs) => (k, xs.map(_._2).sum) }
    val out = SparkEntry.queries("q_txt_bigram_lm")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val k = (r.getAs[String]("lang"), r.getAs[String]("w1"), r.getAs[String]("w2"))
      assert(bigrams(k) == r.getAs[Long]("n12"), s"count mismatch at $k")
      val n1 = bigrams.collect { case ((l, w1, _), n) if l == k._1 && w1 == k._2 => n }.sum
      assert(r.getAs[Long]("n1") == n1)
      assert(r.getAs[Long]("prob_myriad") == math.floor(10000.0 * bigrams(k) / n1).toLong)
      assert(r.getAs[Int]("ctx_rnk") <= 20 && r.getAs[Int]("cont_rnk") <= 3)
    }
  }
}
