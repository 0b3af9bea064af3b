package graft.queries

import graft.SparkSpec
import scala.math.BigDecimal.RoundingMode.HALF_UP

/** Round-12 curation operators — sequence-pattern matching, grouped
  * k-fold, weighted sampling, centroid-distance pruning. Each is
  * checked against an independent plain-Scala recompute of the full
  * contract at sf0.001 (the DuckDB oracle hash-checks the same values
  * at sf0.01; these pin semantics row-by-row with no SQL in the loop).
  */
class CurationOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rnd(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, HALF_UP).toDouble

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("evt pattern: journeys assemble in (ts, event_id) order and regex counts replay") {
    val out = graft.SparkEntry.queries("q_evt_pattern")(spark, dir).collect()
    val events = Q.t(spark, dir, "events")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    val journeys = events.groupBy(_._1).map { case (uid, evs) =>
      uid -> evs.sortBy(e => (e._2.toInstant.getEpochSecond,
        e._2.toInstant.getNano.toLong, e._3)).map(_._4.head).mkString
    }
    assert(out.length == journeys.size)
    def count(j: String, p: String): Int = {
      val m = java.util.regex.Pattern.compile(p).matcher(j)
      var n = 0; while (m.find()) n += 1; n
    }
    out.foreach { r =>
      val j = journeys(r.getAs[Long]("user_id"))
      assert(r.getAs[Long]("n_events") == j.length)
      assert(r.getAs[Int]("n_conv") == count(j, "vc*p"))
      assert(r.getAs[Int]("n_err_runs") == count(j, "ee+"))
      assert(r.getAs[Boolean]("signup_converted") == (count(j, "s[^p]*p") > 0))
      assert(r.getAs[String]("journey_fp") == md5hex(j))
    }
    // at least one user converts and the journeys are non-trivial
    assert(out.exists(_.getAs[Int]("n_conv") > 0))
  }

  test("kfold: fold is a pure function of source, no source straddles folds") {
    val out = graft.SparkEntry.queries("q_ds_kfold")(spark, dir).collect()
    val docs = Q.t(spark, dir, "documents")
      .select("source", "lang", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    def fold(src: String): Long =
      java.lang.Long.parseLong(md5hex(src).take(8), 16) % DatasetQueries.kFolds
    // expected per (fold, lang) rollup
    val exp = docs.groupBy(d => (fold(d._1), d._2))
    assert(out.length == exp.size)
    out.foreach { r =>
      val key = (r.getAs[Long]("fold"), r.getAs[String]("lang"))
      val g = exp(key)
      assert(r.getAs[Long]("n_docs") == g.length)
      assert(r.getAs[Long]("n_sources") == g.map(_._1).distinct.length)
      assert(r.getAs[Long]("n_chars_total") == g.map(_._3).sum)
    }
    // leakage rule: every source appears in exactly one fold
    val srcFolds = docs.map(_._1).distinct.map(s => s -> fold(s))
    assert(srcFolds.map(_._2).forall(f => f >= 0 && f < DatasetQueries.kFolds))
    val outSources = out.map(r => r.getAs[Long]("n_sources")).sum
    assert(outSources >= srcFolds.length) // (fold,lang) cells re-count a source per lang
  }

  test("weighted sample: Efraimidis-Spirakis keys replay; selection is char-weighted") {
    val out = graft.SparkEntry.queries("q_txt_sample_weighted")(spark, dir).collect()
    val docs = Q.t(spark, dir, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val keyed = docs.map { case (id, w) =>
      val h = java.lang.Math.floorMod(id * 2654435761L, 4294967296L)
      (id, w, rnd(-math.log((h + 1).toDouble / 4294967296.0) / w, 12))
    }
    val expect = keyed.sortBy(k => (k._3, k._1)).take(100)
    assert(out.length == expect.length)
    val gotIds = out.map(_.getAs[Long]("doc_id")).toSet
    assert(gotIds == expect.map(_._1).toSet)
    out.foreach { r =>
      val k = keyed.find(_._1 == r.getAs[Long]("doc_id")).get
      assert(r.getAs[Double]("skey") == k._3)
    }
    // weighting property: expected char mass per sampled doc exceeds the
    // corpus mean (long docs are proportionally likelier to be drawn)
    val corpusMean = docs.map(_._2).sum.toDouble / docs.length
    val sampleMean = out.map(_.getAs[Long]("n_chars")).sum.toDouble / out.length
    assert(sampleMean > corpusMean)
  }

  test("mm phash: dHash clusters and banded near-pairs replay from text bytes") {
    val out = graft.SparkEntry.queries("q_mm_phash")(spark, dir).collect()
    val docs = Q.t(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def dhash(text: String): Long = {
      val b = text.getBytes("UTF-8")
      val p = Array.tabulate(64)(i => b(i % b.length) & 0xff)
      var h = 0L
      for (j <- 0 until 63) {
        val r = j / 8; val c = j % 8
        if (p(r * 8 + (c + 1) % 8) > p(r * 8 + c)) h |= 1L << j
      }
      h
    }
    val clusters = docs.groupBy(d => dhash(d._2)).map { case (h, ds) => h -> ds.length }
    val exact = clusters.filter(_._2 >= 2)
      .map { case (h, n) => ("exact_cluster", h, h, n.toLong, n.toLong, 0) }.toSet
    val distinctH = clusters.keys.toSeq
    val byBand = distinctH.flatMap(h => (0 until 4).map(b => ((b, (h >> (16 * b)) & 0xffffL), h)))
      .groupBy(_._1).values
    val cand = byBand.flatMap { bs =>
      val hs = bs.map(_._2).distinct.sorted
      for (i <- hs.indices; k <- i + 1 until hs.length) yield (hs(i), hs(k))
    }.toSet
    val near = cand.collect {
      case (h1, h2) if java.lang.Long.bitCount(h1 ^ h2) <= 10 =>
        ("near_pair", h1, h2, clusters(h1).toLong, clusters(h2).toLong,
          java.lang.Long.bitCount(h1 ^ h2))
    }
    val got = out.map(r => (r.getAs[String]("kind"), r.getAs[Long]("h1"),
      r.getAs[Long]("h2"), r.getAs[Long]("n1"), r.getAs[Long]("n2"),
      r.getAs[Int]("hamming"))).toSet
    assert(got == exact ++ near)
    assert(out.forall(r => r.getAs[Long]("h1") >= 0L && r.getAs[Long]("h2") >= 0L))
    // pigeonhole recall: every pair within hamming <= 3 must be present
    val all3 = for (i <- distinctH.indices; k <- i + 1 until distinctH.length
      if java.lang.Long.bitCount(distinctH(i) ^ distinctH(k)) <= 3)
      yield (math.min(distinctH(i), distinctH(k)), math.max(distinctH(i), distinctH(k)))
    assert(all3.forall(p => near.exists(n => n._2 == p._1 && n._3 == p._2)))
  }

  test("dedup weights: per-cluster micro-weights replay; effective mass is bounded") {
    val out = graft.SparkEntry.queries("q_dedup_weights")(spark, dir).collect()
    val docs = Q.t(spark, dir, "documents").select("lang", "text").collect()
      .map { r =>
        val norm = r.getString(1).trim.toLowerCase.replaceAll("\\s+", " ")
        (r.getString(0), md5hex(norm))
      }
    val szByFp = docs.groupBy(_._2).map { case (fp, xs) => fp -> xs.length }
    val byLang = docs.groupBy(_._1)
    assert(out.length == byLang.size)
    out.foreach { r =>
      val g = byLang(r.getAs[String]("lang"))
      val ws = g.map(d => 1000000L / szByFp(d._2))
      assert(r.getAs[Long]("n_docs") == g.length)
      assert(r.getAs[Long]("n_unique") == g.map(_._2).distinct.length)
      assert(r.getAs[Long]("eff_micro") == ws.sum)
      assert(r.getAs[Long]("min_w") == ws.min && r.getAs[Long]("max_w") == ws.max)
      // soft-dedup invariant: unique mass <= effective mass <= raw mass
      assert(ws.sum <= g.length * 1000000L)
      assert(ws.sum >= g.map(_._2).distinct.length.toLong * 500000L)
    }
  }

  test("emb outliers: per-label centroid cosine extremes replay") {
    val out = graft.SparkEntry.queries("q_emb_outliers")(spark, dir).collect()
    val vecs = Q.t(spark, dir, "embeddings")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    val byLabel = vecs.groupBy(_._2)
    val expected = byLabel.iterator.flatMap { case (label, vs) =>
      val dim = vs.head._3.length
      val cent = Array.tabulate(dim) { i =>
        rnd(vs.map(_._3(i)).sum / vs.length, 6)
      }
      def cos(v: Array[Double]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < dim) { dot += v(i) * cent(i); na += v(i) * v(i); nb += cent(i) * cent(i); i += 1 }
        rnd(dot / (math.sqrt(na) * math.sqrt(nb)), 6)
      }
      val scored = vs.map(v => (v._1, cos(v._3)))
      val asc = scored.sortBy(s => (s._2, s._1)).take(5).zipWithIndex
        .map { case ((id, c), i) => (label, id, c, "outlier", i + 1) }
      val desc = scored.sortBy(s => (-s._2, s._1)).take(5).zipWithIndex
        .map { case ((id, c), i) => (label, id, c, "prototype", i + 1) }
        .filterNot(d => asc.exists(_._2 == d._2))
      asc ++ desc
    }.toSet
    val got = out.map(r => (r.getAs[Int]("label"), r.getAs[Long]("vec_id"),
      r.getAs[Double]("cos_c"), r.getAs[String]("role"), r.getAs[Int]("rk"))).toSet
    assert(got == expected)
    // scoring sanity: prototypes are strictly closer than outliers per label
    byLabel.keys.foreach { l =>
      val rows = out.filter(_.getAs[Int]("label") == l)
      val protoMin = rows.filter(_.getAs[String]("role") == "prototype")
        .map(_.getAs[Double]("cos_c")).min
      val outMax = rows.filter(_.getAs[String]("role") == "outlier")
        .map(_.getAs[Double]("cos_c")).max
      assert(protoMin >= outMax)
    }
  }
}
