package graft.queries

import graft.SparkSpec

/** Property gate for the ExactSubstr law: the distributed
  * keep-first/run/merge pipeline must agree with a plain in-memory
  * reference on random small corpora over a TINY alphabet (forced
  * collisions, overlaps, internal repeats — the shapes a planted
  * fixture can miss). Reference and engine share no code: the
  * reference marks duplicates on k-gram STRINGS with nested loops and
  * merges intervals imperatively.
  */
class ExactSubstrPropertySpec extends SparkSpec {

  private def reference(docs: Seq[(Long, Seq[String])], k: Int,
                        minLen: Int): Map[Long, (Long, Long, Long)] = {
    val minRun = minLen - k + 1
    val seen = scala.collection.mutable.Map.empty[String, (Long, Int)]
    val dup = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Int]]
    docs.sortBy(_._1).foreach { case (id, tk) =>
      for (p <- 0 to tk.length - k) {
        val g = tk.slice(p, p + k).mkString(" ")
        if (seen.contains(g)) dup.getOrElseUpdate(id, scala.collection.mutable.Set()) += p
        else seen(g) = (id, p)
      }
    }
    docs.map { case (id, tk) =>
      val ps = dup.getOrElse(id, scala.collection.mutable.Set()).toSeq.sorted
      // maximal consecutive runs
      val runs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      ps.foreach { p =>
        if (runs.nonEmpty && runs.last._2 == p - 1)
          runs(runs.length - 1) = (runs.last._1, p)
        else runs += ((p, p))
      }
      val q = runs.filter { case (a, b) => b - a + 1 >= minRun }
        .map { case (a, b) => (a, b + k - 1) } // token coverage
      // interval union over qualifying runs
      val merged = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      q.sortBy(_._1).foreach { case (a, b) =>
        if (merged.nonEmpty && a <= merged.last._2 + 1)
          merged(merged.length - 1) = (merged.last._1, math.max(merged.last._2, b))
        else merged += ((a, b))
      }
      id -> ((tk.length.toLong, merged.length.toLong,
        merged.map { case (a, b) => (b - a + 1).toLong }.sum))
    }.toMap
  }

  test("random tiny-alphabet corpora: engine mass equals the string reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 1 to 6) {
      val nDocs = 3 + rnd.nextInt(3)
      // doc 1 is the donor: a 30-token xyz sequence later docs copy from
      val donor = Seq.fill(30)("xyz" (rnd.nextInt(3)).toString)
      val docs = (2L to (nDocs + 1)).map { id =>
        val base = Seq.fill(4 + rnd.nextInt(18))("abc" (rnd.nextInt(3)).toString)
        // half the docs splice a GENUINE donor window at a random
        // shift — the cross-doc duplication chunk dedup misses; the
        // abc tokens add chance-collision duplication on top
        val tk =
          if (rnd.nextBoolean()) {
            val off = rnd.nextInt(16)
            base.take(3) ++ donor.slice(off, off + 14) ++ base.drop(3)
          } else base
        (id, tk)
      }
      val corpus = (1L, donor) +: docs
      val df = corpus.map { case (id, tk) => (id, tk.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = TextQueries.exactSubstrMass(df, k = 3, minLen = 5)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      val want = reference(corpus, k = 3, minLen = 5)
      assert(got == want, s"trial $trial: $got vs $want\ncorpus=$corpus")
    }
  }
}
