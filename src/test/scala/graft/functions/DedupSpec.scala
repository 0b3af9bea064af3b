package graft.functions

import graft.SparkSpec

class DedupSpec extends SparkSpec {

  private val base = "the quick brown fox jumps over the lazy dog again and again today".split(" ").toSeq

  test("minhash signature estimates jaccard") {
    val a = Dedup.minhashSignature(base, 256, 3)
    val same = Dedup.minhashSignature(base, 256, 3)
    assert(a.toSeq == same.toSeq, "deterministic")
    assert(Dedup.estimateJaccard(a, same) == 1.0)
    // one word changed: high but < 1
    val b = Dedup.minhashSignature(base.updated(4, "leaps"), 256, 3)
    val est = Dedup.estimateJaccard(a, b)
    assert(est > 0.3 && est < 1.0, s"similar docs estimate $est")
    // disjoint text: ~0
    val c = Dedup.minhashSignature(Seq("alpha", "beta", "gamma", "delta", "eps"), 256, 3)
    assert(Dedup.estimateJaccard(a, c) < 0.1)
  }

  test("LSH banding finds planted near-duplicates") {
    import spark.implicits._
    val doc = base.mkString(" ")
    val nearDup = base.updated(2, "red").mkString(" ")
    val docs = (Seq((0L, doc), (1L, nearDup), (2L, doc + " postfix tail")) ++
      (3L until 40L).map(i => i -> s"unrelated content number $i with words ${i * 7} ${i * 13} ${i * 31} entirely different"))
      .toDF("doc_id", "text")
    val sigs = Dedup.withMinhash(docs, "text")
    val pairs = Dedup.lshCandidatePairs(sigs, "doc_id", bands = 32, minEstimate = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), s"near-dup found: $pairs")
    assert(pairs.contains((0L, 2L)))
    assert(!pairs.exists { case (a, b) => a >= 3L && b >= 3L && (b - a) > 1 },
      s"no spurious unrelated pairs: $pairs")
  }

  test("simhash: identical -> distance 0, similar -> small, different -> large") {
    val a = Dedup.simhash(base)
    assert(Dedup.simhash(base) == a)
    val near = Dedup.simhash(base.updated(1, "slow"))
    val far = Dedup.simhash(Seq("zeta", "omega", "psi", "chi", "phi", "nu"))
    assert(java.lang.Long.bitCount(a ^ near) < java.lang.Long.bitCount(a ^ far))
  }

  test("simhashPairs blocks on chunks and filters by hamming") {
    import spark.implicits._
    val doc = base.mkString(" ")
    val docs = (Seq((0L, doc), (1L, doc)) ++
      (2L until 20L).map(i => i -> s"totally different text ${i} ${i * 3} ${i * 11} with unique tokens here"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(Dedup.withSimhash(docs, "text"), "doc_id", maxHamming = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs.get((0L, 1L)).contains(0), s"exact dup at hamming 0: $pairs")
  }
}
