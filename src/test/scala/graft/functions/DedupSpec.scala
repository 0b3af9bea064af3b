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

  test("scala-helper simhash agrees bit-for-bit with the in-plan path") {
    import spark.implicits._
    val texts = Seq(base.mkString(" "), "one", "alpha beta gamma")
    val fromPlan = Dedup.withSimhash(texts.zipWithIndex.map { case (t, i) =>
        (i.toLong, t) }.toDF("id", "text"), "text")
      .orderBy("id").select("simhash").collect().map(_.getLong(0))
    texts.zip(fromPlan).foreach { case (t, sh) =>
      assert(Dedup.simhash(t.split(" ").toSeq) == sh, s"mismatch for '$t'")
    }
  }

  test("scala-helper signature agrees bit-for-bit with the in-plan path") {
    import spark.implicits._
    val texts = Seq(base.mkString(" "), "tiny doc", // shorter than width
      "alpha beta gamma delta epsilon zeta")
    val fromPlan = Dedup.withMinhash(texts.zipWithIndex.map { case (t, i) =>
        (i.toLong, t) }.toDF("id", "text"), "text", numHashes = 64)
      .orderBy("id").select("minhash").collect()
      .map(_.getSeq[Long](0).toArray)
    texts.zip(fromPlan).foreach { case (t, sig) =>
      val helper = Dedup.minhashSignature(t.split(" ").toSeq, 64, 3)
      assert(helper.toSeq == sig.toSeq, s"mismatch for '$t'")
    }
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

  test("salted LSH: degenerate identical-doc corpus spreads the hot key, identical results") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // adversarial skew: 200 identical docs collapse every band into ONE
    // (band,bucket) key; 100 unique docs as background
    val rng = new scala.util.Random(3)
    val docs = ((0 until 200).map(i =>
      (i.toLong, "the same boilerplate text repeated in every copy of this page")) ++
      (200 until 300).map(i =>
        (i.toLong, s"unique document $i " + Seq.fill(12)(rng.nextInt(10000)).mkString(" "))))
      .toDF("doc_id", "text")
    val sigs = Dedup.withMinhash(docs, "text", numHashes = 128, shingleWidth = 3)
      .persist()
    try {
      val unsalted = Dedup.lshCandidatePairs(sigs, "doc_id", bands = 16)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val salted = Dedup.lshCandidatePairsSalted(sigs, "doc_id", bands = 16,
        saltBuckets = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(salted == unsalted, "salting must not change the pair set")
      assert(unsalted.count { case (a, b, e) => a < 200 && b < 200 && e == 1.0 } ==
        200 * 199 / 2, "all identical-doc pairs found at estimate 1.0")
      // the join-key distribution: salting caps the left side's hot key
      val bandHash = udf((sig: Seq[Long], band: Int) =>
        sig.slice(band * 8, (band + 1) * 8).hashCode().toLong)
      val banded = sigs
        .withColumn("band", explode(sequence(lit(0), lit(15))))
        .withColumn("bucket", bandHash(col("minhash"), col("band")))
      def maxKey(cols: Seq[String]): Long =
        banded.withColumn("salt", pmod(xxhash64(col("doc_id")), lit(8)))
          .groupBy(cols.map(col): _*).count()
          .agg(max("count")).head().getLong(0)
      val hot = maxKey(Seq("band", "bucket"))
      val spread = maxKey(Seq("band", "bucket", "salt"))
      assert(hot >= 200L, s"degenerate corpus produced no hot key ($hot)")
      assert(spread <= 200 / 8 + 30, s"salt must split the hot key: $hot -> $spread")
    } finally sigs.unpersist()
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

  test("containmentPairs catches a subset doc that Jaccard misses") {
    import spark.implicits._
    // B = 30 distinct tokens; A = its first 12 tokens (a planted
    // excerpt); C unrelated. A-in-B containment = 1.0 while
    // Jaccard(A,B) = 10/28 < 0.5 — the asymmetric case the symmetric
    // metric structurally cannot flag.
    val wordsB = (1 to 30).map(i => s"tok$i")
    val docs = Seq(
      (1L, wordsB.take(12).mkString(" ")),
      (2L, wordsB.mkString(" ")),
      (3L, (1 to 20).map(i => s"other$i").mkString(" ")))
      .toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, "doc_id", "text", tau = 0.9, maxDf = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getInt(2), r.getInt(3), r.getInt(4), r.getDouble(5))).toMap
    assert(pairs.keySet == Set((1L, 2L)), s"expected only the excerpt pair: $pairs")
    val (inter, nA, nB, cont) = pairs((1L, 2L))
    assert(inter == 10 && nA == 10 && nB == 28 && cont == 1.0)
    // the symmetric metric on the same sets stays far below any
    // near-dup threshold
    assert(inter.toDouble / (nA + nB - inter) < 0.5)
  }

  test("containmentPairs df cap drops boilerplate-only pairs") {
    import spark.implicits._
    // every doc shares the same 5-token boilerplate header; bodies are
    // disjoint. With maxDf < corpus size the header shingles are cut,
    // so no pair qualifies — boilerplate is template, not duplication.
    val header = "common header shared by every document"
    val docs = (1L to 8L).map(i =>
      i -> s"$header body$i unique$i content$i here$i now$i")
      .toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, "doc_id", "text", tau = 0.5, maxDf = 3)
    assert(pairs.isEmpty, "boilerplate-only overlap must not pair")
  }
}
