package graft.queries

import graft.SparkSpec

/** Hand-traced merges for the multi-round BPE trainer on a planted
  * vocabulary, pinning (a) weighted overlapping pair counts, (b) the
  * max-count/min-pair tie-break, (c) leftmost-non-overlapping merge
  * application via the double-space segmentation-string law, and
  * (d) the early stop when segmentations exhaust their pairs.
  */
class BpeTrainSpec extends SparkSpec {

  test("planted vocab {aaab:2, ab:3}: hand-traced merge table") {
    import spark.implicits._
    // round 1: pairs (a,a)=2*2=4 (overlapping), (a,b)=2+3=5 -> merge ab
    // round 2: aaab=[a,a,ab]: (a,a)=2, (a,ab)=2 -> tie, min pair (a,a)
    // round 3: aaab=[aa,ab]: (aa,ab)=2 -> merge aaab
    // round 4: no pairs anywhere -> early stop (3 rows, not 4)
    val vocab = Seq(("aaab", 2L), ("ab", 3L)).toDF("token", "freq")
    val got = TextQueries.bpeTrain(vocab, 4)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
      .toList
    assert(got == List(
      (1, "a", "b", "ab", 5L),
      (2, "a", "a", "aa", 2L),
      (3, "aa", "ab", "aaab", 2L)), s"got $got")
  }

  test("merge application: consecutive occurrences both merge, no cross-boundary match") {
    import spark.implicits._
    // "abab" -> round 1 merges (a,b) at BOTH positions (consecutive
    // occurrences under the shared-delimiter law); "xab" exercises the
    // boundary guard: pair (b,x) never matches across "ab|x".
    val vocab = Seq(("abab", 1L), ("xab", 1L)).toDF("token", "freq")
    val got = TextQueries.bpeTrain(vocab, 2)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
      .toList
    // r1: (a,b)=3 wins; segs: [ab, ab], [x, ab]
    // r2: (ab,ab)=1, (x,ab)=1 -> tie, min lhs "ab" < "x"
    assert(got == List((1, "a", "b", 3L), (2, "ab", "ab", 1L)), s"got $got")
  }

  test("encode side: final segmentations match the hand-traced merges") {
    import spark.implicits._
    val vocab = Seq(("aaab", 2L), ("ab", 3L), ("ba", 1L)).toDF("token", "freq")
    val (_, segf) = TextQueries.bpeTrainFull(vocab, 3)
    val segs = segf.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // after merges ab, aa, aaab: both high-freq tokens collapse to one
    // symbol; (b,a) hasn't won a round yet, so "ba" stays characters
    assert(segs == Map(
      "aaab" -> " aaab ", "ab" -> " ab ", "ba" -> " b  a "), s"got $segs")
  }
}
