package graft.queries

import graft.SparkSpec

/** Pins the ExactSubstr run/merge law on planted documents — in
  * particular the SHIFTED duplicate that non-overlapping chunk dedup
  * (q_txt_chunk_dedup's law) provably cannot see.
  */
class ExactSubstrSpec extends SparkSpec {

  private def a(i: Int) = s"a$i"
  // doc 1: the source, 30 distinct tokens
  private val docA = (0 until 30).map(a)
  // doc 2: tokens a3..a24 of A (a 22-token copy SHIFTED by 3) + 8 novel
  private val docB = (3 to 24).map(a) ++ (0 until 8).map(i => s"b$i")
  // doc 3: internal 10-token repeat — duplicated windows exist but no
  // run reaches the 12-token span gate
  private val docC = (0 until 10).map(i => s"c$i") ++ (0 until 10).map(i => s"c$i")
  // doc 4: two copied regions a0..a11 and a10..a21 whose qualifying
  // runs ABUT in token coverage — the interval merge must fuse them
  private val docE = (0 to 11).map(a) ++ (10 to 21).map(a)

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, docA.mkString(" ")), (2L, docB.mkString(" ")),
      (3L, docC.mkString(" ")), (4L, docE.mkString(" "))
    ).toDF("doc_id", "text")
  }

  test("shifted duplicate: one span covering exactly the copied region") {
    val rows = TextQueries.exactSubstrMass(docs, k = 8, minLen = 12)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows(1L) == ((30L, 0L, 0L))) // first occurrence keeps everything
    // B: removable starts 0..14 (every interior 8-gram of the copy),
    // one 15-run -> span tokens [0, 21] = the 22 copied tokens, not the tail
    assert(rows(2L) == ((30L, 1L, 22L)))
  }

  test("chunk dedup provably misses the shifted copy: zero aligned chunks match") {
    val chunksOf = (d: Seq[String]) =>
      d.grouped(8).filter(_.length == 8).map(_.mkString(" ")).toSet
    assert(chunksOf(docA).intersect(chunksOf(docB)).isEmpty)
  }

  test("min-span gate: internal repeat below 12 tokens reports no span") {
    val rows = TextQueries.exactSubstrMass(docs, k = 8, minLen = 12)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    // C has removable windows (starts 10..12) but the 3-run < 5 gate
    assert(rows(3L) == ((0L, 0L)))
  }

  test("interval merge: abutting qualifying runs fuse into one span, no double count") {
    val rows = TextQueries.exactSubstrMass(docs, k = 8, minLen = 12)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // E: runs at starts 0..4 (coverage 0..11) and 12..16 (coverage
    // 12..23) abut -> ONE merged span of 24 tokens, not two of 12+12
    // with an overlap double-counted
    assert(rows(4L) == ((24L, 1L, 24L)))
  }
}
