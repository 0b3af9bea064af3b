package graft.queries

import graft.SparkSpec
import scala.util.Random

/** Property check for the BPE trainer's double-space segmentation-
  * string law: on seeded random vocabularies, the distributed trainer
  * (merge application = ONE string replace per round) must produce the
  * same merge table and final segmentations as a plain in-memory
  * reference that applies merges with the textbook leftmost-greedy
  * ARRAY fold. The string law is the subtle part (shared-delimiter
  * consecutive matches, boundary guards) — this pins it equal to the
  * fold on inputs no one hand-picked.
  */
class BpePropertySpec extends SparkSpec {

  /** Reference: weighted overlapping pair counts + (max n, min pair)
    * argmax + leftmost-non-overlapping fold merge, on Scala arrays.
    */
  private def referenceBpe(vocab: Map[String, Long], rounds: Int)
      : (List[(Int, String, String, Long)], Map[String, List[String]]) = {
    var segs: Map[String, List[String]] = vocab.keys
      .filter(_.length > 1).map(t => t -> t.map(_.toString).toList).toMap
    val merges = scala.collection.mutable.ListBuffer
      .empty[(Int, String, String, Long)]
    var done = false
    for (r <- 1 to rounds if !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((t, syms) <- segs; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + vocab(t)
      if (counts.isEmpty) done = true
      else {
        val ((a, b), n) = counts.toSeq
          .sortBy { case ((x, y), c) => (-c, x, y) }.head
        merges += ((r, a, b, n))
        segs = segs.map { case (t, syms) =>
          val out = scala.collection.mutable.ListBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
              out += a + b; i += 2
            } else { out += syms(i); i += 1 }
          }
          t -> out.toList
        }
      }
    }
    (merges.toList, segs)
  }

  test("random vocabularies: string-replace law == leftmost-greedy array fold") {
    import spark.implicits._
    val rnd = new Random(42)
    for (trial <- 1 to 5) {
      // small alphabet forces repeated chars (the overlap-heavy regime)
      val alpha = "abc"
      val vocab: Map[String, Long] = (1 to 12).map { _ =>
        val len = 2 + rnd.nextInt(6)
        val tok = (1 to len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
        tok -> (1L + rnd.nextInt(5))
      }.toMap // map dedups tokens; weights arbitrary per trial
      val rounds = 1 + rnd.nextInt(6)

      val (refMerges, refSegs) = referenceBpe(vocab, rounds)
      val vdf = vocab.toSeq.toDF("token", "freq")
      val (mergesDf, segDf) = TextQueries.bpeTrainFull(vdf, rounds)
      val gotMerges = mergesDf.collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
        .toList
      assert(gotMerges == refMerges,
        s"trial $trial (vocab $vocab, rounds $rounds): merges $gotMerges != $refMerges")
      val gotSegs = segDf.collect()
        .map(r => r.getString(0) ->
          r.getString(1).trim.split("  ").toList).toMap
      assert(gotSegs == refSegs,
        s"trial $trial: segmentations $gotSegs != $refSegs")
    }
  }
}
