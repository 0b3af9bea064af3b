package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Differential gate for [[Dedup.containmentPairs]]: the bounded
  * posting-list candidate expansion must produce EXACTLY the pairs a
  * plain-Scala reference computation finds — per-doc distinct shingle
  * hashes, df-capped rare sets, pairs sharing >= 1 rare shingle,
  * containment = |A∩B| / min(|A|,|B|) over the df-filtered sets —
  * on randomized corpora (planted containment structure + noise).
  */
class ContainmentDiffSpec extends SparkSpec {

  private def corpus(seed: Int, nDocs: Int): Seq[(Long, String)] = {
    val rng = new scala.util.Random(seed)
    val vocab = (0 until 40).map(i => s"w$i")
    var prev: Seq[String] = Seq.empty
    (0L until nDocs).map { id =>
      val base = Seq.fill(5 + rng.nextInt(20))(vocab(rng.nextInt(vocab.length)))
      // every 7th doc literally embeds its predecessor (quotation /
      // excerpt duplication — the asymmetric case containment targets)
      val tokens = if (id % 7 == 3 && prev.nonEmpty) base ++ prev else base
      prev = base
      (id, tokens.mkString(" "))
    }
  }

  test("containmentPairs == reference computation on random corpora") {
    import SparkSpec.session.implicits._
    for (seed <- Seq(11, 23, 47)) {
      val docs = corpus(seed, 60)
      val df = docs.toDF("doc_id", "text")

      // reference: shingle sets via the SAME hash column (the operator's
      // semantics are defined over these), then plain Scala from there
      val shs = df
        .select(col("doc_id"),
          Dedup.shingleHashCol(org.apache.spark.sql.functions.split(col("text"), " "), 3).as("sh"))
        .as[(Long, Seq[Long])].collect()
        .map { case (id, s) => id -> s.toSet }.toMap
      val tau = 0.9
      val maxDf = 5
      val dfCount = shs.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
      val rareSets = shs.view.mapValues(_.filter(h => dfCount(h) <= maxDf)).toMap
      val expected = (for {
        a <- shs.keys; b <- shs.keys if a < b
        sa = rareSets(a); sb = rareSets(b)
        inter = (sa intersect sb).size
        if inter > 0 && sa.nonEmpty && sb.nonEmpty
        if inter.toDouble / math.min(sa.size, sb.size) >= tau
      } yield (a, b)).toSet

      val got = Dedup.containmentPairs(df, "doc_id", "text", tau, maxDf, 3)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got == expected,
        s"seed $seed: got ${got.size} pairs, expected ${expected.size}; " +
          s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
      assert(expected.nonEmpty, s"seed $seed: degenerate fixture (no planted pairs)")
    }
  }
}
