package graft.queries

import graft.SparkSpec
import scala.util.Random

/** Property check for the LPA community operator: on seeded random
  * graphs, the distributed supersteps (broadcast label join + fused
  * single-exchange vote/argmax) must produce the same community-size
  * census as a plain in-memory reference of the synchronous
  * max-count/min-label rule. Also pins the broadcast-vs-shuffle_hash
  * routing equivalence by forcing the cap to 0.
  */
class LpaPropertySpec extends SparkSpec {

  private def referenceLpa(pairs: Seq[(Long, Long)], rounds: Int)
      : Map[Long, Long] = {
    val adj = scala.collection.mutable.Map.empty[Long, List[Long]]
    for ((u, v) <- pairs) {
      adj(u) = v :: adj.getOrElse(u, Nil)
      adj(v) = u :: adj.getOrElse(v, Nil)
    }
    var lab: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      lab = adj.map { case (n, nbrs) =>
        val votes = nbrs.groupBy(lab).map { case (l, xs) => l -> xs.length }
        // max count, tie -> smallest label
        n -> votes.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      }.toMap
    }
    lab.values.groupBy(identity).map { case (_, xs) => xs.size }
      .groupBy(identity).map { case (sz, cs) => sz.toLong -> cs.size.toLong }
  }

  test("random graphs: distributed census == in-memory reference, both routings") {
    import spark.implicits._
    val rnd = new Random(7)
    for (trial <- 1 to 4) {
      val n = 20 + rnd.nextInt(30)
      val pairs = (for {
        u <- 0L until n.toLong; v <- (u + 1) until n.toLong
        if rnd.nextDouble() < 0.12
      } yield (u, v)).toSeq
      if (pairs.nonEmpty) {
        val rounds = 1 + rnd.nextInt(4)
        val want = referenceLpa(pairs, rounds)
        val pdf = pairs.toDF("u", "v")
        val gotB = GraphQueries.lpaCensus(pdf, rounds)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(gotB == want,
          s"trial $trial (n=$n, rounds=$rounds, broadcast): $gotB != $want")
        // cap 0 forces the shuffle_hash route — same census required
        val gotS = GraphQueries.lpaCensus(pdf, rounds, broadcastNodeCap = 0L)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(gotS == want,
          s"trial $trial (shuffle_hash route): $gotS != $want")
      }
    }
  }
}
