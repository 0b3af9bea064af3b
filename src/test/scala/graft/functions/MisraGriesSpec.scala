package graft.functions

import scala.collection.mutable
import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The Misra–Gries mergeable-summary guarantees
  * (true − N/(k+1) ≤ est ≤ true; presence above the threshold),
  * property-tested across random streams, random partitionings and
  * random merge orders — these bounds are exactly what the
  * q_txt_topk_mg verdict columns gate on, so this spec is the proof
  * obligation behind that oracle.
  */
class MisraGriesSpec extends SparkSpec {

  private def runDirect(streams: Seq[Seq[String]], k: Int): Map[String, Long] = {
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow}
    import org.apache.spark.sql.types.StringType
    val agg = MisraGriesTopK(BoundReference(0, StringType, nullable = true), k)
    val row = new GenericInternalRow(1)
    val parts = streams.map { s =>
      var buf = agg.createAggregationBuffer()
      s.foreach { tok =>
        row.update(0, UTF8String.fromString(tok))
        buf = agg.update(buf, row)
      }
      buf
    }
    // merge in a random order THROUGH the serialization path a real
    // exchange uses
    val rnd = new Random(17)
    val merged = rnd.shuffle(parts).reduce { (a, b) =>
      agg.merge(agg.deserialize(agg.serialize(a)), agg.deserialize(agg.serialize(b)))
    }
    merged.map { case (t, c) => t.toString -> c }.toMap
  }

  test("bounds hold for every stream, partitioning and merge order") {
    val rnd = new Random(42)
    for (trial <- 1 to 30) {
      val vocab = (1 to rnd.nextInt(50) + 5).map(i => s"t$i")
      // Zipf-ish skew so some tokens clear the guarantee threshold
      val stream = Seq.fill(rnd.nextInt(2000) + 100) {
        vocab(math.min(vocab.size - 1, (math.abs(rnd.nextGaussian()) * vocab.size / 3).toInt))
      }
      val k = rnd.nextInt(20) + 2
      val nParts = rnd.nextInt(7) + 1
      val parts = stream.grouped(math.max(1, stream.size / nParts)).toSeq
      val est = runDirect(parts, k)
      val exact = stream.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      val n = stream.size.toLong
      // summary never exceeds k counters
      assert(est.size <= k, s"trial $trial: ${est.size} counters > k=$k")
      est.foreach { case (t, e) =>
        val tr = exact.getOrElse(t, 0L)
        assert(e <= tr, s"trial $trial: overestimate $t: $e > $tr")
        assert(tr - e <= n / (k + 1), s"trial $trial: deficit of $t exceeds N/(k+1)")
      }
      // presence guarantee
      exact.foreach { case (t, tr) =>
        if (tr > n / (k + 1))
          assert(est.contains(t), s"trial $trial: guaranteed token $t missing (n=$n k=$k tr=$tr)")
      }
    }
  }

  test("the DataFrame aggregate honors the bounds at every partition count") {
    import graft.functions.MisraGriesTopK.mgTopK
    val dir = "/root/testdata/sf0.001"
    val words = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("token"))
    val exact = words.groupBy("token").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val k = 50
    for (parts <- Seq(1, 7, 32)) {
      val rows = words.repartition(parts)
        .agg(mgTopK(col("token"), k).as("s"))
        .selectExpr("inline(s)").collect()
      assert(rows.length <= k)
      val est = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
      est.foreach { case (t, e) =>
        val tr = exact.getOrElse(t, 0L)
        assert(e <= tr && tr - e <= n / (k + 1), s"parts=$parts token=$t est=$e true=$tr")
      }
      exact.foreach { case (t, tr) =>
        if (tr > n / (k + 1)) assert(est.contains(t), s"parts=$parts missing $t")
      }
      // eval order is deterministic: (count desc, token) with no dup tokens
      val pairs = rows.map(r => (r.getLong(1), r.getString(0)))
      assert(pairs.sliding(2).forall {
        case Array((c1, t1), (c2, t2)) => c1 > c2 || (c1 == c2 && t1 < t2)
        case _ => true
      }, s"parts=$parts: eval output not in (count desc, token) order")
      assert(rows.map(_.getString(0)).distinct.length == rows.length)
    }
  }

  test("SQL surface: mg_topk is callable through spark.sql") {
    graft.ql.Ql.registerTables(spark, "/root/testdata/sf0.001")
    val out = spark.sql(
      """SELECT inline(mg_topk(token, 10)) FROM (
        |  SELECT explode(split(text, ' ')) AS token FROM documents)""".stripMargin)
      .collect()
    assert(out.nonEmpty && out.length <= 10)
  }
}
