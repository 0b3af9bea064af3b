package graft.functions

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Count-Min sketch laws behind the q_evt_countmin hash gate:
  * (1) the counter matrix is an exact order-invariant sum — any
  * repartitioning commits the IDENTICAL array, which is why the oracle
  * (and the streaming twin) can replay raw estimate values; (2) the
  * point estimate never underestimates, and is exact whenever the key
  * collides with nothing in some row; (3) serialize/merge compose the
  * way a real exchange drives them.
  */
class CountMinSpec extends SparkSpec {

  private def estimate(sk: Seq[Long], d: Int, w: Int, key: Long): Long =
    (0 until d).map(j => sk(j * w + CountMin.bucket(key, j, w))).min

  test("sketch is bit-identical under any partitioning; estimates never underestimate") {
    import spark.implicits._
    val rnd = new Random(7)
    val keys = Seq.fill(5000)(rnd.nextInt(300).toLong)
    val exact = keys.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val (d, w) = (4, 64) // narrow width: forced collisions
    def sketch(nParts: Int): Seq[Long] =
      keys.toDF("k").repartition(nParts)
        .agg(CountMin.cmsSketch(col("k"), d, w)).head().getSeq[Long](0)
    val one = sketch(1)
    assert(one == sketch(8) && one == sketch(3), "matrix must be partition-invariant")
    assert(one.sum == keys.size.toLong * d, "each row distributes N across its buckets")
    exact.foreach { case (k, n) =>
      assert(estimate(one, d, w, k) >= n, s"CMS underestimated key $k")
    }
  }

  test("estimate is exact for collision-free keys and over a wide sketch") {
    import spark.implicits._
    val keys = (0L until 40L).flatMap(k => Seq.fill((k % 5 + 1).toInt)(k))
    val (d, w) = (4, 4096) // w >> keys: rows are effectively injective here
    val sk = keys.toDF("k").repartition(4)
      .agg(CountMin.cmsSketch(col("k"), d, w)).head().getSeq[Long](0)
    (0L until 40L).foreach { k =>
      assert(estimate(sk, d, w, k) == k % 5 + 1, s"wide sketch must be exact for $k")
    }
  }

  test("merge through the serialization path equals single-buffer update") {
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow}
    import org.apache.spark.sql.types.LongType
    val agg = CountMinSketchAgg(BoundReference(0, LongType, nullable = true), 3, 32)
    val row = new GenericInternalRow(1)
    val rnd = new Random(11)
    val stream = Seq.fill(2000)(rnd.nextInt(500).toLong)
    def fold(xs: Seq[Long]): Array[Long] = {
      var buf = agg.createAggregationBuffer()
      xs.foreach { x => row.update(0, Long.box(x)); buf = agg.update(buf, row) }
      buf
    }
    val whole = fold(stream)
    val merged = rnd.shuffle(stream.grouped(137).toSeq).map(fold)
      .reduce((a, b) => agg.merge(agg.deserialize(agg.serialize(a)),
        agg.deserialize(agg.serialize(b))))
    assert(whole.toSeq == merged.toSeq, "merge order must not change the matrix")
  }

  test("SQL surface and negative keys stay lawful") {
    import spark.implicits._
    val df = Seq(-5L, -5L, 3L, 3L, 3L).toDF("k")
    df.createOrReplaceTempView("cms_in")
    val sk = spark.sql("SELECT cms_sketch(k, 2, 16) AS sk FROM cms_in")
      .head().getSeq[Long](0)
    assert(estimate(sk, 2, 16, -5L) >= 2L && estimate(sk, 2, 16, 3L) >= 3L)
    assert(sk.forall(_ >= 0L), "floorMod keeps buckets in range for negative keys")
  }
}
