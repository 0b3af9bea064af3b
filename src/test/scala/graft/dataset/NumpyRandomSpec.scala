package graft.dataset

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NumpyRandomSpec extends SparkSpec {

  /** Ground truth generated once with numpy (driver-side tooling):
    * `list(np.random.RandomState(seed).permutation(n))` — the exact
    * stream the reference consumes at dataset_splitter.py:139.
    */
  private val Fixtures: Seq[(Long, Int, Seq[Int])] = Seq(
    (0L, 10, Seq(2, 8, 4, 9, 1, 6, 7, 3, 0, 5)),
    (42L, 10, Seq(8, 1, 5, 0, 7, 2, 9, 4, 3, 6)),
    (1L, 16, Seq(3, 13, 7, 2, 6, 10, 4, 1, 14, 0, 15, 9, 8, 12, 11, 5)),
    (26L, 25, Seq(12, 14, 11, 8, 15, 10, 17, 20, 22, 9, 5, 3, 7, 24, 18,
      2, 4, 0, 13, 19, 23, 1, 16, 6, 21)),
    (12345L, 7, Seq(6, 3, 4, 0, 1, 5, 2)))

  test("MT19937 permutation is byte-identical to numpy RandomState") {
    Fixtures.foreach { case (seed, n, expected) =>
      val got = new NumpyRandom(seed).permutation(n).toSeq
      assert(got == expected, s"seed=$seed n=$n: $got")
    }
  }

  test("permutation properties: bijective, seed-stable, edge sizes") {
    val p = new NumpyRandom(7L).permutation(1000)
    assert(p.sorted.toSeq == (0 until 1000), "a permutation")
    assert(new NumpyRandom(7L).permutation(1000).toSeq == p.toSeq, "seed-stable")
    assert(new NumpyRandom(7L).permutation(0).isEmpty)
    assert(new NumpyRandom(7L).permutation(1).toSeq == Seq(0))
  }

  test("nestedSplit numpy-parity mode: membership equals the reference's prefixes") {
    import spark.implicits._
    // 25 batches carrying their array position, as the reference holds them
    val df = (0 until 25).map(i => (i, s"img_$i")).toDF("batch_idx", "name")
    val splits = Splitter.nestedSplit(df, splitCounts = Seq(5L, 10L),
      seed = 26L, numpyBatchIdxCol = Some("batch_idx"))
    val perm = Fixtures.find { case (s, n, _) => s == 26L && n == 25 }.get._3
    def members(key: String): Set[Int] =
      splits(key).select("batch_idx").collect().map(_.getInt(0)).toSet
    assert(members("5") == perm.take(5).toSet,
      s"split 5 must be RandomState(26).permutation(25)[:5]")
    assert(members("10") == perm.take(10).toSet)
    assert(members("5").subsetOf(members("10")), "nested prefix invariant")
  }
}
