package graft

import graft.functions.{Dedup, Strings}
import graft.ops.{CropOps, SliceOps}
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based coverage (SURVEY §5 pattern 7): analytic invariants
  * of the geometry planners and hash sketches over generated inputs.
  * Driven directly off ScalaCheck Gens (fixed seed stream, 200 cases
  * per property) inside ScalaTest.
  */
class PropertySpec extends AnyFunSuite {

  private def samples[T](g: Gen[T], n: Int = 200): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("crop indices: full coverage, in-bounds starts, padded final end") {
    val gen = for {
      imgLen <- Gen.choose(10, 2000)
      cropSize <- Gen.choose(2, math.min(500, imgLen))
      overlap <- Gen.choose(0.0, 0.9)
    } yield (imgLen, cropSize, overlap)
    samples(gen).foreach { case (imgLen, cropSize, overlap) =>
      val (starts, ends, pad) = CropOps.computeCropIndices(imgLen, cropSize, overlap)
      assert(starts.head == 0)
      assert(starts.forall(_ < imgLen))
      assert(ends.zip(starts).forall { case (e, s) => e - s == cropSize })
      assert(ends.last == imgLen + pad && pad >= 0 && pad < cropSize)
      // consecutive crops leave no gap
      assert(starts.drop(1).zip(ends.dropRight(1)).forall { case (s, prevEnd) => s <= prevEnd })
    }
  }

  test("slice indices: reference formula invariants") {
    val gen = for {
      stackLen <- Gen.choose(2, 500)
      sliceLen <- Gen.choose(1, math.min(100, stackLen))
      overlap <- Gen.choose(0, math.max(0, sliceLen - 1))
    } yield (stackLen, sliceLen, overlap)
    samples(gen).foreach { case (stackLen, sliceLen, overlap) =>
      val (starts, ends) = SliceOps.computeSliceIndices(stackLen, sliceLen, overlap)
      assert(starts.head == 0 && ends.last == stackLen)
      assert(starts.zip(ends).forall { case (s, e) => e > s })
      (0 until stackLen).foreach { st =>
        assert(starts.zip(ends).exists { case (s, e) => st >= s && st < e },
          s"stack $st uncovered for ($stackLen, $sliceLen, $overlap)")
      }
    }
  }

  test("natural sort is total and numerically consistent") {
    val token = Gen.oneOf(Gen.alphaStr.map(_.take(4)), Gen.choose(0, 99999).map(_.toString))
    val name = Gen.listOfN(3, token).map(_.mkString)
    samples(Gen.listOf(name), 100).foreach { names =>
      val sorted = Strings.sortedNicely(names)
      assert(sorted.sortBy(Strings.naturalKey) == sorted, "idempotent total order")
      assert(sorted.toSet == names.toSet, "permutation only")
    }
    assert(Strings.sortedNicely(Seq("f10", "f2")) == Seq("f2", "f10"))
  }

  test("minhash: identical docs estimate 1.0; signatures deterministic") {
    val words = Gen.listOfN(30, Gen.oneOf("alpha", "beta", "gamma", "delta",
      "epsilon", "zeta", "eta", "theta"))
    samples(words, 50).foreach { ws =>
      val sig = Dedup.minhashSignature(ws, 64, 3)
      assert(Dedup.estimateJaccard(sig, Dedup.minhashSignature(ws, 64, 3)) == 1.0)
    }
  }

  test("simhash: deterministic and order-insensitive (bag semantics)") {
    samples(Gen.nonEmptyListOf(Gen.alphaStr.suchThat(_.nonEmpty)), 100).foreach { ws =>
      val a = Dedup.simhash(ws)
      assert(Dedup.simhash(ws) == a)
      assert(Dedup.simhash(ws.reverse) == a)
    }
  }

  test("rolling hash: O(n) recurrence equals the naive polynomial on random input") {
    def naive(s: String, k: Int, b: Long, m: Long): Seq[Long] =
      if (s.length < k) Seq.empty
      else (0 to s.length - k).map { i =>
        s.substring(i, i + k).foldLeft(0L)((h, c) => (h * b + c) % m)
      }
    val gen = for {
      s <- Gen.asciiPrintableStr
      k <- Gen.choose(1, 8)
    } yield (s, k)
    // evaluate the expression directly (interpreted path); the codegen
    // path is covered by RollingHashSpec through a real query
    samples(gen, 150).foreach { case (s, k) =>
      val e = graft.functions.RollingHash(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(s),
          org.apache.spark.sql.types.StringType), k, 31L, 1000000007L)
      val got = e.eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq
      assert(got == naive(s, k, 31L, 1000000007L), s"mismatch for '$s' k=$k")
    }
  }

  test("CEP DFA == java.util.regex on arbitrary journeys, at every batch split") {
    import graft.streaming.StreamOps
    def regexCounts(j: String): (Long, Long, Long, Boolean) = {
      def count(p: String): Long = {
        val m = java.util.regex.Pattern.compile(p).matcher(j)
        var n = 0L; while (m.find()) n += 1; n
      }
      (j.length.toLong, count("vc*p"), count("ee+"), count("s[^p]*p") > 0)
    }
    val gen = Gen.listOf(Gen.oneOf('c', 'e', 'p', 's', 'v')).map(_.mkString)
    samples(gen, 300).foreach { j =>
      val folded = j.foldLeft(StreamOps.cepInit)(StreamOps.cepStep)
      assert(StreamOps.cepEmit(folded) == regexCounts(j), s"journey '$j'")
      // batch-boundary invariance: folding the two halves through the
      // carried state gives the same emission for EVERY split point
      (0 to j.length).foreach { cut =>
        val mid = j.take(cut).foldLeft(StreamOps.cepInit)(StreamOps.cepStep)
        val full = j.drop(cut).foldLeft(mid)(StreamOps.cepStep)
        assert(StreamOps.cepEmit(full) == regexCounts(j),
          s"journey '$j' split at $cut")
      }
    }
  }

  test("minhash estimate: symmetric, bounded, exact on hand-built signatures") {
    val gen = Gen.listOfN(32, Gen.choose(0L, 50L))
    samples(gen.flatMap(a => gen.map(b => (a, b))), 100).foreach { case (a, b) =>
      val ab = Dedup.estimateJaccard(a.toArray, b.toArray)
      val ba = Dedup.estimateJaccard(b.toArray, a.toArray)
      assert(ab == ba && ab >= 0.0 && ab <= 1.0)
      val expected = a.zip(b).count { case (x, y) => x == y }.toDouble / 32
      assert(ab == expected)
    }
  }
}
