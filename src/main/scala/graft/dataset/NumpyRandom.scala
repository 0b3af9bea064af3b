package graft.dataset

/** Bit-exact reimplementation of the PUBLISHED MT19937 generator
  * (Matsumoto & Nishimura 1998, the standard public reference
  * implementation) plus the legacy numpy `RandomState` uniform-integer
  * and permutation contracts (masked rejection sampling + descending
  * Fisher-Yates), written from the public algorithm descriptions.
  *
  * This gives BYTE-PARITY with the reference's seeded permutation
  * (`np.random.RandomState(seed).permutation(n)`,
  * dataset_splitter.py:139): the same seed yields the same split
  * membership, so datasets split by the reference and by this engine
  * are interchangeable. Verified against numpy-generated fixtures in
  * NumpyRandomSpec.
  *
  * Driver-side by design: the permutation is O(n) ints for n = the
  * reference's in-memory batch count. The distributed scale path for
  * corpus-sized splits remains [[Splitter.withShuffleIndex]].
  */
final class NumpyRandom(seed: Long) {

  private val N = 624
  private val mt = new Array[Int](N)
  private var mti = N

  // init_genrand: Knuth multiplicative seeding on the low 32 seed bits
  {
    mt(0) = (seed & 0xffffffffL).toInt
    var i = 1
    while (i < N) {
      mt(i) = 1812433253 * (mt(i - 1) ^ (mt(i - 1) >>> 30)) + i
      i += 1
    }
  }

  /** genrand_int32: next 32 uniform bits, as an unsigned value in a Long. */
  def nextUInt32(): Long = {
    if (mti >= N) {
      var kk = 0
      while (kk < N - 397) {
        val y = (mt(kk) & 0x80000000) | (mt(kk + 1) & 0x7fffffff)
        mt(kk) = mt(kk + 397) ^ (y >>> 1) ^ (if ((y & 1) != 0) 0x9908b0df else 0)
        kk += 1
      }
      while (kk < N - 1) {
        val y = (mt(kk) & 0x80000000) | (mt(kk + 1) & 0x7fffffff)
        mt(kk) = mt(kk + (397 - N)) ^ (y >>> 1) ^ (if ((y & 1) != 0) 0x9908b0df else 0)
        kk += 1
      }
      val y = (mt(N - 1) & 0x80000000) | (mt(0) & 0x7fffffff)
      mt(N - 1) = mt(396) ^ (y >>> 1) ^ (if ((y & 1) != 0) 0x9908b0df else 0)
      mti = 0
    }
    var y = mt(mti)
    mti += 1
    y ^= (y >>> 11)
    y ^= (y << 7) & 0x9d2c5680
    y ^= (y << 15) & 0xefc60000
    y ^= (y >>> 18)
    y & 0xffffffffL
  }

  /** rk_interval: uniform on [0, max] via smallest-covering bitmask +
    * rejection (max < 2^32).
    */
  def interval(max: Long): Long = {
    require(max >= 0 && max <= 0xffffffffL, s"interval max out of range: $max")
    if (max == 0) return 0L
    var mask = max
    mask |= mask >> 1
    mask |= mask >> 2
    mask |= mask >> 4
    mask |= mask >> 8
    mask |= mask >> 16
    var v = nextUInt32() & mask
    while (v > max) v = nextUInt32() & mask
    v
  }

  /** RandomState.permutation(n): arange(n) shuffled by descending
    * Fisher-Yates, one `interval(i)` draw per position.
    */
  def permutation(n: Int): Array[Int] = {
    val arr = Array.tabulate(n)(identity)
    var i = n - 1
    while (i > 0) {
      val j = interval(i).toInt
      val t = arr(i); arr(i) = arr(j); arr(j) = t
      i -= 1
    }
    arr
  }
}
