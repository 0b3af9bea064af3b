package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection at corpus scale: MinHash + LSH banding and
  * SimHash. These are the production paths whose verification stage is
  * the oracle-checked exact-jaccard join (graft.queries.DedupQueries).
  *
  * Scale design (the standard MinHash-LSH shape, per Broder '97 /
  * MMDS ch.3, public algorithms):
  *   - signatures are computed per row in one pass (k universal hash
  *     functions over shingle hashes — a narrow typed map, no shuffle);
  *   - banding explodes each signature into `bands` rows of r values
  *     and self-joins on (band, bandHash): only same-bucket pairs meet,
  *     so the join is equi-key and AQE-skew-handled, never a cross
  *     product;
  *   - candidate pairs then get exact verification downstream.
  */
object Dedup {

  private val Prime = MinhashSignature.Prime

  /** Deterministic per-index universal hash params (seeded). */
  private def hashParams(k: Int, seed: Long): Array[(Long, Long)] = {
    val rng = new scala.util.Random(seed)
    Array.fill(k)((1 + rng.nextLong(Prime - 1), rng.nextLong(Prime)))
  }

  /** Codegen'd distinct w-shingle xxhash64 column over a token-array
    * column — the generic-width form of graft.queries.Q.shingleHashes3
    * (same zip-of-shifted-slices shape, so the token split is never
    * re-inlined per shingle element; see Q's scaladoc for the measured
    * pathology).
    */
  def shingleHashCol(tk: Column, width: Int): Column =
    array_distinct(shingleHashSeqCol(tk, width))

  /** POSITIONAL (non-distinct) w-shingle xxhash64 column: element i is
    * the hash of tokens [i, i+w). Kept separate from [[shingleHashCol]]
    * because set-style consumers (Jaccard, LSH) want distinct shingles
    * while positional consumers (chunk-level dedup, span alignment)
    * need index i to keep meaning token offset i — `array_distinct`
    * would silently shift positions.
    */
  def shingleHashSeqCol(tk: Column, width: Int): Column = {
    require(width >= 1, s"bad shingle width $width")
    val n = size(tk)
    val cnt = n - (width - 1)
    val shingle =
      if (width == 1) transform(tk, t => xxhash64(t))
      else {
        val zipped = arrays_zip((0 until width).map(i => slice(tk, lit(i + 1), cnt)): _*)
        transform(zipped, s =>
          xxhash64(concat_ws(" ", (0 until width).map(i => s.getField(i.toString)): _*)))
      }
    // explicitly containsNull=false cast target: the DDL string
    // "array<bigint>" (and even lit(Array.empty[Long])) defaults to
    // containsNull=true and would infect the whole `when` — downstream
    // the native sorted-intersect kernel (which reads getLong per
    // element) rejects nullable-element arrays at analysis time
    when(n >= width, shingle)
      .otherwise(array().cast(
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, containsNull = false)))
  }

  /** Containment near-dup pairs — the ASYMMETRIC dedup primitive:
    * containment = |A∩B| / min(|A|,|B|) over w-shingle sets catches a
    * short document embedded in a long one (quotation, excerpt,
    * boilerplate wrapping), which symmetric Jaccard structurally
    * misses — length imbalance caps J at |A|/|B| no matter how
    * perfect the overlap. Containment implies no length bound, so
    * candidates come from a rare-shingle inverted index (document
    * frequency <= maxDf) instead of length buckets: semantics are
    * DEFINED over the df-filtered shingle sets, making the blocking
    * lossless by construction, bounding per-shingle join fan-out by
    * the cap, and cutting boilerplate shingles — the ones whose
    * posting lists explode — before they reach the join. Verification
    * is the native sorted-merge intersect kernel. Output:
    * (id_a, id_b, inter, n_a, n_b, containment) with id_a < id_b.
    *
    * BLIND SPOT — mass duplication: the df cap applies to
    * VERIFICATION too ("lossless" means lossless over the df-filtered
    * sets, not the raw ones), so a document duplicated more than
    * maxDf times has EVERY shared shingle exceed the cap and the
    * whole cluster yields zero pairs — the heaviest duplicates are
    * exactly the invisible ones here. The df cap bounds the
    * detectable cluster size by construction. Pair this operator with
    * the exact-hash path (which catches identical mass duplicates at
    * any multiplicity) and the MinHash/LSH path (near-dup clusters of
    * any size) rather than raising maxDf.
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       tau: Double = 0.9, maxDf: Int = 10,
                       shingleWidth: Int = 3): DataFrame = {
    require(tau > 0 && tau <= 1, s"bad containment threshold $tau")
    require(maxDf >= 1, s"bad df cap $maxDf")
    val ex = df
      .select(col(idCol).as("__id"),
        explode(shingleHashCol(split(col(textCol), " "), shingleWidth)).as("sh"))
    // per-doc shingle sets are distinct, so count(*) is the df
    val rare = ex.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("sh")
    val rareEx = ex.join(rare, "sh")
    val fsets = rareEx.groupBy("__id")
      .agg(array_sort(collect_list(col("sh"))).as("shs"))
    // candidate pairs by per-shingle posting-list expansion, NOT a
    // rareEx-on-rareEx self-join: the rare filter bounds every posting
    // list at maxDf, so collect_list is O(maxDf) per key and the
    // in-plan expansion fan-out is <= maxDf*(maxDf-1)/2 per shingle —
    // one bounded groupBy instead of re-shuffling the whole exploded
    // relation a second time (sf1: ~21 s -> ~15 s)
    val cand = rareEx.groupBy("sh")
      .agg(array_sort(collect_list(col("__id"))).as("ids"))
      .select(explode(flatten(transform(col("ids"), (a, i) =>
        transform(slice(col("ids"), i + lit(2), size(col("ids"))), b =>
          struct(a.as("id_a"), b.as("id_b")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
    import SortedLongIntersectCount.sortedIntersectCount
    cand
      .join(fsets.select(col("__id").as("id_a"), col("shs").as("sh_a")), "id_a")
      .join(fsets.select(col("__id").as("id_b"), col("shs").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        sortedIntersectCount(col("sh_a"), col("sh_b")).as("inter"),
        size(col("sh_a")).as("n_a"), size(col("sh_b")).as("n_b"))
      .withColumn("containment",
        col("inter").cast("double") / least(col("n_a"), col("n_b")))
      .filter(col("containment") >= tau)
  }

  /** MinHash signature of one token sequence (w-shingles). Driver-side
    * twin of the in-plan path (`shingleHashCol` -> the native
    * `minhash_sig` expression): shingle strings are hashed with the
    * same xxhash64 (seed 42, Spark's built-in) and folded through the
    * same universal hash family, so signatures agree bit-for-bit with
    * `withMinhash` (spec-asserted).
    */
  def minhashSignature(tokens: Seq[String], numHashes: Int, shingleWidth: Int,
                       seed: Long = 7L): Array[Long] = {
    val params = hashParams(numHashes, seed)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    if (tokens.length >= shingleWidth) {
      var i = 0
      while (i <= tokens.length - shingleWidth) {
        val shingle = tokens.slice(i, i + shingleWidth).mkString(" ")
        val u = org.apache.spark.unsafe.types.UTF8String.fromString(shingle)
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
        val x = java.lang.Math.floorMod(h, Prime)
        var f = 0
        while (f < numHashes) {
          val (a, b) = params(f)
          val v = java.lang.Math.floorMod(a * x + b, Prime)
          if (v < sig(f)) sig(f) = v
          f += 1
        }
        i += 1
      }
    }
    sig
  }

  /** Jaccard estimate from two signatures. */
  def estimateJaccard(a: Array[Long], b: Array[Long]): Double = {
    var eq = 0
    var i = 0
    while (i < a.length) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / a.length
  }

  /** Add a `minhash` signature column to (idCol, textCol) rows —
    * entirely in-plan: codegen'd shingle hashing ([[shingleHashCol]])
    * into the native `minhash_sig` expression. No UDF, no per-row
    * encoder round trip; the text is split once per row.
    */
  def withMinhash(df: DataFrame, textCol: String, numHashes: Int = 128,
                  shingleWidth: Int = 3, seed: Long = 7L): DataFrame =
    df.withColumn("minhash", MinhashSignature.minhashSig(
      shingleHashCol(split(col(textCol), " "), shingleWidth), numHashes, seed))

  /** LSH candidate pairs: explode into bands, equi-join on band bucket,
    * estimate jaccard from full signatures, threshold.
    *
    * The banding join carries IDS ONLY: banded rows are
    * (id, band, bucket) — 24 bytes — never the 128-long signature
    * (1 KB per banded row; at 10x corpus that payload was the
    * pipeline's dominant shuffle). A pair colliding in several bands
    * dedups with an id-only `distinct`, then the two signature
    * payloads join back by id — each signature shuffles once per DOC,
    * not once per banded row or matching band. The signature
    * projection persists for its three readers (both banding sides +
    * the payload joins) and unpersists before returning (the returned
    * plan reads only checkpoint-free lineage, so downstream execution
    * recomputes nothing).
    *
    * Bucket = codegen'd xxhash64 of the band's signature slice; a pure
    * 64-bit bucket collision can admit a candidate the old
    * slice-equality filter rejected, but it must still pass the
    * signature-estimate threshold, so the output is collision-robust.
    */
  def lshCandidatePairs(df: DataFrame, idCol: String,
                        bands: Int = 16, minEstimate: Double = 0.5): DataFrame = {
    val numHashes = 128
    val r = numHashes / bands
    val sigs = df.select(col(idCol), col("minhash")).persist()
    val banded = sigs
      .withColumn("band", explode(sequence(lit(0), lit(bands - 1))))
      .withColumn("bucket",
        xxhash64(slice(col("minhash"), col("band") * r + 1, lit(r))))
      .select(col(idCol), col("band"), col("bucket"))
    val cand = banded.select(col(idCol).as("id_a"), col("band"), col("bucket"))
      .join(banded.select(col(idCol).as("id_b"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    val out = cand
      .join(sigs.select(col(idCol).as("id_a"), col("minhash").as("mh_a")), "id_a")
      .join(sigs.select(col(idCol).as("id_b"), col("minhash").as("mh_b")), "id_b")
      // native codegen'd expression — no per-pair ArrayData->Seq UDF cost
      .withColumn("est_jaccard", MinhashEstimate.minhashEst(col("mh_a"), col("mh_b")))
      .filter(col("est_jaccard") >= minEstimate)
      .select("id_a", "id_b", "est_jaccard")
      .localCheckpoint()
    sigs.unpersist()
    out
  }

  /** Skew-hardened LSH candidate pairs — same results as
    * [[lshCandidatePairs]], salted band-bucket join.
    *
    * The adversarial corpus for LSH is a degenerate one: many identical
    * (or boilerplate-heavy) documents collapse into ONE (band, bucket)
    * key, and the unsalted equi-join funnels every copy into a single
    * shuffle partition — one straggler task doing all the pair work.
    * Salting splits each hot key `saltBuckets` ways: the LEFT side
    * hashes its id into a salt, the RIGHT side replicates one row per
    * salt value, and the join key becomes (band, bucket, salt). Every
    * (a, b) pair still meets EXACTLY once per matching band — in the
    * partition owned by a's salt — so the id-only distinct and the
    * estimate threshold behave as in the unsalted form; the N^2 pair work of a
    * hot bucket now spreads across `saltBuckets` tasks, and the left
    * side's max per-key row count drops by that factor. Cost: the
    * right side's rows replicate saltBuckets times (bounded, chosen at
    * plan time) — the standard skew-join trade, worth it only when a
    * degenerate key is possible; AQE's skew-join handles the milder
    * cases without replication.
    */
  def lshCandidatePairsSalted(df: DataFrame, idCol: String,
                              bands: Int = 16, minEstimate: Double = 0.5,
                              saltBuckets: Int = 8): DataFrame = {
    require(saltBuckets >= 1, s"bad saltBuckets $saltBuckets")
    val numHashes = 128
    val r = numHashes / bands
    val sigs = df.select(col(idCol), col("minhash")).persist()
    val banded = sigs
      .withColumn("band", explode(sequence(lit(0), lit(bands - 1))))
      .withColumn("bucket",
        xxhash64(slice(col("minhash"), col("band") * r + 1, lit(r))))
      .select(col(idCol), col("band"), col("bucket"))
    val a = banded.select(col(idCol).as("id_a"), col("band"), col("bucket"))
      .withColumn("salt", pmod(xxhash64(col("id_a")), lit(saltBuckets)).cast("int"))
    val b = banded.select(col(idCol).as("id_b"), col("band"), col("bucket"))
      .withColumn("salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    val cand = a.join(b, Seq("band", "bucket", "salt"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    val out = cand
      .join(sigs.select(col(idCol).as("id_a"), col("minhash").as("mh_a")), "id_a")
      .join(sigs.select(col(idCol).as("id_b"), col("minhash").as("mh_b")), "id_b")
      .withColumn("est_jaccard", MinhashEstimate.minhashEst(col("mh_a"), col("mh_b")))
      .filter(col("est_jaccard") >= minEstimate)
      .select("id_a", "id_b", "est_jaccard")
      .localCheckpoint()
    sigs.unpersist()
    out
  }

  /** 64-bit SimHash of a token sequence (Charikar '02, public
    * algorithm): per-token xxhash64, bitwise majority vote.
    * Driver-side twin of the native `simhash64` expression — same
    * token hash (Spark's XXH64, seed 42), so values agree bit-for-bit
    * with [[withSimhash]] (spec-asserted).
    */
  def simhash(tokens: Seq[String]): Long = {
    val votes = new Array[Int](64)
    tokens.foreach { t =>
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(t)
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
    }
    var out = 0L
    var bit = 0
    while (bit < 64) { if (votes(bit) > 0) out |= (1L << bit); bit += 1 }
    out
  }

  /** Add a `simhash` column — entirely in-plan via the native
    * `simhash64` expression over the codegen'd token split; no UDF.
    */
  def withSimhash(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("simhash",
      SimhashExpr.simhash64(split(col(textCol), " ")))

  /** SimHash near-dup pairs: block on the 4 x 16-bit chunks (any pair
    * within hamming distance <= 3-per-chunk must share a chunk at
    * hamming 0 when distance <= 3 overall by pigeonhole with 4 chunks),
    * then exact hamming filter.
    */
  def simhashPairs(df: DataFrame, idCol: String, maxHamming: Int = 3): DataFrame = {
    // all bit manipulation stays in built-in (codegen'd) expressions:
    // shiftrightunsigned/&/^/bit_count — no UDF anywhere in this path
    def chunkOf(c: Column, i: Int): Column =
      shiftrightunsigned(c, 16 * i).bitwiseAND(lit(0xffffL))
    val chunked = df.select(col(idCol), col("simhash"))
      .withColumn("chunk_idx", explode(sequence(lit(0), lit(3))))
      .withColumn("chunk",
        expr("shiftrightunsigned(simhash, chunk_idx * 16) & 65535"))
    val a = chunked.select(col(idCol).as("id_a"), col("simhash").as("sh_a"),
      col("chunk_idx"), col("chunk"))
    val b = chunked.select(col(idCol).as("id_b"), col("simhash").as("sh_b"),
      col("chunk_idx"), col("chunk"))
    // emit each pair only from its first shared chunk: dedup as a
    // narrow filter instead of a distinct's extra shuffle
    val firstChunk = (0 until 4).foldRight(lit(-1): Column) { (i, rest) =>
      when(chunkOf(col("sh_a"), i) === chunkOf(col("sh_b"), i), i)
        .otherwise(rest)
    }
    a.join(b, Seq("chunk_idx", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .filter(col("chunk_idx") === firstChunk)
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
