package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest-neighbor — the second scale
  * path next to random-hyperplane LSH ([[Similarity]]), the standard
  * coarse-quantizer design of the public FAISS/IVF literature:
  *
  *   - TRAIN a small k-means codebook over the corpus (spherical:
  *     assignment by max cosine). Training is distributed — assignment
  *     is a narrow map over broadcast centroids, the update step is a
  *     `posexplode + groupBy(cell, pos).avg` aggregation — and only
  *     the k x dim codebook (metadata-scale) ever reaches the driver.
  *   - STORE vectors partitioned by their cell id: at 100 TB each cell
  *     is a directory, and a query reads `nprobe` of `k` directories.
  *   - PROBE: the query's `nprobe` nearest cells are computed on the
  *     driver from the codebook, planned as a pushable `cell IN (...)`
  *     filter — partition pruning at the source, same construction as
  *     the LSH bucket store.
  *
  * With nprobe = k the result is exactly the brute-force top-k (every
  * cell probed), which is the spec's correctness anchor.
  */
object Ivf {

  /** Cosine-normalized copy of a vector (zero vectors pass through). */
  private def normalize(v: Array[Double]): Array[Double] = {
    var ss = 0.0
    var i = 0
    while (i < v.length) { ss += v(i) * v(i); i += 1 }
    val n = math.sqrt(ss)
    if (n == 0) v else v.map(_ / n)
  }

  /** Unwrap a decoded vector to a primitive array ONCE before any
    * k x dim hot loop. The Dataset/UDF decoder for `Seq[Float]` hands
    * back `immutable.List` (a linked list: `apply(i)` is O(i) and
    * `.length` O(n)), so indexing it inside the centroid loop turns an
    * O(k·d) scan into O(k·d²) pointer chasing — measured 92 s of the
    * 129 s q_sim_ann_ivf wall at sf1 before this copy was hoisted.
    */
  private def toArr(vec: Seq[Float]): Array[Float] = vec match {
    case w: scala.collection.immutable.ArraySeq.ofFloat => w.unsafeArray
    case _                                              => vec.toArray
  }

  private def bestCell(vec: Seq[Float], centroids: Array[Array[Double]]): Int =
    bestCellArr(toArr(vec), centroids)

  private def bestCellArr(v: Array[Float], centroids: Array[Array[Double]]): Int = {
    var best = 0
    var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val cen = centroids(c)
      val n = math.min(cen.length, v.length)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += cen(i) * v(i); i += 1 }
      if (dot > bestDot) { bestDot = dot; best = c }
      c += 1
    }
    best
  }

  /** The standard codebook-size rule: k ~ sqrt(n) cells (balancing
    * cells scanned per probe against cells skipped), clamped to
    * `maxK`. The clamp is the SCALE contract: the codebook broadcast
    * is at most maxK x dim doubles (4096 x 64 x 8 B = 2 MiB) no
    * matter how large the corpus grows — at 100 TB the index gets
    * coarser, never bigger than executor-broadcast scale.
    */
  def codebookSize(n: Long, maxK: Int = 4096): Int =
    math.min(maxK.toLong, math.max(1L, math.round(math.sqrt(n.toDouble)))).toInt

  /** Train a spherical k-means codebook with `iters` Lloyd rounds.
    * BIT-DETERMINISTIC under any partitioning: initial centroids are
    * the k corpus vectors with the smallest `xxhash64(id, seed)` (a
    * seeded uniform draw both engines can replay), and update sums are
    * quantized to micro-longs (exact, order-invariant addition), so the
    * same corpus trains the same codebook at any parallelism — the
    * property the pinned centroid fixture (tools.FixtureGen) and the
    * IVF DuckDB oracles rely on. Returns k x dim centroids,
    * cosine-normalized.
    *
    * Each Lloyd round is ONE narrow pass: every partition folds its
    * vectors into k local (count, sum) accumulators, and only those
    * nPartitions x k x dim partials reach the driver — no shuffle, no
    * row explosion.
    *
    * `sampleCap` > 0 bounds TRAINING cost independently of corpus
    * size (the FAISS practice of training the coarse quantizer on
    * ~256 x k vectors): one count + one scan materializes a
    * deterministic hash-mod sample of about that many vectors, cached
    * so the Lloyd rounds iterate over the sample instead of re-reading
    * the corpus. At 100 TB that converts k full scans into one full
    * scan plus k passes over a few-MB cached sample; cell ASSIGNMENT
    * of the full corpus remains a narrow broadcast map either way.
    */
  def trainCentroids(df: DataFrame, idCol: String, vecCol: String, k: Int,
                     iters: Int = 5, seed: Long = 29L,
                     sampleCap: Long = 0L): Array[Array[Double]] = {
    val base = df.select(col(idCol), col(vecCol))
    val nTotal = if (sampleCap > 0) base.count() else 0L
    val sampled = sampleCap > 0 && nTotal > sampleCap
    val train =
      if (sampled) {
        val mod = math.max(1L, nTotal / sampleCap)
        base.filter(pmod(xxhash64(col(idCol), lit(seed + 1)), lit(mod)) === 0)
          .cache()
      } else base
    val init = train
      .orderBy(xxhash64(col(idCol), lit(seed)), col(idCol))
      .limit(k)
      .collect()
      .map(r => normalize(r.getSeq[Float](1).map(_.toDouble).toArray))
    require(init.nonEmpty, "trainCentroids: empty corpus")
    // Standard k-means clamp: a corpus smaller than k trains
    // corpus-many cells instead of indexing past the init array.
    val kEff = init.length
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = train.select(col(vecCol)).as[Seq[Float]]
    var centroids = init
    var it = 0
    while (it < iters) {
      val bc = spark.sparkContext.broadcast(centroids)
      // Per-cell sums accumulate QUANTIZED components (micros as longs),
      // not doubles: long addition is exact and order-invariant, so the
      // trained codebook is bit-identical under ANY partitioning /
      // parallelism — which is what lets the DuckDB oracle replay IVF
      // probes from a pinned centroid fixture. The 5e-7 quantization of
      // a training MEAN is noise to a heuristic quantizer; sums stay
      // far from Long range (|v| ~ 1 => 1e6/row, ~1e12 per cell at the
      // 1M-vector sample cap).
      val partials = vecs.mapPartitions { rows =>
        val cents = bc.value
        val dim = cents(0).length
        val counts = new Array[Long](cents.length)
        val sums = Array.fill(cents.length)(new Array[Long](dim))
        rows.foreach { row =>
          val v = toArr(row)
          val c = bestCellArr(v, cents)
          counts(c) += 1
          val s = sums(c)
          val n = math.min(dim, v.length)
          var i = 0
          while (i < n) { s(i) += math.rint(v(i) * 1e6).toLong; i += 1 }
        }
        Iterator.single((counts, sums))
      }.collect()
      val counts = new Array[Long](kEff)
      val sums = Array.fill(kEff)(new Array[Long](centroids(0).length))
      partials.foreach { case (pc, ps) =>
        var c = 0
        while (c < kEff) {
          counts(c) += pc(c)
          var i = 0
          while (i < sums(c).length) { sums(c)(i) += ps(c)(i); i += 1 }
          c += 1
        }
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c) // empty cell keeps its centroid
        else normalize(sums(c).map(m => m.toDouble / counts(c) / 1e6))
      }.toArray
      it += 1
    }
    if (sampled) train.unpersist()
    centroids
  }

  /** Add the IVF `cell` assignment column. */
  def withCell(df: DataFrame, vecCol: String,
               centroids: Array[Array[Double]]): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(centroids)
    val cellOf = udf((v: Seq[Float]) => bestCell(v, bc.value))
    df.withColumn("cell", cellOf(col(vecCol)))
  }

  /** Write the corpus partitioned by IVF cell: the layout that lets a
    * probe read `nprobe` of `k` directories. The codebook persists
    * next to the cells as `_codebook.json` (underscore-prefixed so
    * parquet readers skip it, same convention as `_SUCCESS`; the
    * `log_data.json` sidecar pattern of `ops.Reconstruct`) — a later
    * session probes the store WITHOUT retraining.
    */
  def saveIvfStore(df: DataFrame, vecCol: String, path: String,
                   centroids: Array[Array[Double]]): Unit = {
    withCell(df, vecCol, centroids)
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = m.createObjectNode()
    val cents = root.putArray("centroids")
    centroids.foreach { c => val a = cents.addArray(); c.foreach(a.add) }
    val p = new org.apache.hadoop.fs.Path(path, "_codebook.json")
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(m.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))
    finally out.close()
  }

  /** Read a codebook persisted by [[saveIvfStore]]. */
  def loadCodebook(spark: SparkSession, path: String): Array[Array[Double]] = {
    import scala.jdk.CollectionConverters._
    val p = new org.apache.hadoop.fs.Path(path, "_codebook.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val root =
      try new com.fasterxml.jackson.databind.ObjectMapper().readTree(in.readAllBytes())
      finally in.close()
    root.get("centroids").elements().asScala
      .map(_.elements().asScala.map(_.asDouble).toArray).toArray
  }

  /** The query's `nprobe` nearest cells, computed on the driver from
    * the codebook — no Spark job, which is what makes the cell
    * restriction a pushable IN filter.
    */
  def probeCells(queryVec: Seq[Float], centroids: Array[Array[Double]],
                 nprobe: Int): Seq[Int] = {
    val q = normalize(queryVec.map(_.toDouble).toArray)
    centroids.indices
      .map(c => c -> centroids(c).zip(q).map { case (a, b) => a * b }.sum)
      .sortBy { case (c, dot) => (-dot, c) }
      .take(nprobe)
      .map(_._1)
  }

  /** IVF ANN top-k: prune to the `nprobe` nearest cells, exact cosine
    * inside them. Works on any DataFrame bearing a `cell` column
    * ([[withCell]] or an IVF store read).
    */
  def annTopKIvf(df: DataFrame, idCol: String, vecCol: String,
                 queryVec: Seq[Float], k: Int,
                 centroids: Array[Array[Double]], nprobe: Int,
                 excludeId: Option[Long] = None): DataFrame = {
    val cells = probeCells(queryVec, centroids, nprobe)
    val withCells =
      if (df.columns.contains("cell")) df else withCell(df, vecCol, centroids)
    withCells
      .filter(col("cell").isin(cells: _*))
      .filter(excludeId.map(col(idCol) =!= _).getOrElse(lit(true)))
      .withColumn("cos_sim",
        CosineSimilarity.cosineSim(col(vecCol), typedLit(queryVec)))
      .orderBy(desc("cos_sim"), col(idCol))
      .limit(k)
  }

  /** Batched IVF ANN: resolve a WHOLE probe batch in one corpus pass.
    * Each probe's `nprobe` nearest cells are assigned by a UDF over the
    * broadcast codebook (no driver loop, no per-probe job), exploded to
    * (probe, cell) rows — at most |probes| x nprobe of them, bounded
    * when the caller caps the probe batch — and equi-joined to the
    * cell-assigned corpus as a broadcast hash join: every corpus row is
    * scored only against probes that probed its cell, and the per-probe
    * top-k is a probe-partitioned window rank. This is the batch twin
    * of [[annTopKIvf]] exactly as the batched k-NN join is of the
    * brute-force scan, with IVF pruning applied per probe inside one
    * scan instead of `|probes|` pruned scans.
    *
    * `probes` must carry (`probeIdCol`, `probeVecCol`); the corpus gains
    * a `cell` column if absent. Self-exclusion is by id inequality.
    */
  def annTopKIvfBatch(df: DataFrame, idCol: String, vecCol: String,
                      probes: DataFrame, probeIdCol: String, probeVecCol: String,
                      k: Int, centroids: Array[Array[Double]],
                      nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bc = df.sparkSession.sparkContext.broadcast(centroids)
    val cellsOf = udf((v: Seq[Float]) =>
      probeCells(v, bc.value, nprobe).toArray)
    val probeCellRows = probes
      .select(col(probeIdCol).as("probe_id"), col(probeVecCol).as("qvec"))
      .withColumn("cell", explode(cellsOf(col("qvec"))))
    val corpus =
      if (df.columns.contains("cell")) df else withCell(df, vecCol, centroids)
    val w = Window.partitionBy("probe_id").orderBy(desc("cos_sim"), col(idCol))
    corpus
      .join(broadcast(probeCellRows), Seq("cell"))
      .filter(col(idCol) =!= col("probe_id"))
      .withColumn("cos_sim", CosineSimilarity.cosineSim(col(vecCol), col("qvec")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .drop("qvec")
  }

  /** IVF ANN over a cell-partitioned store written by [[saveIvfStore]];
    * the scan's partition filters prune to the probed cells.
    */
  def annTopKFromStore(spark: SparkSession, path: String, idCol: String,
                       vecCol: String, queryVec: Seq[Float], k: Int,
                       centroids: Array[Array[Double]], nprobe: Int,
                       excludeId: Option[Long] = None): DataFrame =
    annTopKIvf(spark.read.parquet(path), idCol, vecCol, queryVec, k,
      centroids, nprobe, excludeId)

  /** Fresh-session probe: centroids come from the store's own
    * `_codebook.json` — no retraining, no dependency on the training
    * session.
    */
  def annTopKFromStore(spark: SparkSession, path: String, idCol: String,
                       vecCol: String, queryVec: Seq[Float], k: Int,
                       nprobe: Int, excludeId: Option[Long]): DataFrame =
    annTopKFromStore(spark, path, idCol, vecCol, queryVec, k,
      loadCodebook(spark, path), nprobe, excludeId)
}
