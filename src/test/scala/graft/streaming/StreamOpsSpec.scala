package graft.streaming

import graft.SparkSpec
import graft.queries.{EventQueries, Q}

class StreamOpsSpec extends SparkSpec {

  test("streaming hourly agg equals the batch rollup") {
    val dir = "/root/testdata/sf0.001"
    val streamed = StreamOps.hourlyCounts(spark, dir, "spec_hourly")
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val batch = EventQueries.defs("q_evt_hourly")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(streamed == batch, "watermarked stream result == batch result")
  }

  test("incremental stitch: canvases complete as crops stream in") {
    import graft.core.ImagePlane
    import graft.ops.CropOps
    import graft.sources.PlaneStore
    val dir = java.nio.file.Files.createTempDirectory("stream_stitch")
      .toFile.getAbsolutePath + "/crops"
    val orig = ImagePlane.blankPlanes(2, 2, 40, 40)
      .map(ImagePlane.gridLabels(_, cellSize = 8))
    val plan = CropOps.planCrops(40, 40, 20, 20, 0.5)
    PlaneStore.save(CropOps.cropPlanes(ImagePlane.toDataset(spark, orig), plan),
      dir, maxRecordsPerFile = 3) // several files => several micro-batches
    val out = StreamOps.incrementalStitch(spark, dir, plan,
      queryName = "spec_stitch", maxFilesPerTrigger = 2)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> (r.getLong(3), r.getLong(4))).toMap
    assert(out.size == orig.size, s"every canvas completed: ${out.keys}")
    orig.foreach { o =>
      val (cells, nonzero) = out((o.fov, o.stack))
      assert(cells == o.labels.filter(_ != 0).distinct.length.toLong)
      assert(nonzero == o.labels.count(_ != 0).toLong)
    }
  }

  test("streaming dedup census equals batch count-distinct") {
    val dir = "/root/testdata/sf0.001"
    val streamed = StreamOps.dedupCounts(spark, dir, "spec_dedup")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = Q.t(spark, dir, "events")
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch, "dropDuplicates stream == batch count-distinct")
  }

  test("streaming incremental dedup equals the batch anti-join operator") {
    val dir = "/root/testdata/sf0.001"
    val streamed = StreamOps.incrementalDedup(spark, dir, "spec_inc_dedup")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq.sorted
    val batch = graft.queries.DedupQueries.defs("q_dedup_incremental")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq.sorted
    assert(streamed.nonEmpty && streamed == batch,
      "stream-static anti join + keep-first agg == batch operator")
  }

  test("stateful sessionization equals the batch window algebra") {
    val dir = "/root/testdata/sf0.001"
    val streamed = StreamOps.sessionCounts(spark, dir, queryName = "spec_sessions")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batch = EventQueries.defs("q_evt_sessionize")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(streamed == batch, "flatMapGroupsWithState == lag/sum window result")
  }

  test("streaming EWMA: O(1)-per-user state, and a time-sliced replay equals one batch") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val (oneShot, maxState) = StreamOps.ewmaState(spark, dir)
    val one = oneShot.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val nUsers = spark.read.parquet(s"$dir/events.parquet")
      .select("user_id").distinct().count()
    assert(one.size == nUsers)
    assert(maxState == nUsers, s"state high-water $maxState != $nUsers users (O(1)/user)")

    // two time-ordered slices, one micro-batch each: same final table
    val ev = graft.queries.Q.t(spark, dir, "events")
    val n = ev.count()
    val tmp = java.nio.file.Files.createTempDirectory("ewma_slices")
    // slice by median ts so each file is a contiguous time range
    val cut = ev.select(unix_micros(col("ts")).as("us")).orderBy("us")
      .collect()(n.toInt / 2).getLong(0)
    def writeSlice(slice: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val stage = tmp.resolve(s"stage_$name")
      slice.coalesce(1).write.parquet(stage.toString)
      val part = java.nio.file.Files.list(stage).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      java.nio.file.Files.move(part, tmp.resolve(name))
    }
    writeSlice(ev.filter(unix_micros(col("ts")) < cut), "evt_000.parquet")
    writeSlice(ev.filter(unix_micros(col("ts")) >= cut), "evt_001.parquet")
    // the file source replays in modification order; make it unambiguous
    tmp.resolve("evt_001.parquet").toFile
      .setLastModified(tmp.resolve("evt_000.parquet").toFile.lastModified() + 10000)
    val (sliced, _) = StreamOps.ewmaState(spark, tmp.toString,
      glob = "evt_*.parquet", maxFilesPerTrigger = 1)
    val two = sliced.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(two == one, "time-ordered two-batch replay must reproduce the single-batch EWMA")
  }

  test("streaming attribution: O(1)-state census equals the batch window, sliced replay agrees") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val (oneShot, maxState) = StreamOps.attributionState(spark, dir)
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val one = toMap(oneShot)
    val batch = toMap(EventQueries.defs("q_evt_attribution")(spark, dir))
    assert(one == batch, "O(1)-state credit accumulators == batch window census")
    val nUsers = spark.read.parquet(s"$dir/events.parquet")
      .select("user_id").distinct().count()
    assert(maxState == nUsers, s"state high-water $maxState != $nUsers users (O(1)/user)")

    // two time-ordered slices, one micro-batch each: same census
    val ev = graft.queries.Q.t(spark, dir, "events")
    val n = ev.count()
    val tmp = java.nio.file.Files.createTempDirectory("attr_slices")
    val cut = ev.select(unix_micros(col("ts")).as("us")).orderBy("us")
      .collect()(n.toInt / 2).getLong(0)
    def writeSlice(slice: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val stage = tmp.resolve(s"stage_$name")
      slice.coalesce(1).write.parquet(stage.toString)
      val part = java.nio.file.Files.list(stage).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      java.nio.file.Files.move(part, tmp.resolve(name))
    }
    writeSlice(ev.filter(unix_micros(col("ts")) < cut), "evt_000.parquet")
    writeSlice(ev.filter(unix_micros(col("ts")) >= cut), "evt_001.parquet")
    tmp.resolve("evt_001.parquet").toFile
      .setLastModified(tmp.resolve("evt_000.parquet").toFile.lastModified() + 10000)
    val (sliced, _) = StreamOps.attributionState(spark, tmp.toString,
      glob = "evt_*.parquet", maxFilesPerTrigger = 1)
    assert(toMap(sliced) == one,
      "time-ordered two-batch replay must reproduce the single-batch census")
  }

  test("transformWithState EWMA equals the mapGroupsWithState twin bit-for-bit") {
    val dir = "/root/testdata/sf0.001"
    val (mgws, _) = StreamOps.ewmaState(spark, dir)
    val (tws, maxState) = StreamOps.ewmaStateTws(spark, dir)
    val a = mgws.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val b = tws.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(a == b, "the Spark 4 state API must reproduce the classic API exactly")
    assert(maxState == a.size.toLong, "RocksDB state rows == users (O(1)/user)")
    // conf restored: the shared session must not keep the RocksDB provider
    assert(!spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      .exists(_.contains("RocksDB")))
  }

  test("transformWithState CEP equals the mapGroupsWithState twin bit-for-bit") {
    val dir = "/root/testdata/sf0.001"
    val (mgws, _) = StreamOps.patternState(spark, dir)
    val (tws, maxState) = StreamOps.patternStateTws(spark, dir)
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    val a = toMap(mgws)
    val b = toMap(tws)
    assert(a == b, "the Spark 4 state API must reproduce the classic CEP exactly")
    assert(maxState == a.size.toLong, "RocksDB state rows == users (O(1)/user)")
    assert(!spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      .exists(_.contains("RocksDB")))
  }

  test("transformWithState timer sessionizer equals the flatMapGroups append twin") {
    val dir = "/root/testdata/sf0.001"
    val classic = StreamOps.sessionCountsAppend(spark, dir,
      queryName = "sess_append_ref")
    val tws = StreamOps.sessionCountsAppendTws(spark, dir)
    def toSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val a = toSet(classic.result)
    val b = toSet(tws.result)
    assert(b == a, s"timer eviction law must match setTimeoutTimestamp: " +
      s"only-classic=${(a -- b).take(3)} only-tws=${(b -- a).take(3)}")
    assert(!spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      .exists(_.contains("RocksDB")))
  }

  test("transformWithState MapState hourly rollup equals the windowed-agg append twin") {
    val dir = "/root/testdata/sf0.001"
    val classic = StreamOps.hourlyCountsAppend(spark, dir,
      glob = Some("events.parquet"), queryName = "hourly_append_ref")
    val tws = StreamOps.hourlyCountsAppendTws(spark, dir)
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val a = toMap(classic.result)
    val b = toMap(tws.result)
    assert(b == a, s"per-window timer law must match the built-in append " +
      s"eviction: only-classic=${(a.toSet -- b.toSet).take(3)} " +
      s"only-tws=${(b.toSet -- a.toSet).take(3)}")
    assert(a.nonEmpty, "fixture degenerate: no finalized windows emitted")
    // MapState rows == open (type, hour) windows; the single-batch
    // drain holds every window at its high-water, like the classic's
    // single-batch shape — the bound is the WINDOW count, never rows
    assert(tws.maxStateRows > 0)
    assert(!spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      .exists(_.contains("RocksDB")))
  }

  test("transformWithState window-keyed PSI equals the classic windowed-agg twin") {
    val dir = "/root/testdata/sf0.001"
    val classic = graft.queries.ScaleQueries.defs("q_stream_psi")(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    val tws = graft.queries.ScaleQueries.defs("q_stream_psi_tws")(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    assert(tws == classic,
      "window-keyed ValueState + timers must reproduce the classic PSI exactly")
    assert(tws.nonEmpty, "fixture degenerate: no finalized PSI windows")
    assert(!spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      .exists(_.contains("RocksDB")))
  }

  test("transformWithState ListState stitch equals the flatMapGroups append twin") {
    val tws = graft.queries.ScaleQueries.defs("q_stream_stitch_tws")(
      spark, "twsfix").collect().map(_.toString).sorted.toSeq
    val classic = graft.queries.ScaleQueries.defs("q_stream_stitch")(
      spark, "classicfix").collect().map(_.toString).sorted.toSeq
    assert(tws == classic,
      "ListState + timer stitch must reproduce the classic twin exactly")
    // the quarantine row is present (group 0 misses its last crop)
    assert(tws.exists(_.contains("quarantined")))
    assert(!spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      .exists(_.contains("RocksDB")))
  }

  test("streaming near-dup gate equals the batch band-check, stateless join") {
    import org.apache.spark.sql.functions._
    import graft.functions.{Dedup, MinhashEstimate}
    val dir = "/root/testdata/sf0.001"
    val (streamed, maxState) = StreamOps.neardupStatic(spark, dir)
    val got = streamed.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    // batch reference: identical expressions, no stream
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def banded(df: org.apache.spark.sql.DataFrame, idAs: String, mhAs: String) =
      df.withColumn("band", explode(sequence(lit(0), lit(31))))
        .withColumn("bucket",
          xxhash64(slice(col("minhash"), col("band") * 4 + 1, lit(4))))
        .select(col("doc_id").as(idAs), col("band"), col("bucket"),
          col("minhash").as(mhAs))
    val store = banded(Dedup.withMinhash(
      docs.filter(col("doc_id") % 10 =!= 9), "text", 128, 3), "store_id", "store_mh")
    val arrivals = banded(Dedup.withMinhash(
      docs.filter(col("doc_id") % 10 === 9), "text", 128, 3), "doc_id", "mh")
    val ref = arrivals.join(store, Seq("band", "bucket"), "left_outer")
      .withColumn("est_pm", when(col("store_mh").isNull, lit(-1L))
        .otherwise(floor(MinhashEstimate.minhashEst(col("mh"),
          col("store_mh")) * 10000).cast("long")))
      .groupBy("doc_id")
      .agg(countDistinct(col("store_id")).as("n_cand"),
        max(col("est_pm")).as("best_est_pm"))
      .collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(2) < 5000L)).toMap
    assert(got == ref, "drained stream gate == batch band-check")
    // every arriving doc is scored exactly once; state = per-doc agg rows
    val nArrivals = docs.filter(col("doc_id") % 10 === 9).count()
    assert(got.size.toLong == nArrivals)
    assert(maxState == nArrivals, s"state $maxState != $nArrivals per-doc rows")
    // the law is live: the fixture corpus contains both verdicts
    assert(got.values.exists(_._3) , "no novel docs — fixture degenerate")
  }

  test("streaming semantic gate equals the batch in-cell cosine check") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val streamed = graft.queries.SimilarityQueries.defs("q_stream_semgate")(
      spark, dir)
    val got = streamed.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    // batch reference over the same cell coding and split
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val nArrivals = emb.filter(col("vec_id") % 10 === 9).count()
    assert(got.size.toLong == nArrivals, "one verdict per arriving vector")
    // novelty verdicts agree with a driver-side exact recompute for a
    // deterministic sample of arriving vectors
    val vecs = emb.collect().map { r =>
      r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray
    }.toMap
    val cells = graft.queries.SimilarityQueries.semdedupCells(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      math.rint(dot / (na * nb) * 1e6) / 1e6
    }
    got.keys.toSeq.sorted.take(10).foreach { vid =>
      val mates = cells.collect {
        case (sid, cl) if sid % 10 != 9 && cl == cells(vid) => sid
      }.toSeq
      val best =
        if (mates.isEmpty) -1.0 else mates.map(s => cos(vecs(vid), vecs(s))).max
      val (nCand, bestSim, novel) = got(vid)
      assert(nCand == mates.size.toLong, s"vec $vid n_cand")
      assert(math.abs(bestSim - best) < 1e-9, s"vec $vid best $bestSim != $best")
      assert(novel == (best < 0.2), s"vec $vid novelty")
    }
    // the law is live on the fixture corpus
    assert(got.values.exists(_._3) && got.values.exists(!_._3),
      "fixture must contain both novel and near-dup vectors")
  }

  test("streaming CEP: DFA state equals the batch regex counts, O(1) state per user") {
    val dir = "/root/testdata/sf0.001"
    val (oneShot, maxState) = StreamOps.patternState(spark, dir)
    val one = oneShot.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    val batch = EventQueries.defs("q_evt_pattern")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getAs[Int]("n_conv").toLong,
          r.getAs[Int]("n_err_runs").toLong, r.getAs[Boolean]("signup_converted")))
      .toMap
    assert(one == batch, "O(1)-state DFA simulation == batch journey regexes")
    assert(maxState == batch.size.toLong,
      s"state high-water $maxState != ${batch.size} users (O(1)/user)")
  }

  test("streaming CEP: runs and open attempts carry across micro-batch boundaries") {
    import org.apache.spark.sql.functions._
    // crafted journeys split mid-pattern:
    //   user 1: "vee" | "ep"  -> one ee+ run straddling the cut (a
    //           commit-at-boundary bug would count it twice)
    //   user 2: "vc"  | "cp"  -> one vc*p conversion spanning batches
    //   user 3: "s"   | "p"   -> signup converts across the boundary
    val letters = Map('v' -> "view", 'c' -> "click", 'p' -> "purchase",
      'e' -> "error", 's' -> "signup")
    def rows(uid: Long, journey: String, t0: Long): Seq[(Long, java.sql.Timestamp, Long, String, Double, String)] =
      journey.zipWithIndex.map { case (ch, i) =>
        (uid * 1000 + i, new java.sql.Timestamp(t0 + i * 1000L), uid,
          letters(ch), 1.0, "{}")
      }
    val tmp = java.nio.file.Files.createTempDirectory("cep_slices")
    import spark.implicits._
    def writeSlice(data: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)],
                   name: String): Unit = {
      val stage = tmp.resolve(s"stage_$name")
      data.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(stage.toString)
      val part = java.nio.file.Files.list(stage)
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.move(part, tmp.resolve(name))
    }
    // batch 1 holds each user's prefix (earlier timestamps)
    writeSlice(rows(1, "vee", 0) ++ rows(2, "vc", 0) ++ rows(3, "s", 0),
      "evt_000.parquet")
    writeSlice(rows(1, "ep", 100000) ++ rows(2, "cp", 100000) ++ rows(3, "p", 100000),
      "evt_001.parquet")
    tmp.resolve("evt_001.parquet").toFile
      .setLastModified(tmp.resolve("evt_000.parquet").toFile.lastModified() + 10000)
    val (out, _) = StreamOps.patternState(spark, tmp.toString,
      glob = "evt_*.parquet", maxFilesPerTrigger = 1)
    val got = out.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    // journeys: 1 -> "veeep", 2 -> "vccp", 3 -> "sp"
    assert(got == Map(
      1L -> ((5L, 0L, 1L, false)),
      2L -> ((4L, 1L, 0L, false)),
      3L -> ((2L, 0L, 0L, true))))
  }
}
