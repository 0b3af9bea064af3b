package graft.tools

import org.apache.spark.sql.functions._

/** Throughput + decade harness for the WebDataset TAR-shard family:
  * GEN (law samples → real archives via the registered
  * TarShards.writeShards sink, one task per shard), READ (full
  * readSamples parse census), RESHARD (read → re-key → writeShards —
  * the production re-sharding job). All three stages run the
  * registered code paths, so the walls measure the engine, not a
  * harness. Args: nShards (default 8), samplesPerShard (default
  * 2000); 10x the shard count for the decade row.
  */
object TarBench {
  def main(args: Array[String]): Unit = {
    val nShards = args.headOption.map(_.toInt).getOrElse(8)
    val perShard = if (args.length > 1) args(1).toInt else 2000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def now() = System.nanoTime()
    def sec(t0: Long) = (now() - t0) / 1e9

    val dir = graft.core.Scratch.dir(spark, "tarbench")
    val dir2 = graft.core.Scratch.dir(spark, "tarbench-reshard")

    // law samples: ~4 KB img + ~1 KB json per sample
    val samples = spark.range(nShards.toLong * perShard)
      .select(col("id"))
      .as[Long]
      .map { id =>
        val s = (id / perShard).toInt
        val i = (id % perShard).toInt
        val key = f"s$s%03d/k$i%05d"
        def payload(ei: Int, n: Int): Array[Byte] =
          Array.tabulate[Byte](n)(j => ((7 * j + 13 * i + 19 * s + 31 * ei) % 251).toByte)
        (f"shard-$s%04d.tar", key, Seq("img", "json"),
          Map("img" -> payload(0, 4096 + i % 512), "json" -> payload(1, 1024)))
      }
      .toDF("shard", "key", "exts", "entries")

    var t0 = now()
    graft.sources.TarShards.writeShards(samples, dir)
    val genS = sec(t0)

    t0 = now()
    val census = graft.sources.TarShards.readSamples(spark, dir)
      .select(count(lit(1)).as("n"),
        sum(aggregate(transform(map_values(col("entries")),
          b => length(b).cast("long")), lit(0L), (a, x) => a + x)).as("bytes"))
      .collect()(0)
    val readS = sec(t0)
    val nSamples = census.getLong(0)
    val totalBytes = census.getLong(1)

    t0 = now()
    val reshard = graft.sources.TarShards.readSamples(spark, dir)
      .withColumn("shard",
        format_string("re-%04d.tar", pmod(xxhash64(col("key")), lit(nShards * 2))))
    graft.sources.TarShards.writeShards(reshard, dir2)
    val reS = sec(t0)

    // size-targeted reshard (reshardBySize): group by the key's shard
    // prefix, pack into ~4 MiB output shards by cumulative footprint —
    // the narrow-window + join-back + sink path end to end
    val dir3 = graft.core.Scratch.dir(spark, "tarbench-sized")
    t0 = now()
    val sized = graft.sources.TarShards.reshardBySize(
      graft.sources.TarShards.readSamples(spark, dir)
        .withColumn("group", split(col("key"), "/").getItem(0)),
      targetBytes = 4L * 1024 * 1024)
    graft.sources.TarShards.writeShards(sized, dir3)
    val szS = sec(t0)

    val mb = totalBytes / 1e6
    println(f"[tarbench] shards=$nShards samples=$nSamples payload=${mb}%.0f MB | " +
      f"gen ${genS}%.1f s (${mb / genS}%.0f MB/s) | read ${readS}%.1f s " +
      f"(${mb / readS}%.0f MB/s) | reshard ${reS}%.1f s (${mb / reS}%.0f MB/s) | " +
      f"sized-reshard ${szS}%.1f s (${mb / szS}%.0f MB/s)")
    spark.stop()
  }
}
