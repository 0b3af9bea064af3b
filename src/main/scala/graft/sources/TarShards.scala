package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset-style TAR-shard source — the sharded-archive layout
  * large multimodal training pipelines read (Aizman et al. 2019's
  * WebDataset convention: a dataset is a directory of .tar shards,
  * each holding many small sample files; the SHARD is the unit of
  * parallelism and ordering within a shard is the sample order).
  *
  * Spark-first shape: a distributed `binaryFile` scan assigns one
  * task per shard (archives are single-split by nature), and a pure
  * JVM ustar walk explodes each archive into (shard, entry, bytes)
  * rows map-side — entry payloads never shuffle unless a downstream
  * operator asks them to, mirroring the NPZ/TIFF source discipline.
  * No external TAR dependency: the POSIX ustar layout is 512-byte
  * headers (name at 0..99 NUL-terminated, size as octal ASCII at
  * 124..135, typeflag at 156) with data padded to 512, terminated by
  * two zero blocks — a ~30-line loop.
  *
  * Scale: shards are the parallelism unit, so a 100 TB corpus of
  * ~1 GB shards fans out to ~100k independent map tasks with zero
  * coordination; `binaryFile` reads a shard fully into one task's
  * memory, which is exactly the WebDataset contract (shards are sized
  * to stream through workers).
  */
object TarShards {

  /** Parse one ustar archive into (entryName, payload) pairs —
    * regular files only (typeflag '0' or NUL); directories, PAX
    * headers and link entries are skipped but their data blocks are
    * stepped over correctly.
    */
  def parseTar(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]
    var off = 0
    var ended = false
    while (!ended && off + 512 <= bytes.length) {
      var allZero = true
      var z = off
      while (allZero && z < off + 512) { if (bytes(z) != 0) allZero = false; z += 1 }
      if (allZero) ended = true
      else {
        var nameEnd = 0
        while (nameEnd < 100 && bytes(off + nameEnd) != 0) nameEnd += 1
        val name = new String(bytes, off, nameEnd, "UTF-8")
        var sz = 0L
        var k = 124
        // octal size field: skip leading spaces/NULs, stop at first non-digit
        while (k < 136 && (bytes(off + k) == ' ' || bytes(off + k) == 0)) k += 1
        while (k < 136 && bytes(off + k) >= '0' && bytes(off + k) <= '7') {
          sz = sz * 8 + (bytes(off + k) - '0'); k += 1
        }
        val typeflag = bytes(off + 156)
        if (typeflag == '0'.toByte || typeflag == 0.toByte) {
          val data = java.util.Arrays.copyOfRange(
            bytes, off + 512, off + 512 + sz.toInt)
          out += name -> data
        }
        off += 512 + (((sz + 511) / 512) * 512).toInt
      }
    }
    out.toSeq
  }

  /** Distributed shard scan: one row per regular-file entry —
    * (shard, entry, n_bytes, content). `shard` is the archive's base
    * name, `idx` the entry's position within it (WebDataset sample
    * order).
    */
  def readTarDir(spark: SparkSession, dir: String,
                 glob: String = "*.tar"): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        element_at(split(col("path"), "/"), -1).as("shard"),
        col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (shard, bytes) =>
        parseTar(bytes).zipWithIndex.map { case ((name, data), i) =>
          (shard, i, name, data.length.toLong, data)
        }
      }
      .toDF("shard", "idx", "entry", "n_bytes", "content")
  }
}
