package graft.core

import org.apache.spark.sql.SparkSession

/** Canonical SparkSession factory for the engine.
  *
  * Local-mode defaults sized for the driver harness (local[32],
  * 128 GiB box): shuffle partitions match core count instead of the
  * 200 default, AQE is on for runtime re-planning (skew joins,
  * partition coalescing — the knobs that matter unchanged on a real
  * cluster), and the session timezone is pinned to UTC for oracle
  * parity. `nanosAsLong` lets us ingest nanosecond parquet timestamps
  * (the `events` table) which Spark otherwise rejects; graft.queries.Q
  * rebases them to microsecond TimestampType at load.
  */
object GraftSession {

  def builder(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
              shufflePartitions: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
      : SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.ui.enabled", "false")

  def get(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
