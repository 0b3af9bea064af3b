package graft.sources

import graft.core.ImagePlane
import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The engine's native storage for image planes: Parquet partitioned
  * by `fov` — the reference's NPZ-per-unit directory (io_utils.py) as
  * a first-class columnar table.
  *
  * At 100 TB this is the load-bearing layout decision:
  *   - stitch/relabel/slice group by fov, so fov-partitioned files let
  *     those reads prune to exactly the groups touched
  *     (PartitionFilters at the scan, zero shuffle for single-fov
  *     work);
  *   - `maxRecordsPerFile` bounds file sizes despite the wide pixel
  *     arrays; zstd (session default) compresses the dense planes;
  *   - the same layout holds on any Hadoop filesystem (file://, hdfs,
  *     s3a://bucket/... — the reference's aws_functions.py surface is
  *     a URI scheme here, not code).
  */
object PlaneStore {

  def save(ds: Dataset[ImagePlane], path: String,
           maxRecordsPerFile: Int = 2000): Unit =
    ds.toDF()
      .write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("fov")
      .parquet(path)

  def load(spark: SparkSession, path: String): Dataset[ImagePlane] = {
    import spark.implicits._
    // partitionBy moves `fov` to a partition column; restore column
    // order to the case-class shape
    spark.read.parquet(path)
      .select("fov", "stack", "crop", "slice", "nRows", "nCols",
        "channels", "pixels", "labels")
      .as[ImagePlane]
  }

  /** Bucketed variant: hash-bucket by fov so downstream per-fov
    * groupings (stitch, relabel, summaries) read a pre-shuffled layout
    * and plan WITHOUT an exchange — at 100 TB the stitch shuffle
    * disappears into the write once, amortized over every later query.
    */
  def saveBucketedTable(ds: Dataset[ImagePlane], table: String, path: String,
                        buckets: Int = 32): Unit =
    ds.toDF()
      .write
      .mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, "fov")
      .sortBy("fov", "stack")
      .saveAsTable(table)

  /** Partition-pruned single-fov read (P7 `test_parameters` fast path,
    * reshape_data.py:105-106: "first fov only" becomes a pruned scan).
    */
  def loadFov(spark: SparkSession, path: String, fov: String): Dataset[ImagePlane] = {
    import spark.implicits._
    spark.read.parquet(path)
      .where(col("fov") === fov)
      .select("fov", "stack", "crop", "slice", "nRows", "nCols",
        "channels", "pixels", "labels")
      .as[ImagePlane]
  }
}
