package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for the query inventory.
  *
  * Conventions that keep the DuckDB-oracle hash comparison exact:
  *   - Monetary/2-decimal doubles are cast to DECIMAL(18,2) *before*
  *     aggregation so sums are exact integers-of-cents in both engines
  *     (double summation order differs between Spark partial aggs and
  *     DuckDB; decimal arithmetic removes the divergence).
  *   - Timestamps are never returned raw: they are formatted to strings
  *     (`yyyy-MM-dd[ HH:mm:ss]`) so engine-internal representations
  *     (ns vs us, tz) cannot leak into the hash.
  *   - Every query ends in a deterministic ORDER BY with a unique
  *     tiebreak column.
  *   - Column names are aliased identically in the Spark plan and the
  *     oracle SQL.
  */
object Q {
  type QueryFn = (SparkSession, String) => DataFrame

  /** Read one driver testdata table (see /root/repo/TESTDATA.md).
    *
    * The `events` table stores TIMESTAMP(NANOS) which Spark reads as
    * LongType under `spark.sql.legacy.parquet.nanosAsLong`; rebase any
    * such column to microsecond TimestampType (integer `div` — same
    * truncation DuckDB applies to nanos) so downstream operators see a
    * real timestamp.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Exact-arithmetic cast for the 2-decimal monetary doubles. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  def dec(name: String): Column = dec(col(name))

  /** Timestamp -> 'yyyy-MM-dd' string (DuckDB: strftime '%Y-%m-%d'). */
  def asDate(c: Column): Column = date_format(c, "yyyy-MM-dd")

  /** Timestamp -> 'yyyy-MM-dd HH:mm:ss' string. */
  def asDateTime(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")
}
