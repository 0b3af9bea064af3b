package graft.core

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Event-time ingestion normalization — the ONE place that knows how a
  * source may encode a timestamp column.
  *
  * The driver's `events` table has shipped as BOTH parquet
  * TIMESTAMP(NANOS) (which Spark reads as LongType under
  * `spark.sql.legacy.parquet.nanosAsLong`) and parquet
  * TIMESTAMP(MICROS, isAdjustedToUTC=false) (which Spark 4 infers as
  * TIMESTAMP_NTZ). Every operator downstream — `unix_micros`,
  * `window`, `withWatermark` — requires plain microsecond
  * TimestampType, so all ingestion paths funnel through here before
  * any plan is built. Mirrors the reference's loader-side
  * normalization (pre_annotation/data_loader.py:110-146 normalizes
  * vocab variants before operators see them; dataset_builder.py:156-158
  * coerces label dtypes the same way): inputs are canonicalized at the
  * boundary, operators never branch on encoding.
  *
  * The NTZ→TZ cast reinterprets the wall-clock fields in the session
  * timezone; GraftSession pins `spark.sql.session.timeZone` to UTC, so
  * the microsecond value is bit-identical to what DuckDB reads from the
  * same file — oracle-safe. Works identically on batch and streaming
  * DataFrames (it is a plain projection).
  */
object EventTime {

  /** Normalize `colName` to microsecond TimestampType regardless of
    * source encoding; no-op when already TimestampType. Fails loudly on
    * an encoding this engine has never seen — a silent pass-through
    * here is how 14 queries once crashed downstream (VERDICT r11).
    */
  def normalize(df: DataFrame, colName: String = "ts"): DataFrame =
    df.schema(colName).dataType match {
      case LongType => // legacy nanos-as-Long: integer div truncates like DuckDB
        df.withColumn(colName, timestamp_micros(expr(s"`$colName` div 1000")))
      case TimestampNTZType =>
        df.withColumn(colName, col(colName).cast(TimestampType))
      case TimestampType => df
      case other =>
        throw new IllegalArgumentException(
          s"unsupported event-time encoding for `$colName`: $other " +
            "(expected TIMESTAMP, TIMESTAMP_NTZ, or legacy nanos-as-Long)")
    }
}
