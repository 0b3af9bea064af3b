package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic as-of (point-in-time) join: every left row picks up the
  * LATEST right row with the same key whose time is at or before the
  * left row's time — the temporal-attribution / feature-snapshot
  * lookup every training-data pipeline needs (label a purchase with
  * the ad click that preceded it, join an example to the newest
  * feature snapshot as of its cutoff).
  *
  * Spark has no ASOF JOIN operator, and the naive encoding — an
  * inequality join `r.time <= l.time` + max — plans as a per-key
  * cartesian (quadratic per key; keyless degenerates to a
  * BroadcastNestedLoopJoin). This is the scale-right composition
  * instead: tag both sides, UNION them (by name, right's payload nulls
  * on the left side and vice versa), sort each key's merged timeline
  * once, and carry the last right payload forward with
  * `last(payload, ignoreNulls = true)` over a running row frame.
  * ONE shuffle on the key, linear work per row, zero row explosion —
  * the same cost shape as any per-key window, so it survives any
  * corpus where a single key's history fits a partition.
  *
  * Tie rule: a right row at exactly the left row's time IS matched
  * ("at or before" is inclusive) — the right side sorts first at equal
  * times. Callers must pass time columns of identical type on both
  * sides (integer microseconds recommended; sub-microsecond parquet
  * precision truncates differently across engines).
  */
object Asof {

  /** @param left      rows to enrich (all its columns are kept)
    * @param right     lookup timeline; `payloadCols` are appended to
    *                  matching left rows (null when no right row is at
    *                  or before the left time)
    * @param keys      equi-join key columns present on both sides
    * @param leftTime  left event-time column name
    * @param rightTime right event-time column name
    * @param payloadCols right columns to carry (must not collide with
    *                  left column names)
    * @param tolerance optional max staleness (same units as the time
    *                  columns, inclusive): the latest-at-or-before row
    *                  only matches if `leftTime - rightTime <=
    *                  tolerance` — the merge_asof tolerance rule. The
    *                  latest-before row IS the nearest, so a match
    *                  beyond tolerance means no in-tolerance row
    *                  exists; payload nulls, no second lookup needed.
    */
  def joinLastBefore(left: DataFrame, right: DataFrame, keys: Seq[String],
                     leftTime: String, rightTime: String,
                     payloadCols: Seq[String],
                     tolerance: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "asof join needs at least one key column")
    val collide = payloadCols.toSet.intersect(left.columns.toSet)
    require(collide.isEmpty, s"payload columns collide with left: $collide")
    require(!payloadCols.contains("__rt"), "__rt is reserved")
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    // payload rides as ONE struct so a match is row-atomic: even if
    // some payload fields are null on the matched right row, all
    // fields still come from the SAME row (per-column carry could mix
    // rows when fields are independently null). The matched row's own
    // time rides along as __rt for the tolerance check.
    val r = right.select(
      keys.map(col) ++ Seq(col(rightTime).as("__t"), lit(0).as("__side"),
        struct(col(rightTime).as("__rt") +: payloadCols.map(col): _*).as("__p")): _*)
    val merged = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inTol = tolerance
      .map(tol => col("__t") - col("__last.__rt") <= tol)
      .getOrElse(lit(true))
    merged
      .withColumn("__last", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        payloadCols.map(c =>
          when(inTol, col(s"__last.$c")).otherwise(lit(null)).as(c)): _*)
  }
}
