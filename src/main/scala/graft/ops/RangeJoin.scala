package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic bucketed range (interval) join: every left row carries an
  * interval `[lo, hi]` and matches the right rows with the same key
  * whose time falls inside it — the windowed-attribution / "events
  * within Δ of each other" lookup that complements the as-of join
  * ([[Asof]] picks the single latest-before row; this keeps ALL rows
  * in a window).
  *
  * Spark plans the naive encoding — an equi-join on the key plus an
  * inequality `r.t BETWEEN l.lo AND l.hi` — as a per-key cartesian
  * (every left row of a key against every right row of that key;
  * keyless degenerates to BroadcastNestedLoopJoin). This is the
  * public bucketed-range-join rewrite instead: quantize time into
  * fixed-width buckets, explode each left interval to the buckets it
  * overlaps (a BOUNDED fan-out — `maxBucketsPerRow` is enforced with
  * `raise_error`, so a malformed interval fails loudly instead of
  * exploding a partition), stamp each right point with its single
  * bucket, equi-join on (key, bucket), and apply the exact interval
  * predicate as a post-filter. ONE shuffle on (key, bucket); each
  * candidate pair meets in exactly the right point's bucket, so no
  * duplicate elimination is needed. Cost is |matches| plus the
  * bounded bucket fan-out — linear at any corpus size, and the
  * (key, bucket) shuffle key spreads a hot key's timeline across
  * partitions instead of funnelling it to one.
  *
  * Times are integer microseconds (the engine-wide convention — see
  * [[Asof]] on parquet ns truncation) and both interval ends are
  * INCLUSIVE. `bucketWidth` trades fan-out (wide buckets = fewer
  * explode rows) against join selectivity (narrow buckets = fewer
  * false candidates reaching the exact filter); the span cap
  * `maxBucketsPerRow` is the scale contract, sized so
  * span/bucketWidth + 1 buckets stay a small constant.
  */
object RangeJoin {

  /** Inner-join the right points into the left intervals.
    *
    * @param left        rows bearing `[leftLo, leftHi]` interval
    *                    columns (integer microseconds, inclusive);
    *                    all left columns are kept
    * @param right       point timeline; `payloadCols` are appended
    *                    for every match (one output row per matched
    *                    pair — aggregate downstream for counts)
    * @param keys        equi-join key columns present on both sides
    * @param rightTime   right event-time column (integer micros)
    * @param bucketWidth bucket width in microseconds
    * @param maxBucketsPerRow declared fan-out bound; a left interval
    *                    spanning more buckets (or inverted, hi < lo)
    *                    raises an error rather than exploding
    * @param joinType    "inner" (default) emits matched pairs only.
    *                    "left_outer" guarantees every left row at
    *                    least one output row — the range predicate
    *                    moves INTO the join condition so a left bucket
    *                    row whose candidates all miss still survives
    *                    with null payload. Unmatched bucket COPIES of
    *                    a left row also carry null payload, so
    *                    left-outer output is for null-ignoring
    *                    aggregation downstream (count/max over the
    *                    payload — the one-pass "count matches, keep
    *                    zero-rows" shape that would otherwise need a
    *                    second left scan and a join-back).
    */
  def joinPointsInInterval(left: DataFrame, right: DataFrame,
                           keys: Seq[String], leftLo: String, leftHi: String,
                           rightTime: String, bucketWidth: Long,
                           payloadCols: Seq[String],
                           maxBucketsPerRow: Int = 64,
                           joinType: String = "inner"): DataFrame = {
    require(keys.nonEmpty, "range join needs at least one key column")
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(Set("inner", "left_outer")(joinType),
      s"joinType must be inner or left_outer, got $joinType")
    val collide = payloadCols.toSet.intersect(left.columns.toSet)
    require(collide.isEmpty, s"payload columns collide with left: $collide")
    // floor division correct for negative epochs too
    def bkt(c: org.apache.spark.sql.Column) =
      (c - pmod(c, lit(bucketWidth))) / lit(bucketWidth)
    val loB = bkt(col(leftLo))
    val hiB = bkt(col(leftHi))
    val l = left.withColumn("__bkt", explode(
      when(col(leftHi) >= col(leftLo) &&
           hiB - loB < lit(maxBucketsPerRow.toLong),
        sequence(loB.cast("long"), hiB.cast("long")))
        .otherwise(raise_error(format_string(
          s"range join interval exceeds $maxBucketsPerRow buckets " +
            s"of $bucketWidth us (or hi < lo): lo=%s hi=%s",
          col(leftLo), col(leftHi))))))
    if (joinType == "inner") {
      val r = right.select(
        keys.map(col) ++ Seq(bkt(col(rightTime)).cast("long").as("__bkt"),
          col(rightTime).as("__rt"),
          struct(payloadCols.map(col): _*).as("__p")): _*)
      l.join(r, keys :+ "__bkt")
        .filter(col("__rt") >= col(leftLo) && col("__rt") <= col(leftHi))
        .select(left.columns.map(col) ++
          payloadCols.map(c => col(s"__p.$c").as(c)): _*)
    } else {
      // the exact range check must sit in the join CONDITION: as a
      // post-filter it would also drop the null rows that make the
      // join left-outer
      val r = right.select(
        keys.map(k => col(k).as(s"__r_$k")) ++
          Seq(bkt(col(rightTime)).cast("long").as("__rbkt"),
            col(rightTime).as("__rt"),
            struct(payloadCols.map(col): _*).as("__p")): _*)
      val cond = keys.map(k => col(k) === col(s"__r_$k"))
        .reduce(_ && _) && col("__bkt") === col("__rbkt") &&
        col("__rt") >= col(leftLo) && col("__rt") <= col(leftHi)
      l.join(r, cond, "left_outer")
        .select(left.columns.map(col) ++
          payloadCols.map(c => col(s"__p.$c").as(c)): _*)
    }
  }

  /** Interval-OVERLAP join: every (left, right) pair with the same key
    * whose intervals intersect — `max(lo) <= min(hi)`, both ends
    * inclusive, so touching intervals match. The third member of the
    * temporal-join family ([[Asof]] = latest-before,
    * [[joinPointsInInterval]] = point-in-window, this = window-vs-
    * window; the "sessions affected by incident windows" shape).
    *
    * Same bucketed rewrite, with the one extra subtlety of the
    * interval-interval case: an overlapping pair shares EVERY bucket
    * of its intersection, so the equi-join would emit it once per
    * shared bucket. The canonical-bucket predicate dedups without a
    * distinct pass: a pair is kept only in the bucket containing
    * `greatest(leftLo, rightLo)` — the FIRST shared bucket, covered by
    * both sides exactly when the intervals overlap — so each pair
    * survives exactly once and no shuffle-wide dedup is needed.
    *
    * Both sides' bucket fan-outs are capped by `maxBucketsPerRow`
    * (`raise_error`, same contract as the point form).
    */
  def joinIntervalsOverlap(left: DataFrame, right: DataFrame,
                           keys: Seq[String], leftLo: String, leftHi: String,
                           rightLo: String, rightHi: String,
                           bucketWidth: Long, payloadCols: Seq[String],
                           maxBucketsPerRow: Int = 64): DataFrame = {
    require(keys.nonEmpty, "overlap join needs at least one key column")
    require(bucketWidth > 0, "bucketWidth must be positive")
    val collide = payloadCols.toSet.intersect(left.columns.toSet)
    require(collide.isEmpty, s"payload columns collide with left: $collide")
    def bkt(c: org.apache.spark.sql.Column) =
      ((c - pmod(c, lit(bucketWidth))) / lit(bucketWidth)).cast("long")
    def explodeBuckets(lo: String, hi: String) = explode(
      when(col(hi) >= col(lo) &&
           bkt(col(hi)) - bkt(col(lo)) < lit(maxBucketsPerRow.toLong),
        sequence(bkt(col(lo)), bkt(col(hi))))
        .otherwise(raise_error(format_string(
          s"overlap join interval exceeds $maxBucketsPerRow buckets " +
            s"of $bucketWidth us (or hi < lo): lo=%s hi=%s",
          col(lo), col(hi)))))
    val l = left.withColumn("__bkt", explodeBuckets(leftLo, leftHi))
    val r = right
      .select(keys.map(col) ++ Seq(col(rightLo).as("__rlo"),
        col(rightHi).as("__rhi"),
        struct(payloadCols.map(col): _*).as("__p")): _*)
      .withColumn("__bkt", explodeBuckets("__rlo", "__rhi"))
    l.join(r, keys :+ "__bkt")
      .filter(greatest(col(leftLo), col("__rlo")) <=
                least(col(leftHi), col("__rhi")) &&
              col("__bkt") === bkt(greatest(col(leftLo), col("__rlo"))))
      .select(left.columns.map(col) ++
        payloadCols.map(c => col(s"__p.$c").as(c)): _*)
  }
}
