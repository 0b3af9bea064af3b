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

  test("stateful sessionization equals the batch window algebra") {
    val dir = "/root/testdata/sf0.001"
    val streamed = StreamOps.sessionCounts(spark, dir, queryName = "spec_sessions")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batch = EventQueries.defs("q_evt_sessionize")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(streamed == batch, "flatMapGroupsWithState == lag/sum window result")
  }
}
