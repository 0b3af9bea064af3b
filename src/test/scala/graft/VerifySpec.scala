package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Gate-integrity contract for the correctness dump: a query that
  * crashes must surface as a visible FAIL artifact, never a silent
  * skip. (Round 11: 14 construction-crashed queries vanished from the
  * driver's correctness file because failures were stderr-only.)
  */
class VerifySpec extends SparkSpec {

  test("a planted broken query lands in _errors.json; healthy queries still dump") {
    val out = Files.createTempDirectory("verify_spec").toFile.getAbsolutePath
    val good: (SparkSession, String) => DataFrame =
      (s, _) => s.range(3).select(col("id"))
    val brokenConstruct: (SparkSession, String) => DataFrame =
      (_, _) => throw new IllegalStateException("planted construction failure")
    val brokenExec: (SparkSession, String) => DataFrame =
      (s, _) => s.range(3).select((lit(1) / col("id")).as("x"))
        .filter(udf((_: Long) => sys.error("planted runtime failure"): Boolean)
          .apply(col("id")))
    val failures = Verify.dump(spark, "/root/testdata/sf0.001", out,
      Seq("q_good" -> good, "q_dead_plan" -> brokenConstruct,
        "q_dead_task" -> brokenExec))
    assert(failures.keySet == Set("q_dead_plan", "q_dead_task"))
    assert(failures("q_dead_plan").contains("planted construction failure"))
    // the healthy query's parquet exists and reads back
    assert(spark.read.parquet(s"$out/q_good").count() == 3L)
    // the FAIL artifact is on disk and names both dead queries
    val errJson = Files.readString(Paths.get(s"$out/_errors.json"))
    assert(errJson.contains("q_dead_plan") && errJson.contains("q_dead_task"),
      s"_errors.json must name the crashed queries: $errJson")
  }

  test("a clean dump writes an EMPTY _errors.json (absence means the dump died)") {
    val out = Files.createTempDirectory("verify_spec_ok").toFile.getAbsolutePath
    val failures = Verify.dump(spark, "/root/testdata/sf0.001", out,
      Seq("q_ok" -> ((s: SparkSession, _: String) => s.range(1).toDF("id"))))
    assert(failures.isEmpty)
    assert(Files.readString(Paths.get(s"$out/_errors.json")) == "{}")
  }

  test("registry invariants: every oracle keys a registered query; names well-formed") {
    // a stale oracleSql key (e.g. after a rename) would make the driver
    // replay SQL with no Spark dump to compare against — catch it here
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracleSql keys with no registered query: $orphans")
    val badNames = qs.filterNot(_.matches("q[0-9a-z_]+"))
    assert(badNames.isEmpty, s"non-conforming query names: $badNames")
  }
}
