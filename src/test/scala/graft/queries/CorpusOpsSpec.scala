package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-7 corpus operators: contract invariants + the plan shapes
  * that carry the 100 TB story (the DuckDB oracle hash-checks the
  * values; these pin the semantics and the physical plan).
  */
class CorpusOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("incremental dedup: kept docs are novel batch keepers only") {
    val out = graft.SparkEntry.queries("q_dedup_incremental")(spark, dir)
    val rows = out.collect()
    // every kept doc is from the batch slice
    assert(rows.forall(_.getLong(0) % 10 == 9))
    // kept fingerprints are unique (within-batch keep-first applied)
    val fps = rows.map(_.getString(1))
    assert(fps.distinct.length == fps.length)
    // no kept fingerprint exists in the store slice
    val docs = Q.t(spark, dir, "documents")
      .select(col("doc_id"),
        md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")).as("fp"))
    val storeFps = docs.filter(col("doc_id") % 10 =!= 9)
      .select("fp").distinct().collect().map(_.getString(0)).toSet
    assert(fps.forall(!storeFps(_)), "a kept doc collides with the store")
  }

  test("sequence packing: blocks are contiguous and cover the corpus per language") {
    val out = graft.SparkEntry.queries("q_txt_pack")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, first, last, nBlocks) =
        (r.getAs[Int]("n_tokens"), r.getAs[Long]("first_block"),
          r.getAs[Long]("last_block"), r.getAs[Long]("n_blocks"))
      assert(first <= last && nBlocks == last - first + 1)
      // a doc spans at most ceil(n/budget)+1 blocks (straddle bound)
      assert(nBlocks <= n / 1024 + 2)
    }
    // per language, consecutive docs abut: next first_block is the same
    // as or directly adjacent to the previous last_block (concat law)
    out.groupBy(_.getAs[String]("lang")).foreach { case (_, rs) =>
      rs.sortBy(_.getAs[Long]("doc_id")).toSeq.sliding(2).foreach {
        case Seq(a, b) =>
          val prevEnd = a.getAs[Long]("last_block")
          val nextStart = b.getAs[Long]("first_block")
          assert(nextStart == prevEnd || nextStart == prevEnd + 1,
            s"gap between packed docs: $prevEnd -> $nextStart")
        case _ =>
      }
    }
  }

  test("stratified sample: exact per-language quota, deterministic") {
    val out = graft.SparkEntry.queries("q_txt_sample_stratified")(spark, dir)
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totalPerLang = Q.t(spark, dir, "documents").groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    totalPerLang.foreach { case (lang, n) =>
      assert(counts(lang) == math.min(50L, n), s"quota broken for $lang")
    }
    // deterministic across runs
    val again = graft.SparkEntry.queries("q_txt_sample_stratified")(spark, dir)
    assert(out.collect().map(_.toString).toSeq ==
      again.collect().map(_.toString).toSeq)
  }

  test("redaction: fingerprint changes iff something was redacted") {
    val out = graft.SparkEntry.queries("q_txt_redact")(spark, dir)
    val plainFp = Q.t(spark, dir, "documents")
      .select(col("doc_id"), md5(col("text")).as("fp_plain"))
    val joined = out.join(plainFp, "doc_id").collect()
    assert(joined.exists(_.getAs[Int]("n_redacted") > 0), "fixture has hits")
    joined.foreach { r =>
      val changed = r.getAs[String]("fp_redacted") != r.getAs[String]("fp_plain")
      assert(changed == (r.getAs[Int]("n_redacted") > 0))
    }
  }

  test("scale shapes: pack window partitions by lang; incremental joins on fp only") {
    val pack = graft.SparkEntry.queries("q_txt_pack")(spark, dir)
      .queryExecution.executedPlan.toString
    // the cumsum window must be partitioned (parallel), never global
    assert(pack.contains("hashpartitioning(lang"), s"pack plan not lang-partitioned:\n$pack")
    val inc = graft.SparkEntry.queries("q_dedup_incremental")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(inc.contains("LeftAnti"), "incremental dedup must be an anti join")
    // the scan feeding the join carries only doc_id + text (pruned)
    assert(inc.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"unpruned scan in incremental dedup:\n$inc")
  }
}
