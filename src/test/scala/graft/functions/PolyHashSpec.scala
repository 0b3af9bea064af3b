package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PolyHash's load-bearing contract: the native single-pass code-point
  * fold equals the Column construction it replaced
  * (`aggregate(transform(split(tok, ""), ascii), …)`) on every script
  * class the corpus carries — ASCII, Latin-1, CJK multi-byte, the
  * empty string — plus a reference fold in plain Scala. Both the
  * interpreted path and whole-stage codegen are exercised (the
  * DataFrame run compiles doGenCode; the direct eval covers
  * nullSafeEval).
  */
class PolyHashSpec extends SparkSpec {

  private val P = 1000000007L

  private def reference(s: String): Long = {
    var acc = 0L
    s.codePoints().toArray.foreach { cp => acc = (acc * 31 + cp) % P }
    acc
  }

  test("native fold equals the Column form and the plain-Scala reference") {
    import spark.implicits._
    val samples = Seq("", "a", "abc", "hash value spark",
      "café", "己己b", "中文 token", "mixed ü中 x",
      "😀 emoji")  // non-BMP: 4-byte UTF-8
    val df = samples.toDF("s")
    val rows = df.select(
        col("s"),
        call_function("poly_hash", col("s"), lit(31L), lit(P)).as("native"),
        aggregate(transform(split(col("s"), ""), c => ascii(c).cast("long")),
          lit(0L), (acc, cp) => pmod(acc * 31 + cp, lit(P))).as("columnar"))
      .collect()
    rows.foreach { r =>
      val s = r.getString(0)
      assert(r.getLong(1) == reference(s), s"native fold diverges on '$s'")
      // the columnar form splits to chars; for BMP strings the two agree
      if (s.codePoints().count() == s.length)
        assert(r.getLong(1) == r.getLong(2), s"native vs columnar on '$s'")
    }
  }

  test("null propagates; direct eval matches the codegen'd DataFrame path") {
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow}
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val e = PolyHash(BoundReference(0, StringType, nullable = true), 31L, P)
    val row = new GenericInternalRow(1)
    row.update(0, null)
    assert(e.eval(row) == null)
    row.update(0, UTF8String.fromString("spark"))
    assert(e.eval(row) == reference("spark"))
  }
}
