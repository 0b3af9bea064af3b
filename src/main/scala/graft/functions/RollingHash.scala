package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Rabin-Karp rolling hash — every k-char
  * polynomial hash `(c_0 B^{k-1} + ... + c_{k-1}) mod M` of a string,
  * as array<bigint>. This is the document-fingerprinting primitive
  * (k-gram fingerprints, winnowing input).
  *
  * The point of being a custom expression: the engine computes the
  * whole array in O(n) with the ROLLING recurrence
  * `h' = (h - c_out B^{k-1}) B + c_in  (mod M)` inside whole-stage
  * codegen, while the oracle-replayable semantics stay the naive
  * per-position polynomial (what DuckDB recomputes in O(n k)) — same
  * values, engine-efficient computation.
  */
case class RollingHash(child: Expression, k: Int, base: Long, mod: Long)
    extends UnaryExpression {

  require(k >= 1 && base > 1 && mod > base, s"bad rolling-hash params k=$k B=$base M=$mod")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash expects string, got ${child.dataType}")

  /** B^(k-1) mod M, precomputed once. */
  private val outPow: Long = {
    var p = 1L
    var i = 1
    while (i < k) { p = p * base % mod; i += 1 }
    p
  }

  override def nullSafeEval(input: Any): Any = {
    // Codepoint units, not UTF-16 code units: `ord(text[i])` semantics —
    // a non-BMP char (emoji, astral CJK) is ONE gram element, matching
    // the oracle's per-codepoint polynomial.
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n = cps.length
    if (n < k) new GenericArrayData(Array.empty[Long])
    else {
      val out = new Array[Long](n - k + 1)
      var h = 0L
      var j = 0
      while (j < k) { h = (h * base + cps(j)) % mod; j += 1 }
      out(0) = h
      var i = 1
      while (i <= n - k) {
        h = (h - cps(i - 1) * outPow % mod + mod) % mod
        h = (h * base + cps(i + k - 1)) % mod
        out(i) = h
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arrCls = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, c => {
      val cps = ctx.freshName("cps")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |int[] $cps = $c.toString().codePoints().toArray();
         |int $n = $cps.length;
         |if ($n < $k) {
         |  ${ev.value} = new $arrCls(new long[0]);
         |} else {
         |  long[] $out = new long[$n - $k + 1];
         |  long $h = 0L;
         |  for (int $j = 0; $j < $k; $j++) { $h = ($h * ${base}L + $cps[$j]) % ${mod}L; }
         |  $out[0] = $h;
         |  for (int $i = 1; $i <= $n - $k; $i++) {
         |    $h = ($h - (long) $cps[$i - 1] * ${outPow}L % ${mod}L + ${mod}L) % ${mod}L;
         |    $h = ($h * ${base}L + $cps[$i + $k - 1]) % ${mod}L;
         |    $out[$i] = $h;
         |  }
         |  ${ev.value} = new $arrCls($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  /** Column-API entry via the `rolling_hash` SQL registration. */
  def rollingHash(text: Column, k: Int, base: Long = 31L,
                  mod: Long = 1000000007L): Column =
    org.apache.spark.sql.functions.call_function("rolling_hash", text,
      org.apache.spark.sql.functions.lit(k),
      org.apache.spark.sql.functions.lit(base),
      org.apache.spark.sql.functions.lit(mod))
}
