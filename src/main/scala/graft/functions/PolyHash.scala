package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial code-point hash `((…(0·b + cp₁)·b + cp₂…) mod m)` as a
  * native codegen'd expression — the single-pass form of the Column
  * construction `aggregate(transform(split(tok, ""), ascii), …)`,
  * which materializes an array of single-char STRINGS per token and
  * re-walks it per fold step. This expression folds the UTF-8 bytes
  * directly (decoding code points in place, no splitting, no array,
  * no per-char UTF8String allocation), and `doGenCode` inlines the
  * loop into whole-stage codegen so the retrieval queries' token
  * embedding stays in one generated function.
  *
  * Semantics contract (hash-gate critical): identical to the Column
  * form AND to the DuckDB replay `list_reduce(list_prepend(0,
  * list_transform(string_split(tok, ''), ord)), (a,c) -> (a·b+c) % m)`
  * — all three fold UNICODE CODE POINTS, with the empty string
  * hashing to 0. Exercised by the q_sim_maxsim / q_emb_meanpool_nn
  * oracles over the mixed-script corpus (zh documents cover multi-byte
  * code points).
  */
case class PolyHash(child: Expression, base: Long, mod: Long)
  extends UnaryExpression {

  require(mod > 1, s"poly_hash modulus must be > 1, got $mod")
  require(base > 0 && base < Int.MaxValue, s"poly_hash base out of range: $base")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"poly_hash expects a string column, got $other")
  }
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String], base, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = PolyHash.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $cls.hash($c, ${base}L, ${mod}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
  override def prettyName: String = "poly_hash"
}

object PolyHash {
  /** Fold code points of the UTF-8 payload without materializing a
    * String: ASCII bytes fast-path, multi-byte sequences decoded
    * manually (the corpus contract is well-formed UTF-8 — parquet
    * strings are).
    */
  def hash(s: UTF8String, base: Long, mod: Long): Long = {
    val bytes = s.getBytes
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      val b0 = bytes(i) & 0xff
      var cp = 0
      if (b0 < 0x80) { cp = b0; i += 1 }
      else if (b0 < 0xe0) {
        cp = ((b0 & 0x1f) << 6) | (bytes(i + 1) & 0x3f); i += 2
      } else if (b0 < 0xf0) {
        cp = ((b0 & 0x0f) << 12) | ((bytes(i + 1) & 0x3f) << 6) |
          (bytes(i + 2) & 0x3f); i += 3
      } else {
        cp = ((b0 & 0x07) << 18) | ((bytes(i + 1) & 0x3f) << 12) |
          ((bytes(i + 2) & 0x3f) << 6) | (bytes(i + 3) & 0x3f); i += 4
      }
      acc = (acc * base + cp) % mod
    }
    acc
  }
}
