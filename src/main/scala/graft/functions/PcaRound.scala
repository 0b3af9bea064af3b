package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: one quantized power-iteration round's
  * per-row contribution vector, fused into a single primitive loop —
  *
  *   cv_i = vec_i − mu_i                    (mean-centering)
  *   [deflation] d1 = Σ cv_i·v1_i ;  cv_i ← cv_i − d1·v1_i
  *   dq  = floor(1e6 · Σ cv_i·w_i)          (quantized projection)
  *   out_j = floor(dq · cv_j)               (exact-long contribution)
  *
  * All accumulations are strictly left-to-right doubles — bit-identical
  * to the `aggregate(zip_with(...))` composition it replaces and to the
  * DuckDB oracle's `list_sum(list_transform(range(...)))` replay, so
  * swapping it in changes no oracle-checked value.
  *
  * Why native: the higher-order-function form runs interpreted (boxed
  * lambdas + a per-row array allocation per operator — measured
  * ~0.3 ms/row, 47 s for q_emb_pca at sf1), and unrolling d=64 terms
  * into scalar Add chains moves the cost into whole-stage-codegen
  * COMPILATION instead (~1 s per generated plan × 8 power-round plans).
  * A loop inside one expression is both: tiny generated source and
  * primitive-speed execution.
  *
  * The mean / iterate / deflation vectors are constructor constants
  * (codegen reference objects), mirroring [[MinhashSignature]]'s
  * hash-parameter treatment.
  */
case class PcaRound(child: Expression, mu: Array[Double], w: Array[Double],
                    v1: Option[Array[Double]])
    extends UnaryExpression {

  private val d = mu.length
  require(w.length == d && v1.forall(_.length == d),
    s"pca_round parameter vectors must all have length $d")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pca_round expects array<double>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val cv = new Array[Double](d)
    var i = 0
    while (i < d) { cv(i) = arr.getDouble(i) - mu(i); i += 1 }
    v1.foreach { dir =>
      var d1 = 0.0
      i = 0
      while (i < d) { d1 += cv(i) * dir(i); i += 1 }
      i = 0
      while (i < d) { cv(i) = cv(i) - d1 * dir(i); i += 1 }
    }
    var dot = 0.0
    i = 0
    while (i < d) { dot += cv(i) * w(i); i += 1 }
    val dq = java.lang.Math.floor(dot * 1000000d)
    val out = new Array[Long](d)
    i = 0
    while (i < d) { out(i) = java.lang.Math.floor(dq * cv(i)).toLong; i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val muRef = ctx.addReferenceObj("pcaMu", mu, "double[]")
    val wRef = ctx.addReferenceObj("pcaW", w, "double[]")
    val v1Ref = v1.map(a => ctx.addReferenceObj("pcaV1", a, "double[]"))
    nullSafeCodeGen(ctx, ev, c => {
      val cv = ctx.freshName("cv")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val dq = ctx.freshName("dq")
      val out = ctx.freshName("out")
      val deflate = v1Ref.map { ref =>
        val d1 = ctx.freshName("d1")
        val k = ctx.freshName("k")
        s"""
           |double $d1 = 0.0;
           |for (int $k = 0; $k < $d; $k++) { $d1 += $cv[$k] * $ref[$k]; }
           |for (int $k = 0; $k < $d; $k++) { $cv[$k] = $cv[$k] - $d1 * $ref[$k]; }
         """.stripMargin
      }.getOrElse("")
      s"""
         |double[] $cv = new double[$d];
         |for (int $i = 0; $i < $d; $i++) { $cv[$i] = $c.getDouble($i) - $muRef[$i]; }
         |$deflate
         |double $dot = 0.0;
         |for (int $i = 0; $i < $d; $i++) { $dot += $cv[$i] * $wRef[$i]; }
         |double $dq = java.lang.Math.floor($dot * 1000000.0);
         |long[] $out = new long[$d];
         |for (int $i = 0; $i < $d; $i++) {
         |  $out[$i] = (long) java.lang.Math.floor($dq * $cv[$i]);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PcaRound {
  /** Column-API entry point (resolves through the function registered
    * by graft.core.GraftExtensions — public API only). The parameter
    * vectors travel as array literals and are unpacked at resolution.
    */
  def pcaRound(vec: Column, mu: Array[Double], w: Array[Double],
               v1: Option[Array[Double]] = None): Column = {
    import org.apache.spark.sql.functions.{array, call_function, lit}
    def arrLit(a: Array[Double]): Column = array(a.map(lit).toSeq: _*)
    val args = Seq(vec, arrLit(mu), arrLit(w)) ++ v1.map(arrLit)
    call_function("pca_round", args: _*)
  }
}
