package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: MinHash jaccard estimate — the fraction
  * of positions where two signature arrays (array<bigint>) agree. Runs
  * in whole-stage codegen as one fused primitive loop; replaces a
  * Scala UDF that paid ArrayData -> Seq conversion per candidate pair
  * on the LSH hot path (every surviving band-join row evaluates this).
  */
case class MinhashEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_est expects array<bigint>, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    if (n == 0) null
    else {
      var eq = 0
      var i = 0
      while (i < n) {
        if (a.getLong(i) == b.getLong(i)) eq += 1
        i += 1
      }
      java.lang.Double.valueOf(eq.toDouble / n)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val eq = ctx.freshName("eq")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |if ($n == 0) { ${ev.isNull} = true; } else {
         |  int $eq = 0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.getLong($i) == $b.getLong($i)) $eq++;
         |  }
         |  ${ev.value} = ((double) $eq) / $n;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression)
      : Expression = copy(left = newLeft, right = newRight)
}

object MinhashEstimate {
  /** Column-API entry point via the `minhash_est` SQL registration. */
  def minhashEst(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("minhash_est", a, b)
}
