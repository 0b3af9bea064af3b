package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: a `numHashes`-long MinHash signature
  * from a document's 64-bit shingle-hash array (Broder '97; k
  * universal hash functions `a*x + b mod P` over the folded shingle
  * hashes, P a 31-bit prime). One fused primitive double loop in
  * whole-stage codegen.
  *
  * This replaces the Scala UDF signature pass, which re-tokenized the
  * TEXT per row (split, per-shingle string slice/mkString/char-hash)
  * and paid the encoder round trip — the dominant cost of the MinHash
  * pipeline at scale (measured 35 s of q_dedup_minhash_pairs' sf1
  * run). The shingle hashes come from the same codegen'd zip-slice
  * construction the exact-Jaccard path uses ([[Dedup.shingleHashCol]]),
  * so text is split and hashed once, in-plan, with no boxing.
  *
  * Empty input (doc shorter than the shingle width) yields the
  * all-MaxValue signature — same convention as the UDF it replaces:
  * two too-short docs estimate as jaccard 1, and the exact verify
  * stage downstream rejects them (uni = 0 filter).
  */
case class MinhashSignature(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint>, got $other")
  }

  @transient private lazy val (paramA, paramB) = {
    val rng = new scala.util.Random(seed)
    val a = new Array[Long](numHashes)
    val b = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      a(i) = 1 + rng.nextLong(MinhashSignature.Prime - 1)
      b(i) = rng.nextLong(MinhashSignature.Prime)
      i += 1
    }
    (a, b)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = java.lang.Math.floorMod(arr.getLong(i), MinhashSignature.Prime)
      var f = 0
      while (f < numHashes) {
        val v = java.lang.Math.floorMod(paramA(f) * x + paramB(f),
          MinhashSignature.Prime)
        if (v < sig(f)) sig(f) = v
        f += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhParamA", paramA, "long[]")
    val bRef = ctx.addReferenceObj("mhParamB", paramB, "long[]")
    val prime = MinhashSignature.Prime
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val f = ctx.freshName("f")
      val x = ctx.freshName("x")
      val v = ctx.freshName("v")
      s"""
         |int $n = $c.numElements();
         |long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $x = java.lang.Math.floorMod($c.getLong($i), ${prime}L);
         |  for (int $f = 0; $f < $numHashes; $f++) {
         |    long $v = java.lang.Math.floorMod($aRef[$f] * $x + $bRef[$f], ${prime}L);
         |    if ($v < $sig[$f]) $sig[$f] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashSignature {
  val Prime = 2038074743L // large prime < 2^31, shared with Dedup

  /** Column-API entry point (resolves through the function registered
    * by graft.core.GraftExtensions — public API only).
    */
  def minhashSig(shingleHashes: Column, numHashes: Int, seed: Long): Column =
    org.apache.spark.sql.functions.call_function("minhash_sig",
      shingleHashes, org.apache.spark.sql.functions.lit(numHashes),
      org.apache.spark.sql.functions.lit(seed))
}
