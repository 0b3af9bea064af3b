package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Count-Min sketch (Cormode & Muthukrishnan, J.Alg 2005) as a native
  * mergeable aggregate: `cms_sketch(key, d, w)` folds a stream of long
  * keys into a d×w counter matrix in ONE pass; partial matrices merge
  * by element-wise addition, so only d·w longs cross the shuffle no
  * matter how many distinct keys the input holds — the 100 TB
  * frequency-oracle shape next to [[MisraGriesTopK]] (which answers
  * "what are the heavy keys"; CMS answers "how often is THIS key",
  * for keys chosen after the pass).
  *
  * Unlike Misra–Gries, whose retained SET is merge-order-dependent
  * (queries must gate on order-invariant verdicts), every CMS counter
  * is an exact SUM of indicator variables — the final matrix is
  * bit-identical under any partitioning, merge order, or micro-batch
  * slicing. Point estimates `est(k) = min_j M[j][h_j(k)]` are therefore
  * deterministic values a SQL oracle can recompute exactly (each
  * counter is a COUNT(*) over a hash-bucket predicate), and the
  * classic guarantee `est(k) >= true(k)` (never under) holds by
  * construction. This is also why the streaming twin can share the
  * batch oracle verbatim: a complete-mode drain over any file slicing
  * commits the same matrix.
  *
  * The row hashes are engine-neutral integer arithmetic
  * (`((a_j·(x mod p) + b_j) mod p) mod w`, p = 1e9+7, a_j/b_j fixed
  * literals below) kept small enough that the products stay inside
  * int64 in both Spark and DuckDB (a_j < 2^20, x mod p < 2^30).
  * `Spark.stat.countMinSketch` exists but runs as a separate
  * driver-side pass outside the query plan and uses a private hash —
  * un-replayable and un-composable; this aggregate lives inside
  * Catalyst, composes under groupBy, and registers for SQL.
  *
  * Reference analog: dataset_builder.py:137-158 (exact per-category
  * counts at numpy scale) — the sketch the census needs once the key
  * space outgrows memory.
  */
case class CountMinSketchAgg(
    child: Expression,
    d: Int,
    w: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(d >= 1 && d <= CountMin.A.length,
    s"cms_sketch depth must be in [1, ${CountMin.A.length}], got $d")
  require(w >= 2, s"cms_sketch width must be >= 2, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cms_sketch expects an integral key column, got $other")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Number].longValue()
      var j = 0
      while (j < d) {
        buf(j * w + CountMin.bucket(x, j, w)) += 1L
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(buf.length * 8)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](d * w)
    var i = 0
    while (i < buf.length) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinSketchAgg =
    copy(child = newChild)
  override def prettyName: String = "cms_sketch"
}

object CountMin {
  /** 2-universal-style row-hash parameters, shared verbatim with the
    * DuckDB oracle SQL (see EventQueries.q_evt_countmin). Small enough
    * that `a·(x mod p)` <= 524287·(1e9+7) < 2^60 — no overflow in
    * either engine's int64.
    */
  val P: Long = 1000000007L
  val A: Array[Long] = Array(131L, 1031L, 131071L, 524287L)
  val B: Array[Long] = Array(7L, 911L, 3571L, 77377L)

  /** Row-j bucket of key x; floorMod keeps negative keys lawful (for
    * the non-negative testdata keys it equals plain `%`, which is what
    * the oracle SQL uses).
    */
  def bucket(x: Long, j: Int, w: Int): Int =
    (((A(j) * java.lang.Math.floorMod(x, P) + B(j)) % P) % w).toInt

  /** Column-API entry (the session-registered `cms_sketch` function). */
  def cmsSketch(key: org.apache.spark.sql.Column, d: Int, w: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("cms_sketch", key,
      org.apache.spark.sql.functions.lit(d), org.apache.spark.sql.functions.lit(w))
}
