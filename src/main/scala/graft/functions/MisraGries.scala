package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary as a native mergeable aggregate
  * (`mg_topk(token, k)`) — the engine's first
  * [[TypedImperativeAggregate]], i.e. a true SINGLE-PASS distributed
  * sketch: every partition folds its rows into a ≤ k-counter summary,
  * partial summaries merge associatively on the reduce side, and only
  * k (token, count) pairs ever cross the shuffle — the 100 TB shape
  * for "what dominates this corpus", vs. the groupBy-everything exact
  * census whose shuffle is vocabulary-sized, or
  * `DataFrame.stat.countMinSketch`, which is a separate driver-side
  * pass outside the query plan.
  *
  * Algorithm (Misra & Gries 1982; merge rule from Agarwal, Cormode,
  * Huang, Phillips, Wei, Yi, "Mergeable Summaries", PODS 2012): update
  * increments a held counter, inserts while fewer than k counters are
  * held, else decrements ALL counters by one (dropping zeros); merge
  * sums counters pairwise and, when more than k survive, subtracts the
  * (k+1)-th largest count from every counter and drops the
  * non-positive. Guarantees, INDEPENDENT of partitioning and merge
  * order: every estimate e(t) satisfies
  * `true(t) − N/(k+1) ≤ e(t) ≤ true(t)`, and any token with
  * `true(t) > N/(k+1)` is present in the final summary. Queries must
  * gate only on these order-invariant facts (presence above the
  * guarantee threshold + the error interval), never on raw summary
  * contents — the q_txt_heavy_hitters verdict-column discipline.
  *
  * Reference analog: dataset_builder.py:137-158 summarizes per-category
  * counts exactly at numpy scale; this is the sketch the same census
  * needs once the key space outgrows memory.
  */
case class MisraGriesTopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(k >= 1, s"mg_topk needs k >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mg_topk expects a string token column, got $other")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("token", StringType, nullable = false),
      StructField("est", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val key = v.asInstanceOf[UTF8String]
    buf.get(key) match {
      case Some(c) => buf.update(key, c + 1); buf
      case None if buf.size < k =>
        // clone: the incoming UTF8String aliases reused row memory
        buf.update(key.clone(), 1L); buf
      case None =>
        // decrement-all round: the arriving token and one unit of every
        // held counter cancel (k+1 units total -> the N/(k+1) bound)
        val dead = buf.iterator.collect { case (t, 1L) => t }.toList
        buf.mapValuesInPlace((_, c) => c - 1)
        dead.foreach(buf.remove)
        buf
    }
  }

  override def merge(b1: mutable.HashMap[UTF8String, Long],
      b2: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    b2.foreach { case (t, c) => b1.update(t, b1.getOrElse(t, 0L) + c) }
    if (b1.size <= k) return b1
    val counts = b1.values.toArray
    java.util.Arrays.sort(counts)
    val thresh = counts(counts.length - 1 - k) // (k+1)-th largest
    val out = mutable.HashMap.empty[UTF8String, Long]
    b1.foreach { case (t, c) => if (c > thresh) out.update(t, c - thresh) }
    out
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    // deterministic output ORDER (binary-collated token on count ties)
    // even though the retained SET is merge-order-dependent
    val sorted = buf.toArray.sortWith { case ((t1, c1), (t2, c2)) =>
      c1 > c2 || (c1 == c2 && t1.compareTo(t2) < 0)
    }
    new GenericArrayData(sorted.map { case (t, c) =>
      InternalRow(t, c)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val bytes = t.getBytes
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesTopK =
    copy(child = newChild)
  override def prettyName: String = "mg_topk"
}

object MisraGriesTopK {
  /** Column-API entry (the session-registered `mg_topk` function). */
  def mgTopK(token: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("mg_topk", token,
      org.apache.spark.sql.functions.lit(k))
}
