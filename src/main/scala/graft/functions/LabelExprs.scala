package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native label-mask expressions (A8's `np.unique` family): the cell
  * count `distinct_nonzero_count(labels)` appears in summarize (A2),
  * sparse filtering (P2) and cleaning (P4); as a built-in composition
  * it is `size(array_distinct(filter(col, x -> x != 0)))` — three
  * passes and two intermediate arrays per row. This expression is one
  * pass, one open-addressing int set, zero boxing, inside whole-stage
  * codegen (doGenCode emits a static call — the StaticInvoke pattern).
  */
case class DistinctNonzeroCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"distinct_nonzero_count expects array<int>, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    LabelExprs.distinctNonzero(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LabelExprs.distinctNonzero($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native per-object area extraction (`np.unique(labels,
  * return_counts=True)` minus background — crop_utils.py /
  * compute_cell_size semantics): `label_areas(labels)` returns
  * `map<label, pixel_count>` with keys sorted ascending. One pass, one
  * open-addressing table, no intermediate arrays — the built-in
  * composition would be explode + groupBy (a SHUFFLE per plane); this
  * keeps area extraction inside whole-stage codegen as a narrow
  * projection, so A1/A3 plans have no typed-map stage.
  */
case class LabelAreas(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    MapType(IntegerType, IntegerType, valueContainsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"label_areas expects array<int>, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    LabelExprs.labelAreas(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LabelExprs.labelAreas($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LabelExprs {

  /** One-pass distinct count of nonzero ints over ArrayData, using an
    * open-addressing table sized to the array (labels are dense small
    * ints in practice; collisions are rare).
    */
  def distinctNonzero(arr: ArrayData): Int = {
    val n = arr.numElements()
    if (n == 0) return 0
    var cap = Integer.highestOneBit(math.max(4, n)) * 2
    val table = new Array[Int](cap) // 0 = empty slot (0 is background anyway)
    val mask = cap - 1
    var count = 0
    var i = 0
    while (i < n) {
      val v = arr.getInt(i)
      if (v != 0) {
        var idx = (v * 0x9E3779B9) >>> (32 - Integer.numberOfTrailingZeros(cap)) & mask
        var found = false
        while (!found && table(idx) != 0) {
          if (table(idx) == v) found = true else idx = (idx + 1) & mask
        }
        if (!found) { table(idx) = v; count += 1 }
      }
      i += 1
    }
    count
  }

  /** One-pass label->area histogram over ArrayData; background (0)
    * excluded, keys sorted ascending for deterministic map layout.
    */
  def labelAreas(arr: ArrayData): org.apache.spark.sql.catalyst.util.MapData = {
    val n = arr.numElements()
    // cap doubles the next power of two; past 2^29 elements that
    // arithmetic overflows Int — fail with a real message instead of a
    // NegativeArraySizeException (a single plane this size is ~2 GiB)
    require(n < (1 << 29),
      s"label_areas supports planes up to ${1 << 29} pixels, got $n")
    val cap = Integer.highestOneBit(math.max(4, n)) * 2
    val keys = new Array[Int](cap) // 0 = empty slot (0 is background anyway)
    val cnts = new Array[Int](cap)
    val mask = cap - 1
    val shift = 32 - Integer.numberOfTrailingZeros(cap)
    var m = 0
    var i = 0
    while (i < n) {
      val v = arr.getInt(i)
      if (v != 0) {
        var idx = (v * 0x9E3779B9) >>> shift & mask
        var found = false
        while (!found && keys(idx) != 0) {
          if (keys(idx) == v) found = true else idx = (idx + 1) & mask
        }
        if (!found) { keys(idx) = v; m += 1 }
        cnts(idx) += 1
      }
      i += 1
    }
    val ks = new Array[Int](m)
    val vs = new Array[Int](m)
    var j = 0; var s = 0
    while (j < cap) {
      if (keys(j) != 0) { ks(s) = keys(j); vs(s) = cnts(j); s += 1 }
      j += 1
    }
    // sort pairs by label id (m = distinct objects per plane, small)
    val order = ks.indices.sortBy(ks)
    val ksS = order.map(ks).toArray
    val vsS = order.map(vs).toArray
    new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(ksS),
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(vsS))
  }

  /** Column-API entry (resolves via GraftExtensions' registration). */
  def distinctNonzeroCount(c: Column): Column =
    org.apache.spark.sql.functions.call_function("distinct_nonzero_count", c)

  /** Column-API entry for [[LabelAreas]]. */
  def labelAreasCol(c: Column): Column =
    org.apache.spark.sql.functions.call_function("label_areas", c)
}
