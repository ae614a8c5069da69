package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Two-pointer merge intersection over SORTED, DISTINCT, NULL-FREE
  * `array<bigint>` columns. PRECONDITION (not enforced per row — this
  * is the hot loop): elements must be non-null; the type check cannot
  * see it because the `coalesce(…, array().cast(…))` fallback
  * type-unifies to containsNull=true, and a null slot would read
  * through `getLong` as an arbitrary value instead of erroring. Every
  * caller derives inputs from `sort_array(collect_set(…))`, which is
  * null-free, distinct and sorted by construction.
  *
  * Semantically identical to `array_intersect(a, b)` when both
  * inputs are sorted and duplicate-free (the `sort_array(collect_set(…))`
  * adjacency idiom guarantees both): `array_intersect` preserves the
  * first argument's element order, which for a sorted input IS sorted
  * order, so outputs are element-for-element equal. The difference is
  * cost: `ArrayIntersect` builds an OpenHashSet over one side PER ROW —
  * on the triangle-closing stream that is Σ od² hash inserts and an
  * allocation per edge — while the merge walk is branch-predictable,
  * allocation-free until the (small) result copy, and codegen'd.
  * Profiled on graph_triangles sf0.1: the closing stage dominated the
  * query (~2.0 s of 3.1 s) under `array_intersect`. */
object SortedArrayUtil {
  def intersectLL(a: ArrayData, b: ArrayData): ArrayData = {
    val na = a.numElements()
    val nb = b.numElements()
    val out = new Array[Long](math.min(na, nb))
    var i = 0; var j = 0; var k = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { out(k) = x; k += 1; i += 1; j += 1 }
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (k == out.length) out else java.util.Arrays.copyOf(out, k))
  }

  /** |a ∩ b| without materializing the intersection — the jaccard
    * numerator. */
  def intersectCountLL(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var k = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { k += 1; i += 1; j += 1 }
    }
    k
  }
}

case class SortedIntersect(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sorted_intersect"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val bad = Seq(left, right).map(_.dataType).collectFirst {
      case t if !t.isInstanceOf[ArrayType] ||
        t.asInstanceOf[ArrayType].elementType != LongType => t
    }
    bad match {
      case Some(t) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(
          s"sorted_intersect expects array<bigint> children, got ${t.simpleString}")
      case None =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedArrayUtil.intersectLL(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedArrayUtil.intersectLL($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersect =
    copy(left = newLeft, right = newRight)
}

case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "sorted_intersect_count"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val bad = Seq(left, right).map(_.dataType).collectFirst {
      case t if !t.isInstanceOf[ArrayType] ||
        t.asInstanceOf[ArrayType].elementType != LongType => t
    }
    bad match {
      case Some(t) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(
          s"sorted_intersect_count expects array<bigint> children, got ${t.simpleString}")
      case None =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedArrayUtil.intersectCountLL(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedArrayUtil.intersectCountLL($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedArrayExpressions {
  /** `array_intersect(a, b)` for sorted distinct `array<bigint>` inputs,
    * as a tight merge walk. */
  def sortedIntersect(a: Column, b: Column): Column =
    shim.toColumn(SortedIntersect(shim.toExpression(a), shim.toExpression(b)))

  /** `size(array_intersect(a, b))` (as bigint) for sorted distinct
    * `array<bigint>` inputs — no intersection array is built. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    shim.toColumn(SortedIntersectCount(
      shim.toExpression(a), shim.toExpression(b)))
}
