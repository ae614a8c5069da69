package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Dense-bitset set operations for small element universes.
  *
  * When a shingle/token universe fits a few KB (dictionary-indexed), an
  * all-pairs set-intersection count is a popcount loop over packed
  * longs — no shuffle, no hash probes. Used by the exact-Jaccard
  * dedup when its universe check passes (Dedup.ngramJaccard); the
  * join-based path remains the general-universe fallback.
  */
object BitsetUtil {
  def fromPositions(positions: ArrayData, nWords: Int): ArrayData = {
    val words = new Array[Long](nWords)
    var i = 0
    val n = positions.numElements()
    while (i < n) {
      val p = positions.getInt(i)
      words(p >>> 6) |= (1L << (p & 63))
      i += 1
    }
    new GenericArrayData(words)
  }

  def intersectCount(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += java.lang.Long.bitCount(a.getLong(i) & b.getLong(i))
      i += 1
    }
    acc
  }
}

/** `positions_to_bitset(array<int>, nWords) -> array<long>` */
case class PositionsToBitset(child: Expression, nWords: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "positions_to_bitset"

  override protected def nullSafeEval(input: Any): Any =
    BitsetUtil.fromPositions(input.asInstanceOf[ArrayData], nWords)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BitsetUtil.fromPositions($c, $nWords)")

  override protected def withNewChildInternal(newChild: Expression): PositionsToBitset =
    copy(child = newChild)
}

/** `bitset_intersect_count(array<long>, array<long>) -> long` */
case class BitsetIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "bitset_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    BitsetUtil.intersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.BitsetUtil.intersectCount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitsetIntersectCount =
    copy(left = newLeft, right = newRight)
}

object BitsetFunctions {
  def positionsToBitset(c: Column, nWords: Int): Column =
    shim.toColumn(PositionsToBitset(shim.toExpression(c), nWords))
  def bitsetIntersectCount(a: Column, b: Column): Column =
    shim.toColumn(BitsetIntersectCount(shim.toExpression(a), shim.toExpression(b)))
}
