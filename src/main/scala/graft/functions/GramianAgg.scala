package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** One-pass quantised Gramian (outer-product sum) accumulation.
  *
  * Covariance over a d-dim embedding corpus needs Σ cxᵢ·cxⱼ for all
  * (i, j). Expressed with built-ins that is a posexplode (n×d rows) +
  * self-join on vec_id (n×d² rows) + d²-group aggregate — the join
  * output stream is 4,096× the row count at d = 64. This aggregate
  * accumulates the full d×d Gramian per input ROW into a d²-long
  * buffer (32 KB at d = 64): n rows stream through once, partials
  * merge element-wise, and only d² longs ever shuffle. At 100 TB this
  * is how covariance is actually computed (one pass, fixed-size
  * state); the explode/join shape was measuring the amplifier.
  *
  * Quantisation matches the oracle bit-for-bit: each term is
  * floor((cxᵢ·cxⱼ)·1e9) summed exactly in Long — identical values to
  * the prior DECIMAL(28,0) sums. Overflow is a loud error, not a
  * silent wraparound: coordinates are NOT assumed bounded (centred
  * values can exceed 1, so a term can pass 1e9), hence update/merge
  * accumulate with Math.addExact — a corpus big or wide enough to
  * overflow the Long sums throws ArithmeticException instead of
  * returning a wrapped covariance (advice r7).
  */
case class GramianSums(
    child: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(d > 0, s"gramian_sums d must be positive, got $d")

  // analysis-time type gate (review r11): update() reads doubles from
  // the raw ArrayData, so an array<float> child would decode garbage
  // 8-byte reads instead of failing loudly
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"gramian_sums expects array<double>, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * d)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == d,
        s"gramian_sums: vector of ${arr.numElements()} elements, expected $d")
      val xs = new Array[Double](d)
      var i = 0
      while (i < d) { xs(i) = arr.getDouble(i); i += 1 }
      i = 0
      while (i < d) {
        val xi = xs(i)
        val row = i * d
        var j = 0
        while (j < d) {
          // the quantised term must itself fit a Long BEFORE toLong:
          // Double→Long saturates silently (and NaN maps to 0), so a
          // coordinate magnitude past ~3e4 would corrupt sums without
          // addExact ever firing (review finding r8). Both overflow
          // modes now fail loudly.
          val t = math.floor(xi * xs(j) * 1e9)
          if (!(t >= -9.223372036854775e18 && t <= 9.223372036854775e18))
            throw new ArithmeticException(
              s"gramian_sums term overflow: ${xi * xs(j)} quantised to $t")
          buffer(row + j) = Math.addExact(buffer(row + j), t.toLong)
          j += 1
        }
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) {
      buffer(i) = Math.addExact(buffer(i), other(i)); i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer.clone())

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): GramianSums =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramianSums =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GramianSums =
    copy(child = newChild)
  override def prettyName: String = "gramian_sums"
}

object GramianSums {
  /** `gramian_sums(vec, d) -> array<long>` of d² quantised
    * outer-product sums (row-major), over array<double> input. */
  def gramianSums(c: Column, d: Int): Column =
    shim.toColumn(GramianSums(shim.toExpression(c), d).toAggregateExpression())
}
