package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column⇄Expression converters — the
  * supported way for third-party Catalyst expressions to surface as
  * `Column`s without registering a temp function per session (same
  * pattern Spark's own `functions` object uses internally). */
object shim {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Bounded top-k collection as a true mergeable aggregate —
    * Spark's own `CollectTopK` (what pandas-on-Spark `nlargest`
    * compiles to; not exposed through `functions`, and
    * `private[aggregate]`, hence the bridge object in that package).
    * Keeps the k LARGEST child values by the child type's natural
    * ordering in a bounded priority queue, with map-side partials of
    * size ≤ k per (group × partition) — the property that lets a k-NN
    * graph aggregate an n² pair stream while shuffling only k rows
    * per node. Output array order is unspecified; callers re-rank. */
  def collectTopK(child: Column, k: Int): Column =
    toColumn(org.apache.spark.sql.catalyst.expressions.aggregate
      .graftCollectShim.topK(toExpression(child), k))

  /** Register a function builder on an ALREADY-RUNNING session (the
    * extensions hook only fires at session build time). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
