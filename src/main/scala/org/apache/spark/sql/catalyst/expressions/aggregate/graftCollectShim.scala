package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

/** `CollectTopK` is `private[aggregate]`, so the one-line constructor
  * bridge lives here; everything graft-facing goes through
  * [[org.apache.spark.sql.graft.shim.collectTopK]]. Same re-export
  * pattern as the sql/graft shim — no Spark internals are modified. */
private[sql] object graftCollectShim {
  def topK(child: Expression, k: Int): Expression =
    CollectTopK(child, k).toAggregateExpression()
}
