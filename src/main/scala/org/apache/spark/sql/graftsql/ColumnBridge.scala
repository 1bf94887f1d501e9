package org.apache.spark.sql.graftsql

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.internal.{SortOrder => NodeSortOrder}

/** Column ↔ Expression bridge. Spark 4's `Column` wraps a ColumnNode and
  * the classic converters live behind `private[sql]`, so library code
  * that must inspect a caller-supplied Column (e.g. [[graft.ops.DenseId]]
  * unwrapping a `.asc` SortOrder to reuse its child as a plain key
  * column) goes through this package-insider shim — the same pattern as
  * [[org.apache.spark.graftspark.ListenerBusAccess]]. */
object ColumnBridge {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Strip a `.asc` (ascending nulls-first — the default sort order)
    * wrapper off a caller-supplied Column, returning the bare key
    * column. Plain columns pass through; any other direction or null
    * ordering is rejected — callers encode that exact total order in
    * value comparisons, so a silently dropped `desc` would corrupt
    * their ordering. */
  def requireAscKey(c: Column): Column = c.node match {
    case so: NodeSortOrder =>
      require(so.sortDirection == NodeSortOrder.Ascending &&
        so.nullOrdering == NodeSortOrder.NullsFirst,
        s"expected a plain or ascending nulls-first column, got $c")
      new Column(so.child)
    case _ => c
  }
}
