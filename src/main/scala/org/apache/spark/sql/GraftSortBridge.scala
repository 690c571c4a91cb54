package org.apache.spark.sql

import org.apache.spark.sql.internal.{SortOrder => SortNode}

/** Minimal `private[sql]`-gateway for [[graft.operators.GlobalRank]]:
  * decompose a user-supplied sort `Column` (`col("x").desc`, plain
  * `col("x")`, ...) into its child column + direction + null
  * ordering, using only the public-bytecode `ColumnNode` API
  * (`Column.node`). This is the standard extension-library pattern
  * for the handful of Spark APIs scoped `private[sql]`; kept to ONE
  * tiny object so the internal surface this library touches is
  * auditable at a glance. No Catalyst types leak out — callers get
  * plain `Column`s and booleans. */
object GraftSortBridge {

  /** (child, descending?, nullsFirst?) — a non-sort column defaults
    * to Spark's `asc_nulls_first`. */
  def sortSpec(c: Column): (Column, Boolean, Boolean) = c.node match {
    case s: SortNode =>
      (new Column(s.child),
        s.sortDirection == SortNode.Descending,
        s.nullOrdering == SortNode.NullsFirst)
    case _ => (c, false, true)
  }

  /** Catalyst expression of a Column (classic converter). */
  def expressionOf(c: Column): catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  /** Column over a Catalyst expression (classic wrapper). */
  def columnOf(e: catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
}
