package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's private[sql] Column<->Expression converters — the
  * standard extension-library technique for exposing custom Catalyst
  * expressions through the public Column API (Spark 4 moved the classic
  * converters behind private[sql]). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager Column → catalyst Expression conversion. [[expression]] returns
    * a LAZY `ColumnNodeExpression` wrapper that still holds the public-API
    * column node — fine inside Dataset transformations (the analyzer
    * unwraps it), but a trap when the Expression is embedded in a custom
    * LogicalPlan whose physical exec serializes its expressions into task
    * closures: the wrapper's internal node graph (e.g.
    * `sql.internal.SortOrder$NullsLast$`) is not serializable. This runs
    * the real converter, yielding a pure catalyst tree (a catalyst
    * `SortOrder` for `.desc`/`.asc` columns). */
  def catalystExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)
}
