package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between public `Column` and Catalyst `Expression` for Spark 4,
  * where `Column.expr` / `new Column(expr)` are no longer public. Lives in
  * an `org.apache.spark.sql` subpackage to access `private[sql]`
  * `ExpressionUtils` — the standard pattern for Catalyst-level extensions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly convert a Column's node tree to a Catalyst Expression.
    * `expression` above wraps lazily (ColumnNodeExpression) — fine inside
    * DataFrame plans, but Unevaluable when the result must be a
    * standalone expression (e.g. a FunctionRegistry builder's return
    * value). This runs the classic converter immediately.
    */
  def expressionEager(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
