package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column↔Expression converters (Spark 4's
  * Connect refactor hid the classic `Column(expr)` constructor). Lives in a
  * subpackage of `org.apache.spark.sql` purely for access; the standard
  * pattern for libraries that ship native Catalyst expressions without
  * forcing per-session function registration. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
