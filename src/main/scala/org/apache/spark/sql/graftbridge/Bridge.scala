package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made `Column` backend-agnostic: `Column.expr` and
  * `new Column(expr)` are gone, replaced by the `private[sql]`
  * `org.apache.spark.sql.classic.ExpressionUtils`. This bridge (placed
  * under the org.apache.spark.sql package for access) is the one sanctioned
  * crossing point the engine uses to lift custom Catalyst Expressions into
  * Columns.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
