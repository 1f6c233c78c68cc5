package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge for Spark 4's split Column API.
  *
  * The conversion helpers live in `private[sql]` scope since the Connect
  * refactor; this package-placed shim is the standard technique for
  * libraries that define native Catalyst expressions (classic sessions
  * only, which is all this engine targets).
  */
object Bridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
