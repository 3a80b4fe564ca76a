// Column <-> Expression bridge. Spark 4 made these conversions
// private[sql]; custom Catalyst expressions (graft.functions.DotProduct)
// need them, so this one object lives in the sql package — the standard
// extension pattern when not going through SparkSessionExtensions
// (our expressions must work on driver-created sessions we don't build).
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object Bridge {
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
}
