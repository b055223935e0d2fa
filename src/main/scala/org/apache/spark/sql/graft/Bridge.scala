package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's private[sql] Column↔Expression conversions, so the
  * engine's native Catalyst expressions can be exposed as `Column`s.
  * (Standard extension-library technique; the alternative is registering
  * every expression in the FunctionRegistry and round-tripping via
  * `call_function`.)
  */
object Bridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
