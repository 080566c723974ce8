package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between `Column` and Catalyst `Expression` for Spark 4, where
  * the converters live behind `private[sql]`. This is the supported idiom
  * for libraries that define custom Catalyst expressions (the public
  * Column API intentionally hides the Expression plane).
  */
object GraftSqlShims {
  def columnOf(e: Expression): Column = ExpressionUtils.column(e)
  def expressionOf(c: Column): Expression = ExpressionUtils.expression(c)
}
