package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between raw Catalyst Expressions and the Spark 4 Column API
  * (`ExpressionUtils` is private[sql]; extension libraries conventionally
  * shim it from inside the package — same pattern as Delta/Frameless). */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
