package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column <-> Expression converters that
  * Spark 4 moved behind the api/classic split. Lives in the
  * org.apache.spark.sql package solely to re-export the two conversions
  * custom Catalyst expressions need (the same access pattern third-party
  * Spark extensions use).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
