package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's package-private Column ↔ Expression conversion
  * (Spark 4 made `Column` wrap a ColumnNode; the classic converter
  * lives behind `private[sql]`). This is the supported idiom for
  * libraries that define custom Catalyst expressions.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
