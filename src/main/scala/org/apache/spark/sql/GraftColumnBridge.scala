package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters — the same
  * shim pattern ecosystem libraries (deequ, frameless, spark-nlp) use to
  * attach custom Catalyst expressions to the public Column API on Spark 4's
  * ColumnNode architecture.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
