package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column <-> Catalyst Expression
  * converters (Spark 4 wraps Column around ColumnNode; the classic
  * converters live behind package-private access). Lives under
  * `org.apache.spark.sql` purely for access; contains no Spark code. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
