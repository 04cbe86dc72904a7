package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column↔Expression converters (Spark
  * 4 moved Column onto ColumnNode; `classic.ExpressionUtils` is the
  * supported classic-mode path but is sql-private). Lives under
  * `org.apache.spark.sql` solely to satisfy that access qualifier;
  * keep every graft-owned expression in `graft.plans` and route its
  * Column constructor through here.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
