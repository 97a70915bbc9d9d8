package org.apache.spark.sql.graftinternal

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to the `private[sql]` Column↔Expression converters —
  * required to expose custom Catalyst expressions as user-facing Columns in
  * Spark 4 (where `new Column(expr)` is no longer public). This is the whole
  * extent of our reach into Spark internals.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
