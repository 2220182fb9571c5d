package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into the `private[sql]` Column↔Expression converters —
  * Spark 4 removed the public `new Column(expr)` constructor, and custom
  * Catalyst expressions ([[graft.functions.VectorExpressions]]) need a
  * Column surface. Lives under `org.apache.spark.sql` solely to satisfy the
  * `private[sql]` scope; uses only stable internal entry points. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
