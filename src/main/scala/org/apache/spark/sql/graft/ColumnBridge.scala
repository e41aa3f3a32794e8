package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's `private[sql]` Column ↔ Expression
  * converters (org.apache.spark.sql.classic.ExpressionUtils). Spark 4
  * removed the public `new Column(expr)` constructor in the Connect
  * refactor; libraries that ship native Catalyst expressions use a
  * same-package bridge like this to build Columns from them. Nothing else
  * in this package — keep the private-API surface to exactly these two
  * calls. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
