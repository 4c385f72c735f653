package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark 4's package-private Column ↔ Expression
  * conversions (`org.apache.spark.sql.classic.ExpressionUtils`), needed
  * to expose custom Catalyst expressions as user-facing Columns. Lives
  * under `org.apache.spark.sql` for access; keep it to these two calls. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
