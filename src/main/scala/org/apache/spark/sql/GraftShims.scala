package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column ↔ catalyst-Expression converters
  * (org.apache.spark.sql.classic.ExpressionUtils). Spark 4 hides the
  * constructors third-party codegen expressions need for the DataFrame
  * API; this shim lives in the org.apache.spark.sql package solely to
  * re-export those two calls — the standard extension-library pattern. */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
