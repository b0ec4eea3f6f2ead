package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark's private[sql] surface: wrap a Catalyst
  * `Expression` as a public `Column`. Spark 4 routes Columns through
  * ColumnNodes; `classic.ExpressionUtils` is the supported conversion for
  * classic (non-Connect) sessions but is package-private, hence this shim —
  * the standard pattern for Spark-native extension libraries.
  */
package object graftshim {
  def exprColumn(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def columnExpr(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
