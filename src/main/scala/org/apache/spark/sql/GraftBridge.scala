package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the classic Column factory (private[sql] in Spark 4's
  * Connect-era API): lets the library wrap its native Catalyst
  * expressions in Columns without requiring callers to register
  * session extensions. Same mechanism every Spark-native extension
  * library (Delta, Sedona, etc.) uses. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
