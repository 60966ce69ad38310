package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression conversions —
  * Spark 4 made `Column` backend-agnostic, so third-party Catalyst
  * expressions need this one-hop shim (the standard extension pattern:
  * a file inside the org.apache.spark.sql namespace). Nothing else in
  * the codebase may depend on spark-private API.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
