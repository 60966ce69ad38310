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

  /** Nondeterminism test on an UNRESOLVED Column. Spark 4 Columns are
    * lazy ColumnNode trees — `bridge.expression` wraps them in an
    * opaque ColumnNodeExpression whose `deterministic` defaults true —
    * so the column converts EAGERLY to a catalyst tree first
    * (ColumnNodeToExpressionConverter, the same conversion analysis
    * performs) and the walk tests both the unresolved function NAMES
    * (UnresolvedFunction defaults deterministic=true before
    * resolution) and each node's own flag. */
  private val nondetNames = Set("rand", "randn", "random", "uuid",
    "shuffle", "monotonically_increasing_id")

  def isNondeterministic(c: Column): Boolean = {
    val e = org.apache.spark.sql.classic.ColumnNodeToExpressionConverter
      .apply(c.node)
    e.exists {
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
        nondetNames(f.nameParts.last.toLowerCase)
      case x => !x.deterministic
    }
  }
}
