package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column ↔ Expression converters, so the
  * library's native codegen expressions (`graft.functions.DotProduct`,
  * `CosineSimilarity`, `L2Distance`) are usable as plain `Column`s without
  * a session-bound function registry. The extension-point pattern used by
  * public Spark extension libraries (Sedona, Frameless, …).
  */
object ColumnBridge {
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
  def toCol(e: Expression): Column = ExpressionUtils.column(e)
}
