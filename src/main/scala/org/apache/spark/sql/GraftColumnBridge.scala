package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark's classic Column <-> Expression converters, which
  * are `private[sql]` in 4.x (columnNodeSupport.scala). graft builds
  * Columns from its own Catalyst expressions in exactly one place —
  * the Broadcast-handle [[graft.functions.GraftFunctions.nearestCentroid]]
  * form, whose centroid argument cannot travel through the (literal-
  * only) function-registry path. Lives in the org.apache.spark.sql
  * package solely to satisfy that access qualifier. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
