package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between Catalyst `Expression`s and the public `Column` API.
  *
  * Spark 4 moved Column onto ColumnNode and made the converter
  * (`org.apache.spark.sql.classic.ExpressionUtils`) private[sql]; this shim
  * lives in the sql package purely to re-expose those two conversions for
  * graft's custom expressions (SketchExpressions). No Spark internals are
  * modified.
  */
object GraftColumnShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
