package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made the `Column` <-> Catalyst `Expression` bridge
  * (`classic.ExpressionUtils`) `private[sql]`; this shim re-exports the two
  * conversions the engine's custom expressions need. Lives in a
  * subpackage of `org.apache.spark.sql` solely for access; contains no
  * Spark-internal logic.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
