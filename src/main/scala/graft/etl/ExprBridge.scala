package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression <-> Column bridge.
  *
  * Spark 4 backs `Column` by a `ColumnNode` (Connect-compatible); the
  * classic converter `ExpressionUtils` is private[sql], so this shim
  * lives under the org.apache.spark.sql namespace to re-export the two
  * conversions the engine's custom Catalyst expressions need.
  */
object ExprBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
