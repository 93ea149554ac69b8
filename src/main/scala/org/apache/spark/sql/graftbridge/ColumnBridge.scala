package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made `Column` a connect-agnostic facade and hid the
  * Column↔Expression converters behind `private[sql]`. This bridge
  * lives under the spark.sql package namespace solely to re-expose the
  * two conversions our custom Catalyst expressions need.
  */
object ColumnBridge {
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** SQL float-grouping normalization (-0.0 → 0.0, canonical NaN) —
    * re-exposes the `private[sql]` NormalizeFloatingNumbers.normalize.
    */
  def normalizeFloats(e: Expression): Expression =
    org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers.normalize(e)

  /** DataFrame from a (possibly custom) logical plan — re-exposes the
    * `private[sql]` Dataset.ofRows for graft's custom operators.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
