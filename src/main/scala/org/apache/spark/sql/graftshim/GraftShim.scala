package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters so the
  * graft custom Catalyst expressions can be exposed as user-facing Columns.
  * This is the same doorway Spark's own connectors use; it lives under
  * org.apache.spark.sql only to satisfy the access scope — no Spark
  * internals are modified.
  */
object GraftShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `AbstractDataType` is `private[sql]` in Spark 4; this public alias
    * lets graft expressions declare `inputTypes` (ImplicitCastInputTypes)
    * so analysis inserts casts / rejects wrong-typed calls.
    */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType

  /** Wrap a LogicalPlan as a DataFrame (`Dataset.ofRows` is
    * `private[sql]`) — the doorway custom logical operators (graft.plans)
    * use to surface through the public Dataset API.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
