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
}
