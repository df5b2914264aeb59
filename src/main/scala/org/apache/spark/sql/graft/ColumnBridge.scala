package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4 moved the Column-from-Expression constructor behind
  * `private[sql] classic.ExpressionUtils`; third-party expression libraries
  * conventionally expose it through a shim in the `org.apache.spark.sql`
  * namespace (the same technique frameless/sedona/delta use). This is the
  * only place graft reaches into Spark internals. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
