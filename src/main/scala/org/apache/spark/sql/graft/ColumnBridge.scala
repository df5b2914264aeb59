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

  /** Eager ColumnNode → Expression conversion through Spark's real
    * converter. `ExpressionUtils.expression` only wraps the node in a lazy
    * `ColumnNodeExpression` — fine inside Dataset analysis, which converts
    * it, but a tree spliced into a plan through the function registry never
    * meets that conversion and dies at codegen as Unevaluable. */
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Register a native expression as a session-temporary SQL function, so
    * `spark.sql("SELECT vec_dot(a, b) ...")` plans the codegen'd expression
    * directly (not a UDF wrapper). */
  def registerExpression(spark: org.apache.spark.sql.SparkSession, name: String,
                         builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
