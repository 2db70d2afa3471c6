package org.apache.spark.sql.killashim

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal `private[sql]` bridge (the standard extension-library pattern —
  * frameless/deequ do the same): exposes Column ⇄ Expression conversion and
  * function registration so killa's native Catalyst expressions can be used
  * as Columns and from SQL without forking SparkSession construction.
  */
object Shim {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)

  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)

  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit = {
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
    ()
  }
}
