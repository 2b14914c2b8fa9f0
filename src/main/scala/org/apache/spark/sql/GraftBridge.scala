package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into the `private[sql]` Column ↔ Catalyst Expression
  * converters of Spark 4's classic API. This is the standard technique used
  * by open-source Spark extension libraries: one object inside the
  * `org.apache.spark.sql` package granting the rest of the (external)
  * codebase the ability to wrap a custom Catalyst `Expression` as a user
  * facing `Column` without registering it in a FunctionRegistry first.
  */
object GraftBridge {
  /** Wrap a Catalyst expression as a Column (classic sessions only). */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Unwrap a Column to its Catalyst expression (classic sessions only). */
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** The session's function registry, for temp-function registration. */
  def registry(spark: SparkSession) =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
}
