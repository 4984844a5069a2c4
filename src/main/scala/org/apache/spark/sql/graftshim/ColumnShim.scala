package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge for building `Column`s from catalyst `Expression`s: the
  * Column↔Expression converters moved behind `private[sql]` in Spark 4's
  * Connect refactor, so extension libraries expose them via a shim in an
  * `org.apache.spark.sql` subpackage — the established pattern for
  * Catalyst-native extensions that don't go through
  * `SparkSessionExtensions` function registration.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
