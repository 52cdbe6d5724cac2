package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, StringType}

/** Minimal bridge into `private[sql]` Spark internals (Column <-> Expression
  * conversion), the standard pattern for Catalyst extension libraries.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  val stringInputTypes: Seq[AbstractDataType] = Seq(StringType)
}
