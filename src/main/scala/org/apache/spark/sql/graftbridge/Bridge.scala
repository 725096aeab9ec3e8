package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, classic}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column <-> Catalyst Expression
  * conversion (Spark 4.x moved these behind `classic.ExpressionUtils`).
  * Lives under `org.apache.spark.sql` solely to satisfy the access
  * qualifier; everything else in this project is in package `graft`.
  */
object Bridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
