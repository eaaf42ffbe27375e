package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved Column↔Expression interop behind `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`); this is the standard
  * extension-library bridge — a public accessor living inside the sql package
  * tree — used by graft's custom Catalyst expressions.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
