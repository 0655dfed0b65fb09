package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. Spark 4 made the converters package-private
  * (`org.apache.spark.sql.classic.ExpressionUtils`); this shim re-exports
  * the two calls the graft expressions need. Standard extension-point usage
  * of the public catalyst Expression API otherwise.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
