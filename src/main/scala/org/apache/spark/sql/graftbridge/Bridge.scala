package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's `private[sql]` Column↔Expression converters
  * (Spark 4 routes Columns through ColumnNodes; the classic converters are
  * package-private). Compiling one forwarding object inside the
  * `org.apache.spark.sql` namespace is the conventional extension-library
  * technique — everything else in graft stays outside Spark's packages.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
