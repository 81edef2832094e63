package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark's `private[sql]` Column ↔ Expression
  * converters, the supported pattern for libraries that ship native
  * Catalyst expressions (Spark 4 moved Column onto ColumnNode, so
  * third-party expressions must round-trip through these).
  */
package object graftbridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
