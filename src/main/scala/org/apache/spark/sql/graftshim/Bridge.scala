package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal access shim: `ExpressionUtils` is `private[sql]`, so the
  * Column↔Expression bridge our native expressions need lives in an
  * `org.apache.spark.sql` subpackage (the conventional technique for
  * Spark extension libraries).  Nothing else reaches into internals. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
