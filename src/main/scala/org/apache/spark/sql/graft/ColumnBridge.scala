package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst Expression bridge for graft's native expressions.
  *
  * Spark 4 wraps Columns around ColumnNodes and gates the direct
  * Expression constructors behind `private[sql]`
  * (classic.ExpressionUtils). The function-registry hop the other natives
  * use (`createOrReplaceTempFunction` + `call_function`) needs a
  * SparkSession at construction time; expression factories that only see
  * Columns (TextOps.tokens) use this bridge instead — same analysis-time
  * binding, no registry state. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
