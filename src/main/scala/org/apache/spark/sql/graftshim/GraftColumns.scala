package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public Column API and Catalyst expressions
  * (`ExpressionUtils` is `private[sql]`) — the standard technique for
  * extension libraries that ship custom expressions without forcing every
  * session to pre-configure `spark.sql.extensions`. Kept to the two
  * minimal conversions; everything else lives in `graft.*`. */
object GraftColumns {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Session function registry (for runtime registration of graft's SQL
    * functions on an already-built session — `spark.sql.extensions` is
    * only honored at session construction). */
  def functionRegistry(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
}
