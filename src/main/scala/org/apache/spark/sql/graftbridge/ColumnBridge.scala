package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column↔Expression conversion `private[sql]`
  * (columnNodeSupport.scala); custom Catalyst expressions still need it to
  * surface as Columns, so this bridge re-exports the two conversions. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Apply a SparkSessionExtensions' function injections to a live
    * session's registry (the hook SparkSession's bootstrap calls; it is
    * private[sql], which also makes in-JVM testing of extension wiring
    * impossible without this bridge — getOrCreate reuses the active
    * session and skips withExtensions). */
  def applyFunctionInjections(ext: org.apache.spark.sql.SparkSessionExtensions,
                              session: org.apache.spark.sql.SparkSession): Unit =
    ext.registerFunctions(session.sessionState.functionRegistry)
}
