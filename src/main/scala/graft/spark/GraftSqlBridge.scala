package org.apache.spark.sql.graftglue

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ catalyst Expression bridge for graft's native expressions.
  *
  * Spark 4 moved Column onto ColumnNode and made the converters
  * (`classic.ExpressionUtils`) private[sql]; a package-scoped shim is the
  * established pattern extension libraries use to mount custom catalyst
  * Expressions without forking (the alternative — SQL-string round-trips
  * through expr() — loses type parameters and requires function-registry
  * injection at session build time).
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a function on an ALREADY-RUNNING session (extensions only
    * apply at session construction; the registry lives behind
    * private[sql] sessionState). */
  def registerFunction(
      spark: org.apache.spark.sql.classic.SparkSession,
      id: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
}
