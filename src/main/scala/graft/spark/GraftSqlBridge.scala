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

  /** The name of a bare single-part attribute column (what `col("name")`
    * builds), else None. Inspects the Column's NODE — the converted
    * expression is a lazy ColumnNodeExpression wrapper that never
    * pattern-matches as an Attribute, and the node types are private[sql],
    * hence this shim. Used to decide when an expression can reuse an
    * existing attribute instead of being aliased to a temp column. */
  def bareAttributeName(c: Column): Option[String] = c.node match {
    case a: org.apache.spark.sql.internal.UnresolvedAttribute
        if a.nameParts.length == 1 && !a.isMetadataColumn =>
      Some(a.nameParts.head)
    case _ => None
  }

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
