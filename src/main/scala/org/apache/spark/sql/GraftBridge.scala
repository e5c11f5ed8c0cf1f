package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Access bridge for `private[sql]` Column↔Expression converters (needed to
  * expose custom Catalyst expressions as user-facing `Column`s in Spark 4.x,
  * where `Column` no longer wraps `Expression` publicly).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eagerly convert a Column's node tree to a catalyst Expression tree
    * (function calls become UnresolvedFunction nodes the analyzer then
    * resolves). Unlike [[expression]], the result is NOT an opaque deferred
    * wrapper — required when the expression is returned from a
    * FunctionRegistry builder, where the analyzer must see real children.
    */
  def catalystExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Wrap a custom LogicalPlan as a user-facing DataFrame (the
    * `Dataset.ofRows` constructor is sql-private; custom plan nodes —
    * e.g. graft.plans.PackPlan — need it to enter the public API).
    */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan under a DataFrame (for embedding it as the
    * child of a custom plan node).
    */
  def logicalPlan(df: Dataset[_])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** External Row → InternalRow converter for a given schema (DSv2 readers
    * must emit InternalRow; the converter factory is sql-private).
    */
  def catalystConverter(schema: org.apache.spark.sql.types.StructType)
      : Row => org.apache.spark.sql.catalyst.InternalRow = {
    val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToCatalystConverter(schema)
    r => conv(r).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
  }
}
