package graft

import graft.functions.DotProductExpr
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Catalyst extension point: registers the engine's native expressions as
  * SQL functions, so `spark.sql("SELECT dot_product(a, b)")` plans the same
  * codegen'd expression the Column API uses.
  *
  * Install with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`; `GraftExtensions.install`
  * registers on an already-built session (used by tests/Verify).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotProductDescriptor)
    ext.injectOptimizerRule(_ => graft.plans.ApproxCountDistinctRewrite)
  }
}

object GraftExtensions {
  private def build(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "dot_product(arrayA, arrayB) takes 2 arguments")
    DotProductExpr(exprs(0), exprs(1))
  }

  val dotProductDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "dot_product"),
      build)

  /** Register on a live session (post-hoc, without withExtensions). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", build, "built-in")
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_ eq graft.plans.ApproxCountDistinctRewrite) :+
        graft.plans.ApproxCountDistinctRewrite
  }
}
