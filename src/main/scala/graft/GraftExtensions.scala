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
    GraftExtensions.textFnDescriptors.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.ApproxCountDistinctRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.PackStrategy)
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

  /** Column-composition text functions exposed to SQL: each builder wraps
    * the exact `functions`-API expression tree the Column API produces, so
    * `spark.sql("SELECT fingerprint(text) …")` plans identically to
    * `TextFns.fingerprint(col("text"))`.
    */
  private def unary(name: String, f: org.apache.spark.sql.Column =>
      org.apache.spark.sql.Column): Seq[Expression] => Expression = {
    exprs =>
      require(exprs.length == 1, s"$name(text) takes 1 argument")
      org.apache.spark.sql.GraftBridge.catalystExpression(
        f(org.apache.spark.sql.GraftBridge.column(exprs.head)))
  }

  private val sqlTextFns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "fingerprint" -> unary("fingerprint", graft.functions.TextFns.fingerprint),
    "clean_text" -> unary("clean_text", graft.functions.TextFns.cleanText),
    "language_id" -> unary("language_id", graft.functions.TextFns.languageId),
    "quality_score" -> unary("quality_score", graft.functions.TextFns.qualityScore),
    "token_count" -> unary("token_count", graft.functions.TextFns.tokenCount),
    "redact_pii" -> unary("redact_pii", graft.functions.TextFns.redactPii))

  val textFnDescriptors: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    sqlTextFns.map { case (name, builder) =>
      (FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.TextFns", name), builder)
    }

  /** Register on a live session (post-hoc, without withExtensions). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", build, "built-in")
    sqlTextFns.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_ eq graft.plans.ApproxCountDistinctRewrite) :+
        graft.plans.ApproxCountDistinctRewrite
    spark.experimental.extraStrategies =
      spark.experimental.extraStrategies
        .filterNot(_ eq graft.plans.PackStrategy) :+ graft.plans.PackStrategy
  }
}
