package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd integer-vector kernels for the fixed-point recall family
  * ([[graft.operators.PortableAnn]]). The higher-order-function forms
  * (`aggregate(zip_with(...))`) allocate an intermediate array and a
  * lambda frame per element and break whole-stage codegen — measured
  * 24 s for q219's 2M-pair exhaustive baseline at sf0.1; these compile
  * to a tight primitive loop (q219 → ~2 s). All arithmetic is exact
  * 64-bit integer math, identical to the HOF forms and to the DuckDB
  * restatement (cross-checked in PortableAnnSpec).
  */
abstract class LongArrayBinaryExpr extends BinaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"requires array<bigint> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }
}

/** Σ aᵢ·bᵢ over two long arrays (exact 64-bit). */
case class LongDotExpr(left: Expression, right: Expression)
    extends LongArrayBinaryExpr {

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var sum = 0L
    var i = 0
    while (i < n) { sum += a.getLong(i) * b.getLong(i); i += 1 }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $sum = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDotExpr =
    copy(left = newLeft, right = newRight)
}

/** Σ (aᵢ−bᵢ)² over two long arrays (exact 64-bit squared L2). */
case class LongDist2Expr(left: Expression, right: Expression)
    extends LongArrayBinaryExpr {

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var sum = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      sum += d * d
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $sum = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = $a.getLong($i) - $b.getLong($i);
         |  $sum += $d * $d;
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDist2Expr =
    copy(left = newLeft, right = newRight)
}

object LongVectorExprs {
  import org.apache.spark.sql.GraftBridge
  def dot(a: Column, b: Column): Column =
    GraftBridge.column(LongDotExpr(GraftBridge.expression(a), GraftBridge.expression(b)))
  def dist2(a: Column, b: Column): Column =
    GraftBridge.column(LongDist2Expr(GraftBridge.expression(a), GraftBridge.expression(b)))
}
