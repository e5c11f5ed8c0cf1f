package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `floorMod(java.lang.String.hashCode, n)` as a codegen'd expression —
  * the shard-assignment hash every persisted index layout buckets with
  * (BM25 term shards, dedup shingle shards). The Scala-UDF form breaks
  * whole-stage codegen inside the build's explode→aggregate pipeline
  * and crosses the UDF bridge per posting row; this inlines into the
  * generated stage. The hash MUST stay exactly `String.hashCode`: the
  * driver computes the same function at query time to push probe shards
  * as a partition filter, and layout vs pruning must never diverge
  * (`Bm25.shardOf` / `DedupOps.shingleShard` are the driver twins).
  */
case class JavaHashModExpr(child: Expression, n: Int)
    extends UnaryExpression {

  require(n > 0, s"shard count must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"requires a string input, got ${child.dataType.catalogString}")

  override def dataType: DataType = IntegerType

  override def nullSafeEval(s: Any): Any =
    java.lang.Math.floorMod(s.asInstanceOf[UTF8String].toString.hashCode, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"java.lang.Math.floorMod($c.toString().hashCode(), $n)")

  override protected def withNewChildInternal(newChild: Expression): JavaHashModExpr =
    copy(child = newChild)
}

object ShardExpr {
  import org.apache.spark.sql.GraftBridge

  /** Column form: shard id of a string under `hash(s) mod n`. */
  def javaHashMod(s: Column, n: Int): Column =
    GraftBridge.column(JavaHashModExpr(GraftBridge.expression(s), n))
}
