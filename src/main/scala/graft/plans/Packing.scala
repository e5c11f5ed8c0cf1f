package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, GenericInternalRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The greedy sequence packer (q184 semantics) as a first-class Catalyst
  * operator — the (c)-tier extension path: a custom `LogicalPlan` node, a
  * `SparkStrategy`, and a physical `UnaryExecNode` whose REQUIRED child
  * distribution (clustered by shard) and ordering (shard, ord, id) let
  * Spark's `EnsureRequirements` plan the exchange and sort instead of the
  * operator hand-rolling `repartition().sortWithinPartitions()`. That is
  * the whole point over the `mapPartitions` form
  * ([[graft.operators.DataSelection.packSequences]], kept as the
  * cross-validation twin): a child that is ALREADY hash-partitioned and
  * sorted on the shard key (bucketed table, upstream aggregate) satisfies
  * the requirement and the packer plans with ZERO new shuffles —
  * EnsureRequirements proves it, not the operator author.
  *
  * Execution is the same single forward pass with O(1) state per
  * partition, resetting at shard boundaries; rows stream, group state
  * never materializes.
  */
final case class PackPlan(child: LogicalPlan, budget: Long,
    // constructor state (not derived) so plan transforms that copy() the
    // node keep the SAME exprId — upstream operators bind to it
    binAttr: AttributeReference =
      AttributeReference("bin", LongType, nullable = false)())
    extends UnaryNode {

  private def childAttr(n: String): Option[Attribute] =
    child.output.find(_.name == n)

  override lazy val resolved: Boolean = child.resolved &&
    PackPlan.inputCols.forall(n => childAttr(n).isDefined)

  override def output: Seq[Attribute] =
    if (!resolved) Seq.empty
    else Seq(childAttr("shard").get, childAttr("id").get, binAttr,
      childAttr("nTok").get)

  // the node consumes all four input columns (ord is order-only — no
  // expression references it, so without this ColumnPruning would strip
  // it from the child and unresolve the plan) and produces only `bin`
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      PackPlan.inputCols.flatMap(childAttr))

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(Seq(binAttr))

  override protected def withNewChildInternal(newChild: LogicalPlan): PackPlan =
    copy(child = newChild)
}

object PackPlan {
  val inputCols: Seq[String] = Seq("shard", "ord", "id", "nTok")
}

/** Plans [[PackPlan]] as [[PackExec]]. */
object PackStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: PackPlan => PackExec(planLater(p.child), p.budget, p.output) :: Nil
    case _ => Nil
  }
}

final case class PackExec(child: SparkPlan, budget: Long,
                          output: Seq[Attribute]) extends UnaryExecNode {

  private def childAttr(n: String): Attribute =
    child.output.find(_.name == n).getOrElse(
      throw new IllegalStateException(s"PackExec child lacks column $n"))

  // the contract that buys the free planning: EnsureRequirements inserts
  // an exchange/sort ONLY if the child does not already satisfy these
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(childAttr("shard"))) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(childAttr("shard"), Ascending),
      SortOrder(childAttr("ord"), Ascending),
      SortOrder(childAttr("id"), Ascending)))

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def producedAttributes
      : org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      output.filterNot(child.outputSet.contains))

  override protected def doExecute(): RDD[InternalRow] = {
    val shardIdx = child.output.indexWhere(_.name == "shard")
    val ordIdx = child.output.indexWhere(_.name == "ord")
    val idIdx = child.output.indexWhere(_.name == "id")
    val nTokIdx = child.output.indexWhere(_.name == "nTok")
    require(shardIdx >= 0 && ordIdx >= 0 && idIdx >= 0 && nTokIdx >= 0)
    val b = budget
    val types = output.map(_.dataType).toArray
    child.execute().mapPartitions({ it =>
      val proj = UnsafeProjection.create(types)
      var cur = Long.MinValue; var bin = -1L; var fill = 0L
      it.map { row =>
        val shard = row.getLong(shardIdx)
        val id = row.getLong(idIdx)
        val nTok = row.getLong(nTokIdx)
        if (shard != cur) { cur = shard; bin = -1L; fill = 0L }
        val assigned =
          if (nTok > b) -1L
          else {
            if (bin < 0L || fill + nTok > b) { bin += 1L; fill = 0L }
            fill += nTok
            bin
          }
        proj(new GenericInternalRow(
          Array[Any](shard, id, assigned, nTok)))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): PackExec =
    copy(child = newChild)
}

/** Public API over the custom operator. */
object Packing {

  /** q184's packer through the Catalyst node: same (shard, ord, id, nTok)
    * preparation as the mapPartitions twin, same output (shard, id, bin,
    * nTok) — but the shuffle/sort is planned by EnsureRequirements against
    * the node's declared requirements. Requires [[PackStrategy]] to be
    * registered (GraftExtensions).
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    budget: Long, nShards: Int): DataFrame = {
    require(budget > 0 && nShards > 0, "budget and nShards must be positive")
    val h = md5(col(idCol).cast("string"))
    val tok = df.select(
      (conv(substring(h, 1, 4), 16, 10).cast("int") % nShards)
        .cast("long").as("shard"),
      h.as("ord"), col(idCol).cast("long").as("id"),
      graft.functions.TextFns.tokenCount(col(textCol)).as("nTok"))
    GraftBridge.ofRows(df.sparkSession,
      PackPlan(GraftBridge.logicalPlan(tok), budget))
  }
}
