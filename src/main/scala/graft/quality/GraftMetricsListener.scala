package graft.quality

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.util.QueryExecutionListener

/** Engine observability: a QueryExecutionListener recording per-action
  * wall-clock and the scan-level row counts from the executed plan's
  * metrics — the "how much did this query actually read" signal that run
  * dashboards (and the reference's run_summary.json) are built from.
  *
  * Register with `spark.listenerManager.register(listener)`; metrics
  * accumulate in a bounded in-memory ring (driver-side, tiny) and can be
  * drained any time. Failures record the error class instead of metrics.
  */
object GraftMetricsListener {
  // companion-scoped (not an inner class): an inner case class would make
  // every pattern match carry an unverifiable outer-instance test
  final case class QueryMetrics(funcName: String, durationNs: Long,
                                scanRows: Long, error: Option[String])
}

final class GraftMetricsListener(maxEntries: Int = 1000)
    extends QueryExecutionListener {
  import GraftMetricsListener.QueryMetrics

  private val buf =
    new java.util.concurrent.ConcurrentLinkedQueue[QueryMetrics]()

  def metrics: Seq[QueryMetrics] = {
    import scala.jdk.CollectionConverters._
    buf.asScala.toSeq
  }

  def clear(): Unit = buf.clear()

  private def add(m: QueryMetrics): Unit = {
    buf.add(m)
    while (buf.size() > maxEntries) buf.poll()
  }

  // AQE plans nest materialized stages as leaf nodes — recurse through
  // both wrappers to reach the physical scans
  private def scanLeaves(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] =
    p.collectLeaves().flatMap {
      case a: AdaptiveSparkPlanExec => scanLeaves(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scanLeaves(q.plan)
      case l => Seq(l)
    }

  override def onSuccess(funcName: String, qe: QueryExecution,
                         durationNs: Long): Unit = {
    val scanRows = scanLeaves(qe.executedPlan)
      .flatMap(_.metrics.get("numOutputRows"))
      .map(_.value).sum
    add(QueryMetrics(funcName, durationNs, scanRows, None))
  }

  override def onFailure(funcName: String, qe: QueryExecution,
                         exception: Exception): Unit =
    add(QueryMetrics(funcName, 0L, 0L,
      Some(exception.getClass.getSimpleName)))
}
