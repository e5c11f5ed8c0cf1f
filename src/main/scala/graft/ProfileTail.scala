package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Dev tool (optimization rounds): decompose the per-query FIXED cost of
  * the sub-second bench tail — driver plan construction, Catalyst
  * analysis/optimization/physical planning, and the action itself — and
  * count whole-stage-codegen compilations per pass (the codegen cache
  * holds `spark.sql.codegen.cache.maxEntries` entries, default 100, so
  * an interleaved 242-query sweep may recompile everything every pass).
  * Usage: `runMain graft.ProfileTail all|q01_x,q02_y [reps] [ruledump]`.
  */
object ProfileTail {
  def main(args: Array[String]): Unit = {
    val which = if (args.nonEmpty) args(0) else "all"
    val reps = if (args.length > 1) args(1).toInt else 3
    val ruleDump = args.length > 2 && args(2) == "ruledump"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("lineitem", "orders", "documents", "embeddings", "events")
      .foreach(t => Tables(spark, sfDir, t).count())

    // job wall accumulated between marks (driver-side listener)
    val jobWall = new java.util.concurrent.atomic.AtomicLong()
    val taskMs = new java.util.concurrent.atomic.AtomicLong()
    val jobStart = mutable.Map[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        synchronized { jobStart(j.jobId) = j.time }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        synchronized {
          jobStart.remove(j.jobId).foreach(t0 => jobWall.addAndGet(j.time - t0))
        }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) taskMs.addAndGet(t.taskMetrics.executorRunTime)
    })

    val cg = org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME
    val qseq = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      which == "all" || which.split(",").contains(n)
    }
    if (ruleDump)
      org.apache.spark.sql.catalyst.rules.RuleExecutor.resetMetrics()

    case class Acc(var construct: Double = 0, var plan: Double = 0,
                   var action: Double = 0, var jw: Double = 0,
                   var cgN: Long = 0, var wall: Double = 0)
    val perPass = mutable.ArrayBuffer[Acc]()
    val perQuery = mutable.Map[String, Acc]()
    (1 to reps).foreach { pass =>
      val acc = Acc()
      qseq.foreach { case (name, fn) =>
        val q = perQuery.getOrElseUpdate(name, Acc())
        val cg0 = cg.getCount
        val jw0 = jobWall.get()
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis/opt/planning
        val t2 = System.nanoTime()
        df.count()
        val t3 = System.nanoTime()
        spark.catalog.clearCache()
        val (c, p, a) = ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
        val jw = (jobWall.get() - jw0) / 1e3
        acc.construct += c; acc.plan += p; acc.action += a
        acc.jw += jw; acc.cgN += cg.getCount - cg0
        acc.wall += (t3 - t0) / 1e9
        q.construct += c; q.plan += p; q.action += a; q.jw += jw
        q.cgN += cg.getCount - cg0; q.wall += (t3 - t0) / 1e9
      }
      perPass += acc
      println(f"[pass $pass] wall=${acc.wall}%.1f construct=${acc.construct}%.1f plan=${acc.plan}%.1f action=${acc.action}%.1f jobwall=${acc.jw}%.1f cgCompiles=${acc.cgN}")
    }
    val snap = cg.getSnapshot
    println(f"[codegen] total compiles=${cg.getCount} meanMs=${snap.getMean}%.1f p75Ms=${snap.get75thPercentile}%.1f maxMs=${snap.getMax}")
    // slowest queries by total wall with their decomposition
    println("[per-query, sum over passes, slowest 40]")
    perQuery.toSeq.sortBy(-_._2.wall).take(40).foreach { case (n, a) =>
      println(f"  $n%-28s wall=${a.wall}%6.2f construct=${a.construct}%5.2f plan=${a.plan}%5.2f action=${a.action}%6.2f jobwall=${a.jw / 1000}%6.2f cg=${a.cgN}%4d")
    }
    if (ruleDump) {
      println("[rule executor]")
      println(org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent())
    }
    spark.stop()
  }
}
