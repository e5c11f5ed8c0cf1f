package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Dev tool (optimization rounds): run one registered query with a
  * stage-metrics listener and print, per job, the wall clock, stage task
  * time, shuffle read/write bytes and task counts — the guide-§1 "where
  * does the time actually go" measurement when the UI is disabled.
  * Usage: `runMain graft.ProfileOne q242_hybrid_indexed [reps]`.
  * Job rows carry the thread-local job description when the query sets
  * one, so index-lifecycle queries (build / append / remove / search)
  * break down phase by phase.
  */
object ProfileOne {
  private case class StageAgg(var taskMs: Long = 0, var tasks: Int = 0,
                              var shufRead: Long = 0, var shufWrite: Long = 0,
                              var input: Long = 0, var wallMs: Long = 0,
                              var name: String = "")

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("lineitem", "orders", "documents", "embeddings", "events")
      .foreach(t => Tables(spark, sfDir, t).count())

    val stages = mutable.Map[Int, StageAgg]()
    val jobs = mutable.ArrayBuffer[(Int, String, Long, Long, Seq[Int])]()
    val jobStart = mutable.Map[Int, (String, Long, Seq[Int])]()
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
        val a = stages.getOrElseUpdate(t.stageId, StageAgg())
        a.tasks += 1
        val m = t.taskMetrics
        if (m != null) {
          a.taskMs += m.executorRunTime
          a.shufRead += m.shuffleReadMetrics.totalBytesRead
          a.shufWrite += m.shuffleWriteMetrics.bytesWritten
          a.input += m.inputMetrics.bytesRead
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        synchronized {
          val a = stages.getOrElseUpdate(s.stageInfo.stageId, StageAgg())
          // first graft.* frame of the submission stack — the code site
          // that owns the stage (the default name is an anon lambda)
          val site = s.stageInfo.details.linesIterator
            .find(l => l.contains("graft.") && !l.contains("ProfileOne"))
            .map(_.trim).getOrElse(s.stageInfo.name.takeWhile(_ != '\n'))
          a.name = site
          a.wallMs = (for {
            st <- s.stageInfo.submissionTime
            en <- s.stageInfo.completionTime
          } yield en - st).getOrElse(0L)
        }
      override def onJobStart(j: SparkListenerJobStart): Unit = synchronized {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobStart(j.jobId) = (desc, j.time, j.stageIds.map(_.toInt))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = synchronized {
        jobStart.remove(j.jobId).foreach { case (d, t0, sids) =>
          jobs += ((j.jobId, d, t0, j.time - t0, sids))
        }
      }
    }

    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      stages.clear(); jobs.clear()
      if (i == reps) spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      if (i == reps) {
        // listener bus is async; give it a beat to drain before reading
        Thread.sleep(500)
        spark.sparkContext.removeSparkListener(listener)
      }
      println(f"[profile] $name rep$i: $dt%.3f s ($n rows)")
    }

    def mb(b: Long): String = f"${b / 1048576.0}%8.1f MB"
    println(f"%n[profile] per-job breakdown (last rep), wall-ordered:")
    jobs.sortBy(-_._4).take(40).foreach { case (jid, desc, _, wall, sids) =>
      val ss = sids.flatMap(stages.get)
      val taskMs = ss.map(_.taskMs).sum
      val sr = ss.map(_.shufRead).sum; val sw = ss.map(_.shufWrite).sum
      val in = ss.map(_.input).sum
      val site = ss.sortBy(-_.taskMs).headOption.map(_.name).getOrElse("")
      println(f"  job $jid%3d wall ${wall / 1000.0}%7.3f s  task ${taskMs / 1000.0}%8.2f s  in ${mb(in)}  sr ${mb(sr)}  sw ${mb(sw)}  ${(if (desc.nonEmpty) desc else site).take(90)}")
    }
    println(f"%n[profile] top stages by task time (last rep):")
    stages.toSeq.sortBy(-_._2.taskMs).take(25).foreach { case (sid, a) =>
      println(f"  stage $sid%4d wall ${a.wallMs / 1000.0}%7.3f s  task ${a.taskMs / 1000.0}%8.2f s  n=${a.tasks}%4d  in ${mb(a.input)}  sr ${mb(a.shufRead)}  sw ${mb(a.shufWrite)}  ${a.name.take(60)}")
    }
    val totalJobWall = jobs.map(_._4).sum
    println(f"%n[profile] sum of job walls: ${totalJobWall / 1000.0}%.3f s (gaps to rep wall = driver/planning time)")
    spark.stop()
  }
}
