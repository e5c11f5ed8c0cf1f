package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: warm min-of-N timing for a few named queries — the
  * per-query feedback loop between full Bench runs.
  * `SPARK_GRAFT_SF_DIR=... runMain graft.MicroBench q121_kcore,q69_dedup_components [reps]`
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    System.setProperty("graft.sf.dir", sfDir)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val ts = (1 to (reps + 1)).map { _ => // +1: first rep absorbs codegen
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      println(f"[micro] $name warmMin=${ts.tail.min}%.3f all=${
        ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
