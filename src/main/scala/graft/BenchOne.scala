package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time one registered query N times (post-warm-up) —
  * `runMain graft.BenchOne q23_minhash_lsh [reps]`. Uses the same session
  * shape as [[Bench]] so numbers are comparable run-to-run.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
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
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[benchone] $name rep$i: $dt%.3f s ($n rows)")
    }
    spark.stop()
  }
}
