package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // per-query caches must not accumulate
      name -> dt
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // n_queries/mean_sec: the registry grows round over round, so the
    // comparable figure across rounds is per-query mean, not the total
    val mean = if (results.nonEmpty) total / results.size else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"mean_sec":$mean,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
