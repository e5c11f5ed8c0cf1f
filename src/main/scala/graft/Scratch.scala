package graft

import graft.operators.DedupOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling entry point (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables(spark, d, "documents")
    val sh = DedupOps.shingles(docs, "doc_id", "text", 3)
    time("shingles count")(println(sh.count()))
    val shc = sh.cache()
    time("shingles cache materialize")(shc.count())
    val inter = shc.select(col("doc_id").as("id_a"), col("shingle"))
      .join(shc.select(col("doc_id").as("id_b"), col("shingle")), Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    time("inter join+agg")(println(inter.count()))
    val full = DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
    time("full pipeline")(println(full.count()))
    time("full again")(println(full.count()))
    spark.stop()
  }
}
