package graft

import graft.operators.DedupOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: full inverted-index Jaccard vs prefix-filtered Jaccard on a
  * boilerplate-heavy corpus — the regime the prefix filter exists for.
  *
  * Every document gets the same fixed token header prepended (a shared
  * template, NOT near-duplication: J of unrelated docs stays ≪ τ). The
  * full index must join every hot header-shingle bucket (|docs|² pairs
  * per shared shingle); the prefix filter ranks those shingles as the
  * most frequent in the corpus, so they never enter the index.
  *
  * `runMain graft.PrefixProbe [nDocs] [headerTokens]`, default 2000 60.
  */
object PrefixProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toInt else 2000
    val headerTokens = if (args.length > 1) args(1).toInt else 60
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
    val header = (0 until headerTokens).map(i => s"tmpl$i").mkString(" ")
    val corpus = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), concat(lit(header + " "), col("text")).as("text"))
      .limit(nDocs).localCheckpoint()
    def time(label: String, f: => Long): Long = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[prefixprobe] $label%-8s ${(System.nanoTime() - t0) / 1e9}%8.2f s ($rows pairs)")
      spark.catalog.clearCache()
      rows
    }
    val p = time("prefix",
      DedupOps.prefixJaccardPairs(corpus, "doc_id", "text", 3, 0.5).count())
    val f = time("full",
      DedupOps.ngramJaccardPairs(corpus, "doc_id", "text", 3, 0.5).count())
    assert(p == f, s"pair counts diverge: prefix=$p full=$f")
    spark.stop()
  }
}
