package graft

import graft.operators.{DataSelection, GraphOps, QualityClassifier}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: growth curves for the round-5 packing/AUC/BFS family.
  *
  * Packing and AUC scale with corpus size, so plain id-offset replicas
  * are the right load (token-count distribution unchanged, c× docs).
  * The BFS probe runs on a synthetic graph instead — pairing it with the
  * dedup pair-generation cost would measure q24, not the walk: nodes are
  * chained in blocks of 10 with one seed per 500 nodes, so frontier size
  * and hop depth stay constant while node count grows c×.
  *
  * `runMain graft.PackScaleProbe [factors]`, e.g. `1,2,5,10`.
  */
object PackScaleProbe {
  def main(args: Array[String]): Unit = {
    val factors = (if (args.nonEmpty) args(0) else "1,2,5,10")
      .split(",").map(_.trim.toInt).toSeq
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
    val base = Tables(spark, sfDir, "documents").select("doc_id", "text")
    val nBase = base.count()
    factors.foreach { c =>
      val corpus = (0 until c).map { i =>
        base.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
          col("text"))
      }.reduce(_ unionAll _).localCheckpoint()
      val nNodes = nBase * c * 20
      val nodes = spark.range(1L, nNodes + 1L).toDF("id")
      val edges = nodes.filter(col("id") % 10 =!= 0L)
        .select(col("id").as("a"), (col("id") + 1L).as("b"))
        .localCheckpoint()
      val seeds = nodes.filter(col("id") % 500L === 1L).select(col("id"))
      def time(f: => Long): (Double, Long) = {
        val t0 = System.nanoTime()
        val rows = f
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val (packT, packRows) = time(DataSelection.packingStats(
        corpus, "doc_id", "text", budget = 96L, nShards = 64).count())
      spark.catalog.clearCache()
      val (ccT, ccRows) = time(DataSelection.concatPackStats(
        corpus, "doc_id", "text", budget = 96L, nShards = 64).count())
      spark.catalog.clearCache()
      val (aucT, _) = time {
        val sc = QualityClassifier.score(corpus, "doc_id", "text")
        val lab = corpus.select(col("doc_id"),
          (length(col("text")) >= 300).cast("int").as("label"))
        QualityClassifier.auc(sc, "doc_id", lab, "label").count()
      }
      spark.catalog.clearCache()
      val (bfsT, bfsRows) = time(
        GraphOps.minHopFrom(seeds, edges, "a", "b", maxHops = 3).count())
      spark.catalog.clearCache()
      val (chunkT, _) = time(DataSelection.packWithChunking(
        corpus, "doc_id", "text", budget = 64L, nShards = 64).count())
      spark.catalog.clearCache()
      val (sweepT, _) = time(DataSelection.packingSweep(
        corpus, "doc_id", "text", Seq(32L, 64L, 96L, 128L), nShards = 64)
        .count())
      spark.catalog.clearCache()
      val (tfT, tfRows) = time {
        val sc = QualityClassifier.score(corpus, "doc_id", "text")
        DataSelection.topFractionByScore(sc, "doc_id", 1, 4).count()
      }
      spark.catalog.clearCache()
      println(f"c=$c%2d docs=${nBase * c}%7d pack=$packT%.2fs " +
        f"($packRows shards) concat=$ccT%.2fs ($ccRows) auc=$aucT%.2fs " +
        f"bfs[${nNodes}n]=$bfsT%.2fs ($bfsRows reached) " +
        f"chunkpack=$chunkT%.2fs sweep4=$sweepT%.2fs " +
        f"topfrac=$tfT%.2fs ($tfRows sel)")
    }
    spark.stop()
  }
}
