package graft

import graft.functions.TextFns
import graft.operators.{Bm25, DataSelection, DedupOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: the COMPOSED curation spine at scale. Every stage has its
  * own scale probe; this one measures the chain a real ingestion run
  * executes — clean → dedup-against-the-historical-index → quality
  * select → sequence-pack → index build — as ONE pipeline over a
  * copy-salted c× corpus, with per-stage wall, so a stage whose cost
  * composes superlinearly (a dedup that re-reads the cleaned corpus per
  * shard, a pack whose shard count stops matching the selected volume)
  * shows up as a curve, not an anecdote. The historical index is FIXED
  * size (built once from the base corpus): the increment grows c×, the
  * history does not — the production shape. Copy 0 keeps base tokens
  * (it fully duplicates history and gets dropped by the dedup gate);
  * copies 1..c-1 are salted novel text — so the dup/novel mix stays
  * realistic while volume grows.
  *
  * `runMain graft.PipelineScaleProbe [factors]`, default 1,2,5,10.
  */
object PipelineScaleProbe {
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

    val base = Tables(spark, sfDir, "documents")
      .select("doc_id", "text", "source")
    base.count() // warm-up

    // the FIXED historical index every increment dedups against
    val histDir = Scratch.dir("pipescale_hist")
    DedupOps.writeDedupIndex(base, "doc_id", "text", 3, histDir)

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    factors.foreach { c =>
      val incoming = (0 until c).map { i =>
        val txt =
          if (i == 0) col("text") // dups against history
          else regexp_replace(col("text"), "([a-z0-9]+)", s"c$i$$1")
        base.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
          txt.as("text"), col("source"))
      }.reduce(_ unionAll _).localCheckpoint()
      val n0 = incoming.count()

      // 1. CLEAN — normalize + drop empties
      val (cleaned, tClean) = time {
        val d = incoming.select(col("doc_id"),
            TextFns.cleanText(col("text")).as("text"), col("source"))
          .filter(length(col("text")) > 0)
          .localCheckpoint()
        d
      }

      // 2. DEDUP against the fixed historical index; keep novel docs
      val (survivors, tDedup) = time {
        val marks = DedupOps.dedupAgainstIndex(spark, histDir, cleaned,
          "doc_id", "text", 3, 0.5)
        val s = cleaned.join(
            marks.filter(col("exact_dup") === 0L && col("near_dup") === 0L)
              .select("doc_id"),
            Seq("doc_id"), "left_semi")
          .localCheckpoint()
        s
      }

      // 3. SELECT — deterministic quality gate (the q16/q76 predicates'
      // shape: length band + alphabetic ratio), one scan
      val (selected, tSelect) = time {
        val s = survivors
          .withColumn("__alpha",
            length(regexp_replace(col("text"), "[^a-zA-Z]", "")))
          .filter(length(col("text")).between(32, 100000) &&
            col("__alpha") * 2 > length(col("text")))
          .drop("__alpha")
          .localCheckpoint()
        s
      }

      // 4. PACK — shard-parallel first-fit into fixed token budgets
      val (_, tPack) = time {
        DataSelection.packSequences(selected, "doc_id", "text",
          budget = 1024L, nShards = cpus.toInt * 2).count()
      }

      // 5. INDEX the selected increment (the next run's history)
      val outDir = Scratch.dir(s"pipescale_out_c$c")
      val (_, tIndex) = time {
        Bm25.writeIndex(selected, "doc_id", "text", s"$outDir/bm25")
      }

      println(f"[pipescale] c=$c in=$n0 cleaned=${cleaned.count()} " +
        f"novel=${survivors.count()} selected=${selected.count()} | " +
        f"clean=$tClean%.2fs dedup=$tDedup%.2fs select=$tSelect%.2fs " +
        f"pack=$tPack%.2fs index=$tIndex%.2fs " +
        f"total=${tClean + tDedup + tSelect + tPack + tIndex}%.2fs")
    }
    spark.stop()
  }
}
