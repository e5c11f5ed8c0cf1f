package graft

import graft.operators.DedupOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: how does the dedup ladder scale with corpus size?
  *
  * Builds c× corpora by unioning copy-salted replicas of `documents`
  * (every token is prefixed with the copy id, so replicas share no
  * shingles — dup DENSITY stays that of the base corpus while SIZE grows
  * c×), then times MinHash-LSH (the sublinear scale path) and, optionally,
  * the exact inverted-index Jaccard baseline at each factor.
  *
  * `runMain graft.ScaleProbe [factors] [withExact]`, e.g.
  * `runMain graft.ScaleProbe 1,2,5,10 false`.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val factors = (if (args.nonEmpty) args(0) else "1,2,5,10")
      .split(",").map(_.trim.toInt).toSeq
    val withExact = args.length > 1 && args(1).toBoolean
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
    val n = base.count() // warm-up + size
    factors.foreach { c =>
      val corpus = (0 until c).map { i =>
        base.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
          regexp_replace(col("text"), "([a-z0-9]+)", s"c$i$$1").as("text"))
      }.reduce(_ unionAll _).localCheckpoint() // materialize: time ops, not prep
      def time(f: => Long): (Double, Long) = {
        val t0 = System.nanoTime()
        val rows = f
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val (lshT, lshRows) = time(
        DedupOps.minhashLshPairs(corpus, "doc_id", "text", n = 3,
          threshold = 0.5).count())
      spark.catalog.clearCache()
      val (scrubT, scrubRows) = time(
        DedupOps.boilerplateScrub(corpus, "doc_id", "text").count())
      spark.catalog.clearCache()
      val exact = if (withExact) {
        val (t, r) = time(DedupOps.ngramJaccardPairs(corpus, "doc_id", "text",
          n = 3, threshold = 0.5).count())
        spark.catalog.clearCache()
        f" exact=$t%.2fs ($r pairs)"
      } else ""
      // round-4 scale fixes: the distributed prefix sum (q67 shape) and the
      // single-pass bounded-broadcast decontamination (q79 shape)
      val (psT, psRows) = time(
        graft.operators.PrefixSum.runningSum(
          corpus.select(col("doc_id"),
            (length(col("text")) / 4).cast("long").as("toks")),
          "doc_id", "toks", "cum").count())
      spark.catalog.clearCache()
      val (deconT, deconRows) = time(
        DedupOps.decontaminate(corpus, "doc_id", "text", 4,
          col("doc_id") % 97 === 0).count())
      spark.catalog.clearCache()
      println(f"[scale] c=$c%2d docs=${n * c}%7d lsh=$lshT%.2fs ($lshRows pairs)" +
        f" scrub=$scrubT%.2fs ($scrubRows docs)" +
        f" prefixsum=$psT%.2fs ($psRows rows)" +
        f" decon=$deconT%.2fs ($deconRows docs)$exact")

      // round-4b operators. Passage dup runs on the SALTED corpus (keeps
      // dup density constant); BM25 + shard export run on unsalted
      // replicas (salting would empty the query-term postings).
      val (dpT, dpRows) = time(
        DedupOps.duplicatePassages(corpus, "doc_id", "text").count())
      spark.catalog.clearCache()
      val plain = (0 until c).map { i =>
        base.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
          col("text"))
      }.reduce(_ unionAll _).localCheckpoint()
      val (bmT, bmRows) = time(graft.operators.Bm25.topK(plain, "doc_id", "text",
        Seq("s1" -> "fast hash join", "s2" -> "stream filter vector"), 10).count())
      spark.catalog.clearCache()
      val (seT, seRows) = time(
        graft.operators.Relational.shardExport(plain, "doc_id", 16).count())
      spark.catalog.clearCache()
      // embeddings replicas are ROTATED per copy (norm-preserving, changes
      // direction) so cross-copy cosine stays uncorrelated and dup density
      // does not grow with c; nClusters scales with the corpus so per-cell
      // population — and thus per-cell pair cost — stays constant.
      val embBase = Tables(spark, sfDir, "embeddings").select("vec_id", "embedding")
      val embCorpus = (0 until c).map { i =>
        val rot = i % 16
        val e = if (rot == 0) col("embedding")
          else concat(slice(col("embedding"), rot + 1, 100000),
            slice(col("embedding"), 1, rot))
        embBase.select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
          e.as("embedding"))
      }.reduce(_ unionAll _).localCheckpoint()
      val (sdT, sdRows) = time(graft.operators.Similarity.semanticDedup(
        embCorpus, "vec_id", "embedding",
        nClusters = 8 * c, iters = 2, threshold = 0.4).count())
      spark.catalog.clearCache()
      println(f"[scale] c=$c%2d duppass=$dpT%.2fs ($dpRows docs)" +
        f" bm25=$bmT%.2fs ($bmRows rows) shard=$seT%.2fs ($seRows rows)" +
        f" semdedup=$sdT%.2fs ($sdRows vecs, k=${8 * c})")

      // round-4c: prefix-filter Jaccard and sparse TF-IDF cosine. These
      // need a LETTER salt ("aa", "bb", …, glued onto the leading token
      // run): the digit in the numeric salt splits under the [a-z]{3,}
      // word tokenizer, which would leave every copy with identical term
      // vectors and c² cross-copy cosine-1 pairs — the letter salt keeps
      // per-copy vocabularies disjoint so dup density stays constant.
      val lettered = (0 until c).map { i =>
        val salt = ('a' + (i % 26)).toChar.toString * 2
        base.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
          regexp_replace(col("text"), "([a-z0-9]+)", s"$salt$$1").as("text"))
      }.reduce(_ unionAll _).localCheckpoint()
      val (pjT, pjRows) = time(
        DedupOps.prefixJaccardPairs(lettered, "doc_id", "text",
          n = 3, threshold = 0.5).count())
      spark.catalog.clearCache()
      val (scT, scRows) = time(
        graft.operators.Similarity.sparseCosinePairs(lettered, "doc_id", "text",
          threshold = 0.9).count())
      spark.catalog.clearCache()
      println(f"[scale] c=$c%2d prefixjac=$pjT%.2fs ($pjRows pairs)" +
        f" sparsecos=$scT%.2fs ($scRows pairs)")

      // round-4d: token-budget fill (per-source window), Lloyd's k-means
      // (fixed k: assignment linear in n, update shuffle keyed k·d), and
      // the one-scan filter funnel.
      val (bfT, bfRows) = time(
        graft.operators.DataSelection.budgetFill(
          plain.withColumn("source", (col("doc_id") % 20).cast("string")),
          "doc_id", "text", "source", 3, 5).count())
      spark.catalog.clearCache()
      val (kmT, kmRows) = time(
        graft.operators.KMeansOps.clusterSummary(embCorpus, "vec_id",
          "embedding", k = 4, updates = 1).count())
      spark.catalog.clearCache()
      val (ffT, ffRows) = time(
        graft.operators.Profiling.filterFunnel(
          plain.select(length(col("text")).as("n_chars")),
          Seq("min_chars" -> (col("n_chars") >= 200),
            "max_chars" -> (col("n_chars") <= 500))).count())
      spark.catalog.clearCache()
      val (wnT, wnRows) = time(
        DedupOps.winnowingPairs(lettered, "doc_id", "text",
          k = 3, w = 4, minShared = 5L).count())
      spark.catalog.clearCache()
      println(f"[scale] c=$c%2d budgetfill=$bfT%.2fs ($bfRows sources)" +
        f" kmeans=$kmT%.2fs ($kmRows clusters) funnel=$ffT%.2fs ($ffRows rules)" +
        f" winnow=$wnT%.2fs ($wnRows pairs)")

      // round-5: the iterative graph family (q69/q85/q116/q121 shapes).
      // Edge replicas are node-OFFSET (disjoint copies): structure — and
      // therefore iteration/peel depth — stays that of the base graph while
      // edge count grows c×, so the expected curve is rounds × linear
      // per-round cost; a superlinear bend would flag a join whose cost is
      // not posting/degree-bounded.
      val tradeBase = Tables(spark, sfDir, "orders")
        .join(Tables(spark, sfDir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 10000000L).as("dst"))
        .distinct().localCheckpoint()
      val partBase = Tables(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
        .groupBy(col("l_orderkey")).agg(collect_set(col("l_partkey")).as("ps"))
        .select(explode(expr(
          "filter(flatten(transform(ps, x -> transform(ps, y -> struct(x, y))))," +
            " p -> p.x < p.y)")).as("p"))
        .select(col("p.x").as("x"), col("p.y").as("y")).distinct()
        .localCheckpoint()
      def offsetCopies(e: org.apache.spark.sql.DataFrame,
                       a: String, b: String) = (0 until c).map { i =>
        e.select((col(a) + lit(i.toLong * 1000000000L)).as(a),
          (col(b) + lit(i.toLong * 1000000000L)).as(b))
      }.reduce(_ unionAll _).localCheckpoint()
      val trade = offsetCopies(tradeBase, "src", "dst")
      val parts = offsetCopies(partBase, "x", "y")
      val (ccT, ccRows) = time(
        graft.operators.GraphOps.connectedComponents(trade, "src", "dst").count())
      spark.catalog.clearCache()
      val (prT, prRows) = time(
        graft.operators.GraphOps.pageRank(trade, "src", "dst", iters = 5).count())
      spark.catalog.clearCache()
      val triN = {
        val t0 = System.nanoTime()
        val r = graft.operators.GraphOps.triangleCount(parts, "x", "y")
          .head().getLong(1)
        ((System.nanoTime() - t0) / 1e9, r)
      }
      spark.catalog.clearCache()
      val (kcT, kcRows) = time(
        graft.operators.GraphOps.kCore(parts, "x", "y", k = 80).count())
      spark.catalog.clearCache()
      // round-5c iterative additions: 3-round LPA (node-offset replicas —
      // community structure per copy unchanged, work grows c×) and the
      // power-iteration spectrum over the rotated embedding replicas
      // (model-sized driver state, one scan per iteration)
      val (lpT, lpRows) = time(
        graft.operators.GraphOps.labelPropagation(trade, "src", "dst",
          rounds = 3).count())
      spark.catalog.clearCache()
      val (spT, spRows) = time(
        graft.operators.Similarity.spectrumAudit(embCorpus, "vec_id",
          "embedding", iters = 3).count())
      spark.catalog.clearCache()
      println(f"[scale] c=$c%2d edges=${trade.count()}%8d/${parts.count()}%8d" +
        f" cc=$ccT%.2fs ($ccRows nodes) pagerank=$prT%.2fs ($prRows nodes)" +
        f" triangles=${triN._1}%.2fs (${triN._2} tris)" +
        f" kcore=$kcT%.2fs ($kcRows vertices)" +
        f" lpa=$lpT%.2fs ($lpRows nodes) spectrum=$spT%.2fs ($spRows row)")
    }
    spark.stop()
  }
}

/** Dev tool: growth curves for the round-5 corpus-mining family
  * (q175-q179) alone — `runMain graft.TextMiningScaleProbe 1,2,5,10`.
  *
  * PMI/phrase run on PLAIN replicas (constant vocabulary, token count
  * grows c× — the realistic shape for both: more corpus, same language).
  * Novelty / CDC / the estimator audit run on LETTER-salted replicas
  * (disjoint per-copy vocabularies, so novelty density, chunk-recurrence
  * density and true-pair density stay those of the base corpus while
  * size grows c×). Expected curves: all scan-shaped linear — any
  * superlinear bend flags a join that is not posting/pair-bounded.
  */
object TextMiningScaleProbe {
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
    import graft.operators.TextMining
    val base = Tables(spark, sfDir, "documents").select("doc_id", "text")
    val n = base.count()
    factors.foreach { c =>
      def copies(salt: Boolean) = (0 until c).map { i =>
        val t = if (salt) {
          val s = ('a' + (i % 26)).toChar.toString * 2
          regexp_replace(col("text"), "([a-z0-9]+)", s"$s$$1")
        } else col("text")
        base.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
          t.as("text"))
      }.reduce(_ unionAll _).localCheckpoint()
      val plain = copies(salt = false)
      val lettered = copies(salt = true)
      def time(f: => Long): (Double, Long) = {
        val t0 = System.nanoTime()
        val rows = f
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val (pmT, pmRows) = time(
        TextMining.pmiCollocations(plain, "text", minCount = 5L).count())
      spark.catalog.clearCache()
      val (phT, phRows) = time(
        TextMining.phraseOccurrences(plain, "doc_id", "text",
          Seq("hash join", "sort merge", "sort merge join")).count())
      spark.catalog.clearCache()
      val (nvT, nvRows) = time(
        TextMining.noveltyProfile(lettered, "doc_id", "text", n = 3).count())
      spark.catalog.clearCache()
      val (cdT, cdRows) = time(
        DedupOps.cdcDupProfile(lettered, "doc_id", "text").count())
      spark.catalog.clearCache()
      val (meT, meRows) = time(
        DedupOps.minhashEstimateAudit(lettered, "doc_id", "text",
          n = 3, threshold = 0.5, k = 8).count())
      spark.catalog.clearCache()
      println(f"[scale] c=$c%2d docs=${n * c}%7d pmi=$pmT%.2fs ($pmRows pairs)" +
        f" phrase=$phT%.2fs ($phRows rows) novelty=$nvT%.2fs ($nvRows docs)" +
        f" cdc=$cdT%.2fs ($cdRows docs) mhest=$meT%.2fs ($meRows pairs)")
    }
    spark.stop()
  }
}

/** Dev tool: growth curves for the round-5b span-cleaning family
  * (q197-q201) — `runMain graft.SpanCleanScaleProbe 1,2,5,10`.
  *
  * All four run on PLAIN replicas: the benchmark slice replicates with
  * the corpus, so the bench gram SET stays base-sized while the marked
  * set grows c× (contamination density constant); intra-doc dedup and
  * the blocklist automaton are per-document scans. Expected curves:
  * scan-shaped linear — a superlinear bend would flag the span-merge
  * window or the bench join shuffling more than the marked subset.
  */
object SpanCleanScaleProbe {
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
    val n = base.count()
    factors.foreach { c =>
      // doc_id offsets are multiples of 97·10⁵ so the %97 benchmark rule
      // selects the SAME documents in every replica (density constant)
      val plain = (0 until c).map { i =>
        base.select((col("doc_id") + lit(i.toLong * 9700000L)).as("doc_id"),
          col("text"))
      }.reduce(_ unionAll _).localCheckpoint()
      def time(f: => Long): (Double, Long) = {
        val t0 = System.nanoTime()
        val rows = f
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val (dsT, dsRows) = time(
        DedupOps.decontaminateSpans(plain, "doc_id", "text", 4,
          col("doc_id") % 97 === 0).count())
      spark.catalog.clearCache()
      val (exT, exRows) = time(
        DedupOps.exciseContamination(plain, "doc_id", "text", 4,
          col("doc_id") % 97 === 0).count())
      spark.catalog.clearCache()
      val (idT, idRows) = time(
        DedupOps.intraDocDupSpans(plain, "doc_id", "text", 3).count())
      spark.catalog.clearCache()
      val (blT, blRows) = time(
        graft.operators.TextMining.blocklistHits(plain, "text",
          graft.queries.TextQueries.blocklistTerms).count())
      spark.catalog.clearCache()
      println(f"[scale] c=$c%2d docs=${n * c}%7d spans=$dsT%.2fs ($dsRows docs)" +
        f" excise=$exT%.2fs ($exRows docs) intradoc=$idT%.2fs ($idRows docs)" +
        f" blocklist=$blT%.2fs ($blRows terms)")
    }
    spark.stop()
  }
}

/** Dev tool: growth curves for the selection family (q221 k-center /
  * q222 greedy coverage) — `runMain graft.SelectionScaleProbe 1,2,5,10`.
  *
  * k-center runs on OFFSET replicas of `embeddings` (copy i shifts every
  * coordinate by i — replicas occupy disjoint regions, so the greedy
  * walk stays informative as the space grows); coverage runs on the
  * letter-salted document replicas (disjoint per-copy vocabularies, no
  * saturation). Both are fixed-k driver loops of full-corpus scans, so
  * the expected curves are scan-shaped linear in c — a superlinear bend
  * would flag a round that shuffles corpus-scale state.
  */
object SelectionScaleProbe {
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
    import graft.operators.{DataSelection, PortableAnn}
    val embBase = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val docBase = Tables(spark, sfDir, "documents").select("doc_id", "text")
    val nE = embBase.count()
    val nD = docBase.count()
    factors.foreach { c =>
      val vecs = (0 until c).map { i =>
        embBase.select(
          (col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
          transform(col("embedding"), x => x + lit(i.toDouble))
            .as("embedding"))
      }.reduce(_ unionAll _)
        .select(col("vec_id"), PortableAnn.quant(col("embedding")).as("qv"))
        .localCheckpoint()
      val corpus = (0 until c).map { i =>
        val s = ('a' + (i % 26)).toChar.toString * 2
        docBase.select(
          (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
          regexp_replace(col("text"), "([a-z0-9]+)", s"$s$$1").as("text"))
      }.reduce(_ unionAll _).localCheckpoint()
      def time(f: => Long): (Double, Long) = {
        val t0 = System.nanoTime()
        val rows = f
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val (kcT, kcRows) = time(
        DataSelection.kcenterCoreset(vecs, "vec_id", "qv", k = 8).count())
      spark.catalog.clearCache()
      val (gcT, gcRows) = time(
        DataSelection.greedyCoverage(corpus, "doc_id", "text",
          n = 3, k = 5).count())
      spark.catalog.clearCache()
      println(f"[scale] c=$c%2d vecs=${nE * c}%7d docs=${nD * c}%7d" +
        f" kcenter=$kcT%.2fs ($kcRows rows) coverage=$gcT%.2fs ($gcRows rows)")
    }
    spark.stop()
  }
}

/** Dev tool: is IVF search actually sublinear once the index LAYOUT does
  * the pruning? Builds c× corpora (interleaved ids so the first-k k-means
  * init spreads across replica regions; a +2i per-dim shift keeps regions
  * disjoint), trains nlist = 8·c cells (the √N-style rule: constant
  * expected CELL size as the corpus grows), writes the cell-partitioned
  * index (`IvfIndex.writeIndex`), then times per factor
  *  - exhaustive: `searchIndexed` over the full index, nprobe = nlist
  *    (reads every row — the brute-force baseline with identical code),
  *  - probed: `searchPruned`, nprobe = 3 (reads ONLY the probed cells'
  *    partitions — `cell IN (...)` partition pruning, IvfIndexSpec pin).
  * Expected: exhaustive grows ~c; probed stays ~flat (3 constant-size
  * cells per query, however big the corpus). Build cost (train + write)
  * is reported separately — it is the amortized index-once half.
  * `runMain graft.AnnScaleProbe 1,2,5,10`
  */
object AnnScaleProbe {
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
    import graft.operators.IvfIndex
    val embBase = Tables(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")
    val nE = embBase.count()
    factors.foreach { c =>
      val corpus = (0 until c).map { i =>
        embBase.select((col("vec_id") * c + i).as("vec_id"),
          transform(col("embedding"), x => x + lit(2.0 * i)).as("embedding"))
      }.reduce(_ unionAll _).localCheckpoint()
      val t0 = System.nanoTime()
      val model = IvfIndex.train(corpus, "vec_id", "embedding",
        k = 8 * c, iters = 2)
      val path = s"/tmp/graft_ann_probe_c$c"
      IvfIndex.writeIndex(corpus, "vec_id", "embedding", model, path)
      val buildT = (System.nanoTime() - t0) / 1e9
      // 5 anchors from replica 0 (ids 0, c, 2c, ...): fixed query count
      val queries = corpus
        .filter(col("vec_id") < lit(5L * c) && col("vec_id") % c === 0)
        .localCheckpoint()
      def time(f: => Long): (Double, Long) = {
        val t = System.nanoTime()
        val rows = f
        ((System.nanoTime() - t) / 1e9, rows)
      }
      val indexed = spark.read.parquet(path)
      // rows/files the index scan ACTUALLY read off disk — at local SFs
      // wall time is job-overhead-bound, so the sublinearity evidence is
      // the scan metrics: exhaustive reads the corpus, probed reads only
      // the probed cells' partitions
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def indexScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
        case a: AdaptiveSparkPlanExec => indexScans(a.executedPlan)
        case q: QueryStageExec => indexScans(q.plan) // AQE stage leaves
        case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains(path)) =>
          Seq(f)
        case other => other.children.flatMap(indexScans) ++
          other.subqueries.flatMap(indexScans)
      }
      def run(df: org.apache.spark.sql.DataFrame): (Double, Long, Long, Long) = {
        val t = System.nanoTime()
        // collect, not count: count() plans a NEW QueryExecution and the
        // scan metrics would accumulate there; collect() executes THIS
        // one (top-k output is 5 rows/query — driver-safe by shape)
        val rows = df.collect().length.toLong
        val dt = (System.nanoTime() - t) / 1e9
        val scans = indexScans(df.queryExecution.executedPlan)
        val read = scans.map(_.metrics("numOutputRows").value).sum
        val files = scans.map(_.metrics("numFiles").value).sum
        (dt, rows, read, files)
      }
      // warm one tiny pass to absorb codegen, then measure each path
      IvfIndex.searchPruned(spark, path, queries, "vec_id", "embedding",
        model, nprobe = 1, topK = 1).count()
      val (exT, exN, exRead, exFiles) = run(IvfIndex.searchIndexed(queries,
        indexed, "vec_id", "embedding", model, nprobe = 8 * c, topK = 5))
      val (prT, prN, prRead, prFiles) = run(IvfIndex.searchPruned(spark,
        path, queries, "vec_id", "embedding", model, nprobe = 3, topK = 5))
      println(f"[scale] c=$c%2d vecs=${nE * c}%8d nlist=${8 * c}%3d" +
        f" build=$buildT%.2fs" +
        f" exhaustive=$exT%.2fs ($exN rows, read=$exRead%d/$exFiles%d files)" +
        f" probed=$prT%.2fs ($prN rows, read=$prRead%d/$prFiles%d files)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

/** Dev tool: does the BATCH BQ search amortize the code-table scan? At
  * production the index is queried in batches (embed a shard of new
  * docs, find each one's neighbors): a per-query loop pays one full
  * code-table job per query; `BqIndex.searchBatch` answers the whole
  * bounded set in ONE scan (broadcast packed codes, per-query Hamming
  * rank windows, union-shortlist rerank). Expected: loop grows ~linear
  * in |queries|; batch stays ~flat until the windows dominate.
  * `runMain graft.BqBatchProbe 8,32,128`
  */
object BqBatchProbe {
  def main(args: Array[String]): Unit = {
    val qCounts = (if (args.nonEmpty) args(0) else "8,32,128")
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
    import graft.operators.{BqIndex, PortableAnn}
    val corpus = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), PortableAnn.quant(col("embedding")).as("qv"))
      .localCheckpoint()
    val dir = "/tmp/graft_bq_batch_probe"
    BqIndex.writeIndex(corpus, "vec_id", "qv", dir)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // absorb codegen/footers once
    BqIndex.searchBatch(spark, dir, corpus, corpus.filter(col("vec_id") < 2),
      "vec_id", "qv", shortlist = 50, topK = 10, excludeSelf = true).count()
    qCounts.foreach { nq =>
      val queries = corpus.filter(col("vec_id") < nq).localCheckpoint()
      val tBatch = time {
        BqIndex.searchBatch(spark, dir, corpus, queries, "vec_id", "qv",
          shortlist = 50, topK = 10, excludeSelf = true).count()
      }
      val qvecs = queries.select(col("vec_id"), col("qv")).collect()
      val tLoop = time {
        qvecs.foreach { r =>
          BqIndex.searchWithRerank(spark, dir, corpus, "vec_id", "qv",
            r.getSeq[Long](1).toArray, shortlist = 50, topK = 10,
            excludeId = Some(r.getLong(0))).count()
        }
      }
      println(f"[bqbatch] nq=$nq%4d batch=$tBatch%.2fs loop=$tLoop%.2fs " +
        f"speedup=${tLoop / tBatch}%.1fx")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
