package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Okapi BM25 retrieval over a document corpus (Robertson & Zaragoza 2009,
  * "The Probabilistic Relevance Framework: BM25 and Beyond"). The reference
  * pipeline ranks papers by keyword relevance when building citation slices
  * (`metadata_enricher.py` keyword scoring family); BM25 is the standard
  * form of that capability at corpus scale.
  *
  * Plan shape (the 100 TB path):
  *   - one corpus scan → explode to (doc, term) postings, keyed aggregate
  *     for tf; `doc_len` rides along in the grouping key (functionally
  *     dependent on doc_id — adds no cardinality, saves a join);
  *   - postings are immediately semi-joined to the BROADCAST query-term
  *     table, so df/idf and scoring touch only matching postings — the
  *     inverted-index access pattern, never a full-corpus rescore;
  *   - corpus stats (N, avgdl) are two scalars collected once;
  *   - per-query top-k is a rank window over the scored postings, whose
  *     cardinality is bounded by (matching docs × queries), not the corpus.
  *
  * Scores are rounded to 6dp BEFORE ranking so ordering is stable across
  * engines (float tie order is not portable); doc_id breaks exact ties.
  */
object Bm25 {

  /** Tokenize a query string with the SAME tokenizer as the corpus side
    * (`TextFns.words`: lowercased `[a-z]{3,}` runs), deduplicated.
    */
  def queryTerms(q: String): Seq[String] =
    "[a-z]{3,}".r.findAllIn(q.toLowerCase).toSeq.distinct

  /** Top-k docs per query by BM25. `queries` = (query_id, query_text).
    * Output: (query_id, rank, doc_id-named idCol, score).
    */
  def topK(docs: DataFrame, idCol: String, textCol: String,
           queries: Seq[(String, String)], k: Int,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    val terms = queries.flatMap { case (qid, q) => queryTerms(q).map(qid -> _) }
      .toDF("query_id", "term")

    // Corpus stats: two scalars, one tiny job.
    val stats = docs.agg(
      count(lit(1)).cast("double").as("n"),
      avg(size(TextFns.words(col(textCol)))).as("avgdl")).head()
    val nDocs = stats.getDouble(0)
    // empty corpus: avg aggregates to null; 1.0 keeps tfNorm finite (the
    // posting table is empty anyway, so the value never scores a row)
    val avgdl = if (stats.isNullAt(1)) 1.0 else stats.getDouble(1)

    // Postings restricted to query terms: doc_len in the grouping key
    // (per-doc constant) so no second corpus pass or join is needed. The
    // term restriction happens as an ARRAY filter before the explode —
    // exploded cardinality is Σ(matching tokens), not Σ(doc_len); the
    // token array is materialized in the prior projection so the lambda
    // does not re-run the tokenizer regexp per element.
    val termSet = queries.flatMap { case (_, q) => queryTerms(q) }.distinct
    val postings = docs
      .select(col(idCol), TextFns.words(col(textCol)).as("__toks"))
      .select(col(idCol), size(col("__toks")).cast("long").as("doc_len"),
        explode(filter(col("__toks"), t => t.isInCollection(termSet))).as("term"))
      .groupBy(col(idCol), col("doc_len"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))

    scoreAndRank(postings, idCol, terms, nDocs, avgdl, k, k1, b)
  }

  /** Score + rank query-term-restricted postings (shared by [[topK]] and
    * [[topKIndexed]] — identical arithmetic, so the indexed path is
    * row-identical by construction). df per matching term is at most
    * |query terms| rows — broadcast back.
    */
  private def scoreAndRank(postings: DataFrame, idCol: String,
                           terms: DataFrame, nDocs: Double, avgdl: Double,
                           k: Int, k1: Double, b: Double): DataFrame = {
    val dfByTerm = postings.groupBy(col("term"))
      .agg(countDistinct(col(idCol)).cast("double").as("df"))

    val idf: Column = log(lit(1.0) +
      (lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm: Column = col("tf") * (lit(k1) + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("doc_len") / lit(avgdl)))

    val scored = postings
      .join(broadcast(dfByTerm), Seq("term"))
      .join(broadcast(terms), Seq("term"))
      .groupBy(col("query_id"), col(idCol))
      .agg(round(sum(idf * tfNorm), 6).as("score"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col(idCol))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col(idCol), col("score"))
  }

  /** The shard a term's postings live in: plain `String.hashCode` mod
    * nShards — the same JVM function computes it at build time (column)
    * and at query time (driver), so pruning and layout cannot diverge.
    */
  private def shardOf(term: String, nShards: Int): Int =
    math.floorMod(term.hashCode, nShards)

  /** Persist the FULL inverted index, TERM-SHARDED (the Lucene layout
    * idea on parquet): postings (id, doc_len, term, tf) partitioned by
    * `shard = hash(term) mod nShards`, plus a one-row stats table
    * (n_docs, avgdl). A query then reads only its terms' shards —
    * partition pruning bounds retrieval I/O by the query vocabulary, not
    * the corpus (the same layout property `IvfIndex.writeIndex` gives
    * vector search).
    */
  def writeIndex(docs: DataFrame, idCol: String, textCol: String,
                 path: String, nShards: Int = 64,
                 sharded: Boolean = true): Unit = {
    // a fresh build replaces everything — a stale tombstone sidecar OR
    // stale streaming segments from a previous index at this path must
    // not filter into / union into the new one (readers unconditionally
    // span $path/segments/batch=*); likewise any version manifests from
    // a previous index's compactions (the rebuild writes the plain
    // layout, which a stale manifest would shadow — a crash mid-rebuild
    // is a broken BUILD, acceptable; the availability-critical swap is
    // compaction, which stays versioned). A streaming-SEGMENT write
    // (target $path/segments/batch=<id>, always `sharded = false`) skips
    // the clears: a segment is an immutable mini-index that carries no
    // lifecycle state of its own, so they would be guaranteed no-ops —
    // and on an object store, 4+ wasted API calls per micro-batch.
    // gate the clears on the TARGET being a segment path, not on the
    // `sharded` flag: a non-segment `sharded = false` rebuild at a base
    // path (a first-class mode — hasRows treats the resulting non-empty
    // unpartitioned layout as a real, non-appendable index) must still
    // replace stale lifecycle state, or a _CURRENT manifest left by a
    // previous index's compaction silently shadows the fresh plain build.
    // The clears are destructive swap-class mutations, so a non-segment
    // rebuild takes the single-maintainer LEASE: unleased, a rebuild
    // racing a leased compaction deletes _CURRENT/_VERSIONED out from
    // under it, and the compactor's flip then re-creates a manifest
    // pointing at pre-rebuild data — exactly the stale-manifest
    // shadowing the clears exist to prevent. Segment writes stay
    // lease-free (the concurrent-safe path).
    if (!isSegmentPath(path))
      IndexLayout.withLease(docs.sparkSession, path, "Bm25.writeIndex") {
        IndexLayout.clearTombstones(docs.sparkSession, s"$path/tombstones")
        IndexLayout.clearSegments(docs.sparkSession, path)
        IndexLayout.clearVersions(docs.sparkSession, s"$path/postings")
        IndexLayout.clearVersions(docs.sparkSession, s"$path/docs")
        IndexLayout.clearVersions(docs.sparkSession, s"$path/stats")
        writeIndexBody(docs, idCol, textCol, path, nShards, sharded)
      }
    else {
      // a replayed micro-batch may be rewriting a dir an offline fold
      // already marked _FOLDED — the rewrite must come back LIVE or its
      // rows beyond the fold's partial capture are silently lost
      IndexLayout.clearFoldedMarker(docs.sparkSession, path)
      writeIndexBody(docs, idCol, textCol, path, nShards, sharded)
    }
  }

  /** The build itself — everything in [[writeIndex]] after the lifecycle
    * clears; runs under the rebuild lease for base paths, bare for
    * segment writes.
    */
  private def writeIndexBody(docs: DataFrame, idCol: String,
                             textCol: String, path: String,
                             nShards: Int, sharded: Boolean): Unit = {
    // codegen'd shard assignment (graft.functions.JavaHashModExpr):
    // same JVM hash as the driver-side shardOf, inlined into the build's
    // whole-stage-codegen pipeline instead of crossing the UDF bridge
    val shardCol = graft.functions.ShardExpr.javaHashMod(col("term"), nShards)
    // ONE doc-level tokenize pass, cached: the (id, doc_len) projection
    // feeds the stats aggregate, the emptiness probe (sum_len == 0 ⟺ no
    // exploded token anywhere) and the doc sidecar below — the previous
    // shape re-tokenized the whole corpus for each of the three (guide
    // §1.2: fix the pass count before the per-task work). The postings
    // build keeps its own full-token pass (it needs the terms, not just
    // the counts).
    val dl = docs.select(col(idCol),
      size(TextFns.words(col(textCol))).cast("long").as("doc_len"))
      .cache()
    try {
      // emptiness probe, only where it gates anything (the partitioned
      // write): a doc with tokens exists ⟺ some doc_len > 0 — a take(1)
      // over dl, not a corpus re-tokenize
      lazy val noTokens = dl.filter(col("doc_len") > 0).isEmpty
      val unclustered = docs
        .select(col(idCol), TextFns.words(col(textCol)).as("__toks"))
        .select(col(idCol), size(col("__toks")).cast("long").as("doc_len"),
          explode(col("__toks")).as("term"))
        .groupBy(col(idCol), col("doc_len"), col("term"))
        .agg(count(lit(1)).cast("double").as("tf"))
        .withColumn("shard", shardCol)
      // cluster by shard so the partitioned write below emits O(nShards)
      // files instead of tasks × nShards (skipped for unpartitioned small
      // segments, which need no clustering). The partition count is
      // EXPLICIT: a bare repartition(col) is AQE-coalescible, and the
      // measured effect at bench scale was the whole nShards-directory
      // write collapsing into ONE task (job-level profile: a single task
      // reading the entire clustering exchange) — serial file creation.
      // An explicit count is exempt from AQE coalescing, so ~nShards
      // tasks write ~one directory each, in parallel.
      val postings =
        if (sharded) unclustered.repartition(nShards, col("shard"))
        else unclustered
      val w = postings.write.mode("overwrite")
      // a zero-row partitioned write leaves no schema-bearing files and the
      // index would be unreadable — an empty corpus writes unpartitioned
      // (shard stays as a data column; the query-side filter still applies).
      // `sharded = false` (streaming SEGMENTS) also writes unpartitioned —
      // Lucene's small-segment shape: a micro-batch's postings are cheap to
      // scan in full, while a nShards-directory partitioned write is ~all
      // fixed cost at micro-batch size; compaction folds segments into the
      // base's pruned partitioned form.
      // segment path (sharded = false, streaming micro-batches): AQE is
      // disabled inside foreachBatch, so the post-aggregate stage stays
      // at shuffle.partitions width and the write emitted 32 tiny files
      // per micro-batch table. coalesce(1) collapses only the final
      // write stage (the tokenize map side keeps its parallelism) and
      // gives the Lucene-segment shape literally: one file per segment
      // table — segments are micro-batch-bounded by design and
      // compaction folds them into the clustered base.
      if (!sharded)
        unclustered.coalesce(1).write.mode("overwrite")
          .parquet(s"$path/postings")
      else if (noTokens) w.parquet(s"$path/postings")
      else w.partitionBy("shard").parquet(s"$path/postings")
      // the stats table aggregates the CACHED dl with the same operands
      // the raw-text aggregate used: n counts all docs, avg/sum/count of
      // doc_len skip null-text docs exactly as avg(size(words)) did —
      // bit-identical stats, one cached scan; same postings → stats →
      // sidecar write order as before the restructure
      dl.agg(count(lit(1)).cast("double").as("n"),
          avg(col("doc_len")).as("avgdl"),
          coalesce(sum(col("doc_len")).cast("double"), lit(0.0)).as("sum_len"),
          count(col("doc_len")).cast("double").as("n_len"))
        .withColumn("tomb_dirs", typedLit(Seq.empty[String]))
        .write.mode("overwrite").parquet(s"$path/stats")
      // doc-level sidecar (id, doc_len): doc-count-sized, the lookup table
      // [[removeFromIndex]] needs to shrink the stats EXACTLY without a
      // full postings scan (a doc's postings touch ~every shard — deletes
      // must never pay that read). doc_len is null for null text, mirroring
      // the avg's skip-nulls semantics. Segment sidecars coalesce like
      // segment postings (micro-batch-bounded, one file).
      (if (sharded) dl else dl.coalesce(1))
        .write.mode("overwrite").parquet(s"$path/docs")
    } finally dl.unpersist()
  }

  /** Whether a write target is a streaming-segment mini-index path
    * (shared layout convention — see [[IndexLayout.isSegmentPath]]).
    */
  private def isSegmentPath(path: String): Boolean =
    IndexLayout.isSegmentPath(path)

  /** Stats row: (n, avgdl, sum_len, n_len, tomb_dirs). Readers take
    * (n, avgdl) positionally; the EXACT token total and non-null-doc
    * count ride behind so [[appendToIndex]]/[[removeFromIndex]] can
    * merge stats bit-identically to a from-scratch avg — token counts
    * are integral, so the sums stay exact in doubles (≤ 2^53), and avgdl
    * recomputes as sum_len/n_len, the same two exact operands `avg`
    * divides (avgdl alone is already-rounded — n·avgdl would NOT
    * recover the sum; and the divisor must be the NON-NULL doc count,
    * because `avg` skips null-text docs while n counts them).
    *
    * `tomb_dirs` is the authoritative list of LIVE tombstone batch
    * directories — the reader's delete set. Keeping the list IN the
    * versioned stats row is what makes a removal atomic: the shifted
    * (n, avgdl) and the tombstone batch that explains the shift become
    * visible in the same manifest flip, so a reader scores either the
    * fully-pre or the fully-post state, never filtered postings against
    * unshifted stats (see [[removeFromIndex]]).
    *
    * Since the round-12 single-tokenize restructure the row is written
    * inside [[writeIndexBody]] from the cached (id, doc_len) projection —
    * same operands, same schema, one corpus scan fewer.
    */

  /** Threshold-gated maintenance recommendations for a [[writeIndex]]
    * layout ([[IndexLayout.maintenancePlan]]) — pure read, no lease.
    * BM25's delete batches are stats-listed DIRECTORIES (the atomic
    * removal design), so the batch count comes from the current stats
    * row, not a sidecar file listing.
    */
  def maintenancePlan(spark: org.apache.spark.sql.SparkSession, path: String,
                      t: IndexLayout.MaintenanceThresholds =
                        IndexLayout.MaintenanceThresholds())
      : IndexLayout.MaintenancePlan =
    IndexLayout.maintenancePlan(spark, s"$path/postings", s"$path/segments",
      s"$path/tombstones", path, t,
      tombstoneBatches = Some(tombstoneDirs(spark, path).size))

  /** One cron-able maintenance cycle for a BM25 layout — the
    * `IvfIndex.maintain` shape for a family with NO trained model (BM25
    * has no drift rail: df/idf re-derive from the postings at query
    * time), so the cycle is PLAN (segment/tombstone pressure,
    * [[maintenancePlan]]) → leased ACT ([[compactIndex]] — one pass
    * folds segments AND materializes tombstones). Acting skips
    * (reported) under a live lease. With the vector families'
    * `maintain`, every one of the five persisted layouts is a single
    * scheduled call.
    */
  def maintain(spark: org.apache.spark.sql.SparkSession, path: String,
               idCol: String = "doc_id",
               t: IndexLayout.MaintenanceThresholds =
                 IndexLayout.MaintenanceThresholds())
      : IndexLayout.MaintenanceOutcome = {
    val plan = maintenancePlan(spark, path, t)
    if (plan.actions.isEmpty || plan.lease.isDefined)
      IndexLayout.MaintenanceOutcome(plan, Seq.empty)
    else {
      compactIndex(spark, path, idCol)
      IndexLayout.MaintenanceOutcome(plan, Seq("compact"))
    }
  }

  /** The tombstone batch directories the CURRENT stats row lists — the
    * reader-visible delete set (staged-but-uncommitted and
    * already-folded batches under `$path/tombstones/rm_*` are not in
    * it). Empty for an index that never saw a removal.
    */
  private[graft] def tombstoneDirs(spark: org.apache.spark.sql.SparkSession,
                                   path: String): Seq[String] =
    readStatsRow(spark, IndexLayout.resolve(spark, s"$path/stats"))
      .map(tombDirsOf).getOrElse(Seq.empty)

  /** The `tomb_dirs` list of a stats row (empty for the pre-list legacy
    * schema and for segment stats rows, which never carry tombstones).
    */
  private def tombDirsOf(r: org.apache.spark.sql.Row): Seq[String] =
    if (r.schema == null) Seq.empty
    else r.schema.fieldNames.indexOf("tomb_dirs") match {
      case -1                 => Seq.empty
      case i if r.isNullAt(i) => Seq.empty
      case i                  => r.getSeq[String](i)
    }

  /** The tombstoned ids across a batch-directory list (None = no
    * removals — readers skip the anti-join entirely).
    */
  private def readTombIds(spark: org.apache.spark.sql.SparkSession,
                          dirs: Seq[String]): Option[DataFrame] =
    if (dirs.isEmpty) None else Some(spark.read.parquet(dirs: _*))

  /** Whether a stats row PREDATES the `tomb_dirs` list — the pre-upgrade
    * format whose removals appended LOOSE files under `$path/tombstones`
    * instead of staged rm_* batch directories. Detected from the stats
    * row every read already loads, so current-format indexes pay ZERO
    * extra filesystem calls for the legacy support.
    */
  private def isLegacyStats(r: org.apache.spark.sql.Row): Boolean =
    r.schema != null && (r.schema.fieldNames.indexOf("tomb_dirs") match {
      case -1 => true
      // a mergeSchema multi-layout read ([[readStatsRows]]) gives a
      // legacy 2-field row a present-but-NULL tomb_dirs — the field
      // exists in the MERGED schema, not in the row's file. New-format
      // writers always stamp a non-null list (typedLit(Seq.empty)), so
      // null ⇒ legacy; without this arm a legacy base + new segments
      // read skipped [[legacyTombFiles]] and loose-tombstoned docs
      // silently resurrected.
      case i => r.isNullAt(i)
    })

  /** The pre-list-format loose tombstone FILES directly under the
    * sidecar root (new-format batches are rm_* DIRECTORIES — their
    * nested files are not top-level, so the two formats cannot mix).
    * Consulted only when [[isLegacyStats]] says the index predates the
    * list (reads, removals) or during compaction (one listing per
    * compaction — which materializes and deletes them, completing the
    * migration): without this, a pre-upgrade index's deleted docs would
    * silently resurrect under the new reader.
    */
  private def legacyTombFiles(spark: org.apache.spark.sql.SparkSession,
                              path: String): Seq[String] =
    IndexLayout.tombstoneFiles(spark, s"$path/tombstones")

  /** Anti-join `df` against a tombstone id set (no-op for None). */
  private def dropIds(df: DataFrame, idCol: String,
                      ids: Option[DataFrame]): DataFrame =
    ids.fold(df)(t => df.join(t.toDF(idCol), Seq(idCol), "left_anti"))

  /** Fold a new document batch INTO a [[writeIndex]] layout — the
    * incremental lifecycle the IVF and dedup indexes already have
    * (`IvfIndex.appendToIndex` / `DedupOps.appendToDedupIndex`): postings
    * append under the SAME term-sharding, stats merge exactly. df/idf
    * need no maintenance — they are derived from the postings at query
    * time, so retrieval after an append is row-identical to an index
    * rebuilt from scratch over the union (pinned in Bm25Spec). Caller
    * contract (as for the sibling appends): batch ids are new.
    *
    * The stats merge is EXACT, not approximate: n adds, sum_len adds
    * (both integral-valued doubles, exact ≤ 2^53), and the merged
    * avgdl = sum_len/n divides the same two exact operands a full-corpus
    * `avg` would — bit-identical scores, so q228 shares q139's oracle.
    *
    * An index built on an EMPTY corpus has an unpartitioned zero-row
    * postings file (the readable-empty layout); appending shard=…
    * directories next to it would be a mixed layout Spark can't read, so
    * that case overwrites the empty file with a fresh partitioned build.
    *
    * Unlike the sibling appends (pure file adds), a BM25 append ends in
    * a STATS VERSION SWAP — and the merged row carries the current
    * `tomb_dirs` forward, so an unleased append racing a removal's
    * commit would read the pre-removal row and swap back a stats version
    * with the removal's batch UNLISTED: the removed docs silently
    * resurrect and the orphaned batch dir is swept at the next
    * compaction, irreversibly. BM25 appends therefore take the
    * single-maintainer lease (the postings/docs file appends keep the
    * cheaper `assertAppendVisible` detector as belt-and-braces; the
    * lease also closes the append-vs-flip strand-window the detector
    * could only detect). Streaming segments remain the lease-free
    * concurrent write path.
    */
  def appendToIndex(docs: DataFrame, idCol: String, textCol: String,
                    path: String, nShards: Int = 64): Unit =
    IndexLayout.withLease(docs.sparkSession, path, "Bm25.appendToIndex") {
      appendToIndexLeased(docs, idCol, textCol, path, nShards)
    }

  private def appendToIndexLeased(docs: DataFrame, idCol: String,
                                  textCol: String, path: String,
                                  nShards: Int): Unit = {
    val spark = docs.sparkSession
    val shardCol = graft.functions.ShardExpr.javaHashMod(col("term"), nShards)
    // ONE doc-level tokenize pass, cached — feeds the stats delta, the
    // emptiness probe (sum_len == 0) and the sidecar append; the batch
    // was previously re-tokenized for each (the writeIndexBody
    // restructure, applied to the append path)
    val dl = docs.select(col(idCol),
      size(TextFns.words(col(textCol))).cast("long").as("doc_len"))
      .cache()
    try {
    val delta = dl.agg(count(lit(1)).cast("double"),
      coalesce(sum(col("doc_len")).cast("double"), lit(0.0)),
      count(col("doc_len")).cast("double")).head()
    val postings = docs
      .select(col(idCol), TextFns.words(col(textCol)).as("__toks"))
      .select(col(idCol), size(col("__toks")).cast("long").as("doc_len"),
        explode(col("__toks")).as("term"))
      .groupBy(col(idCol), col("doc_len"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
      .withColumn("shard", shardCol)
      // explicit count: exempt from AQE coalescing (see writeIndexBody)
      .repartition(nShards, col("shard"))
    val noTokens = delta.getDouble(1) == 0.0
    if (!noTokens) {
      val mode =
        if (IndexLayout.partitionedLayout(spark, s"$path/postings", "shard"))
          "append"
        else {
          // readable-empty base: replace, don't mix layouts. A NON-empty
          // unpartitioned layout is a segment-style (sharded = false)
          // build — overwriting would silently drop its postings while
          // the stats below still merge additively; refuse instead.
          require(!IndexLayout.hasRows(spark, s"$path/postings"),
            s"$path/postings is a non-empty UNPARTITIONED layout (a " +
              "segment-style build) — not an append target; rebuild with " +
              "writeIndex(sharded = true) or compact first")
          "overwrite"
        }
      // append into the RESOLVED directory: after a versioned compaction
      // the live layout is $path/postings.v<n>, not the plain dir — and
      // a compaction FLIP racing this append must fail loudly, not
      // strand the rows in a retired version (IndexLayout's guard;
      // segments are the concurrent-safe write path)
      val target = IndexLayout.resolve(spark, s"$path/postings")
      postings.write.mode(mode).partitionBy("shard").parquet(target)
      IndexLayout.assertAppendVisible(spark, s"$path/postings", target)
    }
    val docsTarget = IndexLayout.resolve(spark, s"$path/docs")
    dl.write.mode("append").parquet(docsTarget)
    IndexLayout.assertAppendVisible(spark, s"$path/docs", docsTarget)
    writeMergedStats(spark, path, delta, sign = 1.0)
    } finally dl.unpersist()
  }

  /** Shift the persisted stats by a (n, sum_len, n_len) delta row —
    * +1 for appends, −1 for removals. The old row is collected BEFORE
    * the rewrite, so re-deriving from the same table is safe. All three
    * components are integral-valued doubles: the shifted values are
    * exact, and avgdl = sum_len/n_len matches a from-scratch avg bit
    * for bit.
    *
    * The rewrite is a VERSION SWAP, not an in-place overwrite: stats are
    * a one-row table every retrieval reads, and an in-place overwrite
    * has a delete-then-write window in which a reader silently loses the
    * base row (readStatsRow answers None and the layout sum is simply
    * missing a term — wrong, not loud). Swapping makes every LIVE-index
    * stats mutation atomic, the same discipline as postings/docs
    * compaction; fresh builds keep the plain overwrite (a crash there is
    * a broken build, not a serving index).
    */
  private def writeMergedStats(spark: org.apache.spark.sql.SparkSession,
                               path: String, delta: org.apache.spark.sql.Row,
                               sign: Double): Unit = {
    val old = readStatsRow(spark, IndexLayout.resolve(spark, s"$path/stats"))
    // a pre-sum_len (2-field) row cannot merge exactly — its token total
    // is unrecoverable; loud here too, not just in stageRemoval (an
    // append merging against oldSum=0 would serve garbage avgdl)
    require(old.forall(r => r.length > 3),
      s"$path/stats predates the exact (sum_len, n_len) totals — " +
        "rebuild or compact the index before appends/removals")
    // the merged row is ALWAYS list-format, so merging on a legacy index
    // must ADOPT the loose tombstone files into the list — otherwise one
    // append flips isLegacyStats off and the loose delete set silently
    // stops being consulted (resurrection, then sweep deletes the files)
    val tombDirs = old.map(tombDirsOf).getOrElse(Seq.empty) ++
      (if (old.exists(isLegacyStats)) legacyTombFiles(spark, path)
       else Seq.empty)
    IndexLayout.writeSwap(spark, s"$path/stats",
      mergedStatsDf(spark, old, delta, sign, tombDirs),
      None)
  }

  /** The one-row stats frame after shifting by a (n, sum_len, n_len)
    * delta, carrying `tombDirs` as the new live tombstone-batch list.
    * A missing old row merges against zeros — the base row an index
    * that only ever saw streaming segments starts from (its first
    * materialization is this swap, which a stale stats manifest can
    * never shadow because the swap goes through the manifest).
    */
  private def mergedStatsDf(spark: org.apache.spark.sql.SparkSession,
                            old: Option[org.apache.spark.sql.Row],
                            delta: org.apache.spark.sql.Row, sign: Double,
                            tombDirs: Seq[String]): DataFrame = {
    val (oldN, oldSum, oldNLen) = old match {
      case Some(r) =>
        (r.getDouble(0),
          if (r.length > 2 && !r.isNullAt(2)) r.getDouble(2) else 0.0,
          if (r.length > 3 && !r.isNullAt(3)) r.getDouble(3)
          else r.getDouble(0))
      case None => (0.0, 0.0, 0.0)
    }
    val n2 = oldN + sign * delta.getDouble(0)
    val s2 = oldSum + sign * delta.getDouble(1)
    val nLen2 = oldNLen + sign * delta.getDouble(2)
    import spark.implicits._
    Seq((n2, s2, nLen2)).toDF("n", "sum_len", "n_len")
      .select(col("n"),
        when(col("n_len") === 0.0, lit(null).cast("double"))
          .otherwise(col("sum_len") / col("n_len")).as("avgdl"),
        col("sum_len"), col("n_len"),
        typedLit(tombDirs).as("tomb_dirs"))
  }

  /** Tombstone documents OUT of a [[writeIndex]] layout — an O(batch)
    * staged tombstone directory plus ONE stats version-swap; NO shard is
    * rewritten (a doc's terms hash across ~every shard, so a physical
    * delete would rewrite the whole index). [[topKIndexed]] anti-joins
    * the LISTED tombstone batches before scoring, which also re-derives
    * df correctly (df is computed from the filtered postings at query
    * time); [[compactIndex]] materializes the removals. The stats shift
    * reads the removed docs' lengths from the doc sidecar — never the
    * postings. Ids not in the index (or already removed) are ignored.
    *
    * ATOMIC to readers: the staged batch directory is invisible until
    * the stats row listing it flips in ([[IndexLayout.writeSwap]] — one
    * manifest rename), and that same row carries the shifted n/avgdl.
    * A reader interleaving anywhere inside a removal therefore scores
    * either the fully-pre state (old stats, batch unlisted) or the
    * fully-post state (shifted stats, batch filtering) — never filtered
    * postings against unshifted stats, the torn state the earlier
    * append-tombstones-then-swap-stats sequence could expose for one
    * swap's duration (pinned in Bm25Spec "a reader between stage and
    * commit"). A crash before the commit leaves only an unlisted orphan
    * directory, swept by the next compaction.
    *
    * Removal is SWAP-CLASS maintenance and takes the index's
    * single-maintainer lease: it reads lifecycle state (the current
    * tombstone list, the sidecar) that a concurrent compaction snapshots
    * and rewrites, and its stats swap would race the compactor's
    * (see [[IndexLayout.acquireLease]]).
    */
  def removeFromIndex(ids: DataFrame, idCol: String, path: String): Unit = {
    val spark = ids.sparkSession
    IndexLayout.withLease(spark, path, "Bm25.removeFromIndex") {
      stageRemoval(spark, ids, idCol, path)
        .foreach(commitRemoval(spark, path, _))
    }
  }

  /** Step 1 of a removal (exposed for the atomicity spec): restrict the
    * batch to ids actually live in the index — sidecars ∩ batch minus
    * already-listed tombstones, so double-removal cannot double-shift —
    * write them as a STAGED (unlisted, reader-invisible) batch
    * directory, and return the one-row stats frame that
    * [[commitRemoval]] flips in: shifted totals + the list including
    * the new batch. None for a no-op batch (nothing live to remove).
    * The sidecar union spans base + streaming segments, so a doc that
    * only ever arrived through the stream still shifts the stats; the
    * shift lands on the BASE stats row (readers SUM the per-layout
    * rows, so the total stays exact even when the base row goes
    * negative component-wise).
    */
  private[graft] def stageRemoval(spark: org.apache.spark.sql.SparkSession,
                                  ids: DataFrame, idCol: String,
                                  path: String): Option[DataFrame] = {
    val sidecars = existingParts(spark, path, "docs")
    require(sidecars.nonEmpty, s"no index doc sidecar under $path")
    val old = readStatsRow(spark, IndexLayout.resolve(spark, s"$path/stats"))
    // a pre-sum_len (2-field) stats row cannot shift exactly — its token
    // total is unrecoverable (n·avgdl is already-rounded); loud, never a
    // silently-wrong avgdl
    require(old.forall(r => r.length > 3),
      s"$path/stats predates the exact (sum_len, n_len) totals — " +
        "rebuild or compact the index before removals")
    // legacy loose files join the listed set here, which MIGRATES them:
    // the swapped row lists them as ordinary batch entries (readable
    // paths), the double-removal guard sees their ids, and the next
    // compaction materializes them
    val listed = old.map(tombDirsOf).getOrElse(Seq.empty) ++
      (if (old.exists(isLegacyStats)) legacyTombFiles(spark, path)
       else Seq.empty)
    // every sidecar (base and segments) is the same-writer unpartitioned
    // (id, doc_len) table — ONE multi-path read, not one per layout
    val removed = dropIds(
      if (sidecars.length == 1) spark.read.parquet(sidecars.head)
      else spark.read.option("recursiveFileLookup", "true")
        .parquet(sidecars: _*), // no partition-dir columns in sidecars
      idCol, readTombIds(spark, listed))
      .join(ids.select(col(idCol)).distinct(), Seq(idCol), "left_semi")
      .distinct() // a crashed compaction can duplicate sidecar rows
      .cache()
    try {
      val delta = removed.agg(count(lit(1)).cast("double"),
        coalesce(sum(col("doc_len")).cast("double"), lit(0.0)),
        count(col("doc_len")).cast("double")).head()
      if (delta.getDouble(0) == 0.0) None
      else {
        val batchDir =
          s"$path/tombstones/rm_${java.util.UUID.randomUUID()}"
        removed.select(col(idCol)).write.mode("overwrite").parquet(batchDir)
        Some(mergedStatsDf(spark, old, delta, sign = -1.0,
          listed :+ batchDir))
      }
    } finally removed.unpersist()
  }

  /** Step 2 of a removal: the single reader-visible mutation — flip the
    * stats row (shifted totals + the batch now listed) in one version
    * swap.
    */
  private[graft] def commitRemoval(spark: org.apache.spark.sql.SparkSession,
                                   path: String,
                                   statsDf: DataFrame): Unit =
    IndexLayout.writeSwap(spark, s"$path/stats", statsDf, None)

  /** Segment-merge for the BM25 layout: rewrite postings clustered by
    * shard with tombstoned docs dropped (appends' small files merged,
    * removals made physical, streaming segments folded into the base),
    * rewrite the doc sidecar likewise, clear the segments and the
    * tombstones. Query results are identical before and after (pinned in
    * Bm25Spec).
    *
    * Crash semantics with segments: the fold is a DISTINCT union and the
    * stats recompute from the folded sidecar, so re-running a crashed
    * compaction converges (already-folded segments collapse into the
    * identical rows they duplicated). The segment list is SNAPSHOTTED
    * once — the fold reads exactly that set and the cleanup deletes
    * exactly that set, so a micro-batch landing a new segment while
    * compaction runs is neither folded nor deleted: it stays a readable
    * segment (its own stats row still sums in) and the next compaction
    * folds it. In the window between the base swap and the segment
    * cleanup, reads stay rank-correct for postings ([[topKIndexed]]
    * distincts its query-restricted multi-layout union) but can
    * over-count the summed stats — re-run `compactIndex` to repair.
    *
    * Pass `reshardTo = Some(n)` to RE-BUCKET the postings to a new shard
    * count during the fold — the lifecycle move for a corpus that
    * outgrew its build-time nShards (per-shard posting volume, and so
    * per-query read cost, grows with the corpus at fixed nShards; a
    * re-shard restores the constant per-shard volume a fresh build at n
    * would have). Same hash function, new modulus, recomputed from the
    * term column in the same pass that rewrites every shard anyway — a
    * re-sharding compaction costs no more I/O than a plain one.
    * Queries after it must pass the NEW nShards to [[topKIndexed]].
    */
  def compactIndex(spark: org.apache.spark.sql.SparkSession,
                   path: String, idCol: String = "doc_id",
                   reshardTo: Option[Int] = None): Unit =
    IndexLayout.withLease(spark, path, "Bm25.compactIndex") {
      compactIndexFolding(spark, path, idCol,
        IndexLayout.segmentDirs(spark, path), reshardTo)
    }

  /** Recompute the shard column at a new shard count (identity when
    * `reshardTo` is empty) — applied inside the compaction rewrite.
    */
  private def reshard(df: DataFrame, reshardTo: Option[Int]): DataFrame =
    reshardTo match {
      case Some(n) =>
        df.withColumn("shard",
          graft.functions.ShardExpr.javaHashMod(col("term"), n))
      case None => df
    }

  /** [[compactIndex]] over an explicit segment snapshot — split out so
    * the spec can replay the race where a segment arrives between the
    * snapshot and the cleanup.
    */
  private[graft] def compactIndexFolding(
      spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, segs: Seq[String],
      reshardTo: Option[Int] = None): Unit = {
    // the tombstone snapshot is the CURRENT stats row's batch list (the
    // reader-visible delete set); under the maintenance lease no removal
    // can extend it mid-fold. The fold drops exactly these ids, the
    // post-fold stats row lists nothing, and batch directories are
    // physically deleted only once no still-existing stats version lists
    // them (N-1 retention / pins for the delete set, mirroring the data
    // dirs) — a reader mid-scan on the just-retired stats row keeps the
    // batches its anti-join reads. A pre-list-format stats row pulls the
    // legacy loose tombstone files into the fold (and forces the stats
    // swap below), which MIGRATES the index: the post-fold row is
    // list-format, and the sweep retires the loose files once no
    // still-existing legacy row implies them.
    val statsRow =
      readStatsRow(spark, IndexLayout.resolve(spark, s"$path/stats"))
    val legacyFiles =
      if (statsRow.exists(isLegacyStats)) legacyTombFiles(spark, path)
      else Seq.empty
    val tombDirs = statsRow.map(tombDirsOf).getOrElse(Seq.empty) ++
      legacyFiles
    val tombIds = readTombIds(spark, tombDirs)
    if (segs.isEmpty) {
      val sharded =
        IndexLayout.partitionedLayout(spark, s"$path/postings", "shard")
      IndexLayout.rewriteInPlace(spark, s"$path/postings",
        if (sharded) Some("shard") else None,
        df => reshard(dropIds(df, idCol, tombIds), reshardTo))
      IndexLayout.rewriteInPlace(spark, s"$path/docs", None,
        dropIds(_, idCol, tombIds))
      // the shifted totals are already exact — the stats swap here only
      // retires the materialized batch list (skipped when there is
      // none); a legacy row swaps even with an empty list, migrating it
      // to the list format
      if (tombDirs.nonEmpty || statsRow.exists(isLegacyStats))
        swapStatsFromDocs(spark, path)
    } else {
      val postingsAll = IndexLayout.existingPartsOf(spark, path, segs, "postings")
        .map(spark.read.parquet(_)).reduce(_.unionByName(_)).distinct()
      IndexLayout.writeSwap(spark, s"$path/postings",
        reshard(dropIds(postingsAll, idCol, tombIds), reshardTo),
        Some("shard"))
      val docsAll = IndexLayout.existingPartsOf(spark, path, segs, "docs")
        .map(spark.read.parquet(_)).reduce(_.unionByName(_)).distinct()
      IndexLayout.writeSwap(spark, s"$path/docs",
        dropIds(docsAll, idCol, tombIds), None)
      // recompute the BASE stats row from the folded sidecar: the same
      // exact integral operands a from-scratch build aggregates, and
      // derived-from-folded state is what makes a crashed re-run
      // converge. An unfolded (post-snapshot) segment keeps its own
      // stats row, which readers still sum in. Atomic stats swap for
      // the same reader-window reason as removals — compaction runs
      // against a SERVING index.
      swapStatsFromDocs(spark, path)
    }
    // retire on BOTH branches: delete what the previous fold marked
    // (their one cycle of reader grace is up) and mark this fold's
    // snapshot (empty on the segment-less branch)
    IndexLayout.retireSegmentDirs(spark, s"$path/segments", segs)
    sweepTombstoneBatches(spark, path)
  }

  /** Swap in a stats row recomputed from the (folded) doc sidecar, with
    * an empty tombstone-batch list.
    */
  private def swapStatsFromDocs(spark: org.apache.spark.sql.SparkSession,
                                path: String): Unit =
    IndexLayout.writeSwap(spark, s"$path/stats",
      spark.read.parquet(IndexLayout.resolve(spark, s"$path/docs"))
        .agg(count(lit(1)).cast("double").as("n"),
          avg(col("doc_len")).as("avgdl"),
          coalesce(sum(col("doc_len")).cast("double"), lit(0.0)).as("sum_len"),
          count(col("doc_len")).cast("double").as("n_len"))
        .withColumn("tomb_dirs", typedLit(Seq.empty[String])),
      None)

  /** Delete tombstone batch directories no STILL-EXISTING stats layout
    * (current version, N-1 retained version, pinned snapshots) lists —
    * folded batches whose referencing stats versions have been GC'd,
    * plus orphans staged by a crashed removal. Run after every
    * compaction's stats swap: a batch folded by THIS compaction is
    * still listed by the just-retired stats version (kept one swap by
    * N-1 retention for readers mid-anti-join on it) and is swept by the
    * NEXT compaction — the delete set gets exactly the retention of the
    * data it filters. Batches are compared by their unique rm_<uuid>
    * leaf name, so stored-string vs fully-qualified path spellings
    * cannot desync the sweep.
    */
  private def sweepTombstoneBatches(
      spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val parent = new org.apache.hadoop.fs.Path(path)
    val fs = parent.getFileSystem(conf)
    if (!fs.exists(parent)) return
    val statsLayouts = fs.listStatus(parent).toSeq.filter { st =>
      val n = st.getPath.getName
      st.isDirectory && (n == "stats" || n.matches("stats\\.v\\d+"))
    }.map(_.getPath.toString)
    val rows = statsLayouts.flatMap(readStatsRow(spark, _))
    val keep: Set[String] = rows.flatMap(tombDirsOf)
      .map(d => d.substring(d.lastIndexOf('/') + 1)).toSet
    // a still-existing LEGACY stats layout (pre-list format, retained by
    // N-1 or a pin) implies EVERY loose file as its delete set — loose
    // files retire only once no such layout remains, the same retention
    // the listed batches get. (A legacy plain stats dir that is never
    // swapped again keeps its loose files on disk indefinitely — an
    // unlisted, never-read orphan, bounded by the pre-migration delete
    // volume; any later removal or fold retires it.)
    val keepAllLoose = rows.exists(isLegacyStats)
    val root = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    if (fs.exists(root)) {
      val entries = fs.listStatus(root).toSeq // one listing serves both
      entries
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("rm_")
          && !keep(st.getPath.getName))
        .foreach(st => fs.delete(st.getPath, true))
      if (!keepAllLoose) {
        entries
          .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet")
            && !keep(st.getPath.getName))
          .foreach(st => fs.delete(st.getPath, false))
      }
    }
  }

  private def existingParts(spark: org.apache.spark.sql.SparkSession,
                            path: String, sub: String): Seq[String] =
    IndexLayout.existingParts(spark, path, sub)

  private def readStatsRow(spark: org.apache.spark.sql.SparkSession,
                           dir: String): Option[org.apache.spark.sql.Row] =
    try Some(spark.read.parquet(dir).head())
    catch { case _: Throwable => None }

  /** All per-layout stats rows in ONE read (one Spark job) instead of a
    * head() job per layout — a streamed index holds base + one stats
    * row per live segment, and the per-layout heads were the measured
    * fixed cost of every indexed retrieval (guide §1: fewer actions).
    * `mergeSchema` keeps mixed legacy (2-field) and list-format rows
    * readable with the canonical column order — legacy first merges as
    * (n, avgdl) + appended (sum_len, n_len, tomb_dirs), new-format
    * first is already canonical, so the positional reads in
    * [[summedStats]]/[[tombDirsOf]] hold under both. Any failure falls
    * back to the per-dir reads (unreadable dirs skip individually).
    */
  private def readStatsRows(spark: org.apache.spark.sql.SparkSession,
                            dirs: Seq[String]): Seq[org.apache.spark.sql.Row] =
    dirs match {
      case Seq()  => Seq.empty
      case Seq(d) => readStatsRow(spark, d).toSeq
      case ds =>
        // recursiveFileLookup: without it a multi-root read over
        // `segments/batch=N/stats` dirs attempts partition discovery on
        // the batch= ancestors and throws CONFLICTING_DIRECTORY_
        // STRUCTURES into the fallback — the "one read" silently
        // degraded to per-dir reads whenever 2+ segments were live
        try spark.read.option("mergeSchema", "true")
          .option("recursiveFileLookup", "true").parquet(ds: _*)
          .collect().toSeq
        catch { case _: Throwable => ds.flatMap(readStatsRow(spark, _)) }
    }

  /** Exact (n, avgdl) across per-layout stats rows: the integral n /
    * sum_len / n_len components ADD exactly in doubles, and the summed
    * avgdl divides the same two exact operands a from-scratch avg over
    * the union would — bit-identical to a rebuild, which is what lets
    * the streamed index share the batch oracle. A legacy 2-field row
    * (single-layout only) falls back to its persisted avgdl.
    */
  private def summedStats(rows: Seq[org.apache.spark.sql.Row]): (Double, Double) =
    if (rows.isEmpty) (0.0, 1.0)
    else if (rows.length == 1 && rows.head.length < 3) {
      val r = rows.head
      (r.getDouble(0), if (r.isNullAt(1)) 1.0 else r.getDouble(1))
    } else {
      val n = rows.map(_.getDouble(0)).sum
      val sumLen = rows.map(r =>
        if (r.length > 2 && !r.isNullAt(2)) r.getDouble(2) else 0.0).sum
      val nLen = rows.map(r =>
        if (r.length > 3 && !r.isNullAt(3)) r.getDouble(3)
        else r.getDouble(0)).sum
      (n, if (nLen == 0.0) 1.0 else sumLen / nLen)
    }

  /** [[topK]] over a [[writeIndex]] layout: the query terms' shards are
    * computed driver-side and pushed as a partition filter, so the scan
    * reads ~|query terms|/nShards of the index (pinned in Bm25Spec);
    * within the read shards the term filter restricts to exactly the
    * query terms, and scoring proceeds identically to [[topK]] (df for a
    * query term is complete by construction — ALL its postings live in
    * its shard). Row-identical to the scan path.
    *
    * Spans the base layout plus any streaming segments
    * ([[graft.streaming.StreamingOps.streamBm25Index]]): each layout is
    * read with its own partition filter (pruning applies per segment),
    * stats sum exactly across the per-layout rows, and df/idf derive from
    * the unioned postings at query time — so a streamed index retrieves
    * row-identically to one rebuilt from scratch over everything.
    */
  def topKIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
                  idCol: String, queries: Seq[(String, String)], k: Int,
                  k1: Double = 1.2, b: Double = 0.75,
                  nShards: Int = 64): DataFrame = {
    val statsRows =
      readStatsRows(spark, existingParts(spark, path, "stats"))
    val layouts = existingParts(spark, path, "postings") match {
      case Seq() => Seq(s"$path/postings") // raise the standard read error
      case ls    => ls
    }
    // a pre-list-format stats row additionally pulls the legacy loose
    // tombstone files (one listing, only for unmigrated indexes)
    val legacy =
      if (statsRows.exists(isLegacyStats)) legacyTombFiles(spark, path)
      else Seq.empty
    topKOverLayouts(spark, layouts, statsRows,
      statsRows.flatMap(tombDirsOf).distinct ++ legacy, idCol, queries, k,
      k1, b, nShards, None)
  }

  /** [[topKIndexed]] over an already-acquired [[Snapshot]] — the entry
    * for reads that must pair with ANOTHER index's snapshot under one
    * consistency point ([[Hybrid.searchIndexed]]) or outlast a
    * compaction cycle. Scoring is [[topKIndexed]]'s, verbatim;
    * `extraExclude` drops ids beyond this index's own delete set BEFORE
    * scoring (df/idf re-derive over the remainder) — the cross-index
    * delete-union hook. The caller owns [[releaseSnapshot]].
    */
  def topKIndexedSnapshot(spark: org.apache.spark.sql.SparkSession,
                          snap: Snapshot, idCol: String,
                          queries: Seq[(String, String)], k: Int,
                          k1: Double = 1.2, b: Double = 0.75,
                          nShards: Int = 64,
                          extraExclude: Option[DataFrame] = None): DataFrame =
    topKOverLayouts(spark, snap.base +: snap.segPostings,
      readStatsRows(spark, snap.statsPaths), snap.tombSources,
      idCol, queries, k, k1, b, nShards, extraExclude)

  /** The shard-pruned scoring core shared by [[topKIndexed]] (fresh
    * resolve) and [[topKIndexedSnapshot]] (pinned snapshot): the layout
    * list, stats rows and delete-set sources are explicit, so the two
    * entries differ ONLY in how the snapshot was acquired.
    */
  private def topKOverLayouts(spark: org.apache.spark.sql.SparkSession,
                              layouts: Seq[String],
                              statsRows: Seq[org.apache.spark.sql.Row],
                              tombSources: Seq[String], idCol: String,
                              queries: Seq[(String, String)], k: Int,
                              k1: Double, b: Double, nShards: Int,
                              extraExclude: Option[DataFrame]): DataFrame = {
    import spark.implicits._
    val terms = queries.flatMap { case (qid, q) => queryTerms(q).map(qid -> _) }
      .toDF("query_id", "term")
    val termSet = queries.flatMap { case (_, q) => queryTerms(q) }.distinct
    val shards = termSet.map(shardOf(_, nShards)).distinct
    val (nDocs, avgdl) = summedStats(statsRows)
    // base read + ONE multi-path read over all segments (the
    // readStatsRows pattern): every segment is an unpartitioned table
    // from the same writer, so N segments cost one listing/footer/scan
    // setup instead of N — the per-segment fixed cost was the measured
    // LSM read-amplification slope (SegProbe). The base stays its own
    // read (partition-column layout ≠ the segments' data-column one).
    // recursiveFileLookup: a multi-root read would otherwise attempt
    // partition discovery over the shared `segments/batch=N` ancestors
    // and fail with CONFLICTING_DIRECTORY_STRUCTURES; segment tables
    // carry no partition-dir columns, so plain file listing is exact
    val segReads = layouts.tail match {
      case Seq()  => Seq.empty
      case Seq(s) => Seq(spark.read.parquet(s))
      case ss     => Seq(spark.read.option("recursiveFileLookup", "true")
        .parquet(ss: _*))
    }
    val unioned = (spark.read.parquet(layouts.head) +: segReads).map { df =>
      df.filter(col("shard").isin(shards.map(Integer.valueOf): _*))
        .filter(col("term").isInCollection(termSet))
        .drop("shard")
    }.reduce(_.unionByName(_))
    // a crashed compaction can leave a segment both folded and present;
    // distinct over the query-restricted (matching docs × terms, never
    // corpus-sized) union keeps scores exact in that window and is a
    // no-op cost otherwise. Single-layout reads skip it entirely.
    val deduped = if (layouts.length > 1) unioned.distinct() else unioned
    // tombstoned docs (see [[removeFromIndex]]) drop BEFORE scoring, so
    // df re-derives over live docs only; no-op when nothing was removed.
    // The delete set comes from the SAME stats rows that supplied
    // (n, avgdl) above — one resolved snapshot, so the filter and the
    // stats can never be torn against each other.
    val postings = dropIds(
      dropIds(deduped, idCol, readTombIds(spark, tombSources)),
      idCol, extraExclude)
    scoreAndRank(postings, idCol, terms, nDocs, avgdl, k, k1, b)
  }

  /** Copy the LIVE postings (base + streaming segments, tombstoned docs
    * dropped) to `outDir` as one shard-clustered parquet table — the
    * offline hand-off scan (training-data export, index migration,
    * cross-cluster copy). At 100 TB this is exactly the minutes-to-hours
    * full scan that can straddle SEVERAL compaction cycles, and N-1
    * retention alone only guarantees one.
    *
    * The snapshot — base-postings PIN, stats PIN, delete set, segment
    * list — is acquired as ONE consistent unit OPTIMISTICALLY (an
    * export is a read: it must neither fail because an hours-long
    * maintenance window holds the lease, nor make maintenance fail),
    * then the long scan runs under the pins. Each piece closes a
    * distinct race:
    *   - the base pin keeps the scanned version's files across any
    *     number of compactions ([[IndexLayout.pinResolved]]);
    *   - the STATS pin keeps the pinned row's tombstone BATCH DIRS on
    *     disk ([[sweepTombstoneBatches]] keeps every batch a
    *     still-existing stats layout lists — and a pinned layout exists
    *     until unpinned), so the export's anti-join never loses its
    *     input mid-scan;
    *   - CONSISTENCY between the two pins is validated, not locked: the
    *     base's effective version is re-read after everything else is
    *     pinned/listed — any fold/re-shard/retrain landing mid-snapshot
    *     flips the postings manifest, the re-check sees a different
    *     version (versions only grow — no ABA), both pins release and
    *     the snapshot retries. A removal landing mid-snapshot needs no
    *     retry: it swaps only stats, and its delete set paired with the
    *     unchanged physical base is exactly the removal's semantics.
    *     Without the check, pins taken one-after-another could pair a
    *     pre-fold base with a post-fold (empty) delete set and emit
    *     removed docs;
    *   - segments listed in the snapshot survive at least one fold
    *     ([[IndexLayout.retireSegmentDirs]] N-1 retention); an export
    *     expected to outlast SEVERAL folds should pause the fold
    *     schedule (segments have no pin mechanism — they are retired by
    *     the fold after the next).
    * Pins are released on every exit, including failure.
    */
  def exportLivePostings(spark: org.apache.spark.sql.SparkSession,
                         path: String, idCol: String,
                         outDir: String): Unit = {
    val snap = acquireSnapshot(spark, path)
    try {
      val layouts = snap.base +: snap.segPostings
      val unioned = layouts.map(spark.read.parquet(_))
        .reduce(_.unionByName(_))
      val deduped = if (layouts.length > 1) unioned.distinct() else unioned
      dropIds(deduped, idCol, readTombIds(spark, snap.tombSources))
        // explicit count: exempt from AQE coalescing (see writeIndexBody)
        .repartition(spark.sessionState.conf.numShufflePartitions,
          col("shard"))
        .write.mode("overwrite").parquet(outDir)
    } catch {
      case e: Throwable =>
        // snapshotted segments survive exactly ONE fold (N-1 retention);
        // an export that straddled two folds loses its segment dirs
        // mid-scan — name the cause instead of surfacing a bare
        // FileNotFound from deep in the scan
        val conf = spark.sparkContext.hadoopConfiguration
        val gone = snap.segPostings.filterNot { d =>
          val hp = new org.apache.hadoop.fs.Path(d)
          hp.getFileSystem(conf).exists(hp)
        }
        if (gone.nonEmpty) throw new IllegalStateException(
          s"export snapshot lost ${gone.size} segment dir(s) mid-scan " +
            s"(e.g. ${gone.head}) — the export outlived two folds; pause " +
            "the fold schedule and re-run the export", e)
        else throw e
    } finally releaseSnapshot(spark, path, snap)
  }

  /** One pinned, internally-validated read snapshot of a [[writeIndex]]
    * layout — the [[exportLivePostings]] acquisition REIFIED, so reads
    * that must pair with another index's snapshot under one consistency
    * point ([[Hybrid.searchIndexed]]) or span a long scan can hold it:
    * the resolved+pinned postings base, the pinned base stats layout
    * (whose pin keeps the listed tombstone batch dirs on disk —
    * `sweepTombstoneBatches` retains every batch a still-existing stats
    * layout lists), live segment postings/stats paths, and the delete-set
    * sources captured from the SAME stats read as the (n, avgdl) inputs.
    * Release with [[releaseSnapshot]] on every exit.
    */
  final case class Snapshot(base: String, baseTok: String, statsTok: String,
                            statsPaths: Seq[String],
                            segPostings: Seq[String],
                            tombSources: Seq[String])

  /** Acquire a [[Snapshot]] optimistically (a read must neither fail
    * because an hours-long maintenance window holds the lease, nor make
    * maintenance fail). ONE acquisition attempt per loop turn: pins
    * taken by an attempt are released on every failure path INSIDE it,
    * and the flip-detected retry releases both and returns None through
    * plain control flow — the retry happens in the loop OUTSIDE the
    * handlers, so a stale (already-released) token can never reach an
    * outer catch. Consistency is validated, not locked: the base's
    * effective version is re-read after everything else is pinned/listed
    * — any fold/re-shard/retrain landing mid-snapshot flips the postings
    * manifest (versions only grow — no ABA), both pins release and the
    * attempt retries, bounded.
    */
  def acquireSnapshot(spark: org.apache.spark.sql.SparkSession,
                      path: String): Snapshot = {
    def attemptOnce(): Option[Snapshot] = {
      val (base, baseTok) = IndexLayout.pinResolved(spark, s"$path/postings")
      try {
        val (pinnedStats, statsTok) =
          IndexLayout.pinResolved(spark, s"$path/stats")
        try {
          val conf = spark.sparkContext.hadoopConfiguration
          def lives(d: String): Boolean = {
            val hp = new org.apache.hadoop.fs.Path(d)
            hp.getFileSystem(conf).exists(hp)
          }
          val segRoots = IndexLayout.segmentDirs(spark, path)
          val statsPaths =
            pinnedStats +: segRoots.map(d => s"$d/stats").filter(lives)
          val statsRows = readStatsRows(spark, statsPaths)
          val legacy =
            if (statsRows.exists(isLegacyStats)) legacyTombFiles(spark, path)
            else Seq.empty
          val segs = segRoots.map(d => s"$d/postings").filter(lives)
          if (IndexLayout.resolve(spark, s"$path/postings") != base) {
            IndexLayout.unpin(spark, s"$path/stats", statsTok)
            IndexLayout.unpin(spark, s"$path/postings", baseTok)
            None
          } else
            Some(Snapshot(base, baseTok, statsTok, statsPaths, segs,
              statsRows.flatMap(tombDirsOf).distinct ++ legacy))
        } catch {
          case e: Throwable =>
            IndexLayout.unpin(spark, s"$path/stats", statsTok); throw e
        }
      } catch {
        case e: Throwable =>
          IndexLayout.unpin(spark, s"$path/postings", baseTok); throw e
      }
    }
    var snap: Option[Snapshot] = None
    var attempt = 0
    while (snap.isEmpty) {
      require(attempt < 5,
        s"$path/postings version keeps flipping mid-snapshot — " +
          "pause the compaction schedule and retry")
      snap = attemptOnce()
      attempt += 1
    }
    snap.get
  }

  /** Release a [[Snapshot]]'s pins (idempotent, token-scoped). */
  def releaseSnapshot(spark: org.apache.spark.sql.SparkSession,
                      path: String, snap: Snapshot): Unit = {
    IndexLayout.unpin(spark, s"$path/stats", snap.statsTok)
    IndexLayout.unpin(spark, s"$path/postings", snap.baseTok)
  }

  /** Exact retrieval-evaluation metrics for [[topK]]: per query, MRR,
    * recall@k and nDCG@k (binary gains) against deterministic boolean-AND
    * pseudo-qrels — a document is relevant to a query iff it contains
    * EVERY query term. The relevance rule is independent of the BM25
    * scoring formula (qrels don't tautologically reward the ranker) and
    * is restated verbatim by the SQL oracle. All three metrics are
    * emitted ×1e6 fixed point, with the DCG/IDCG terms floored to
    * integers BEFORE summing so the aggregation order cannot perturb the
    * result: (query_id, n_relevant, n_retrieved_relevant, mrr_x1e6,
    * recall_x1e6, ndcg_x1e6) — one row per query even at zero relevant.
    *
    * Scale shape: qrels come from the same array-filtered posting scan as
    * [[topK]] (exploded cardinality = matching tokens only) aggregated to
    * (query, doc) matched-term counts; everything downstream of that
    * aggregate — hits, first ranks, ideal-gain spines — is bounded by
    * (matching docs × queries), never the corpus. The queries/term tables
    * broadcast.
    */
  def evalMetrics(docs: DataFrame, idCol: String, textCol: String,
                  queries: Seq[(String, String)], k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranked = topK(docs, idCol, textCol, queries, k)
    val terms = queries.flatMap { case (qid, q) => queryTerms(q).map(qid -> _) }
      .toDF("query_id", "term")
    val nTerms = queries.map { case (qid, q) => (qid, queryTerms(q).size.toLong) }
      .toDF("query_id", "n_terms")
    val termSet = queries.flatMap { case (_, q) => queryTerms(q) }.distinct
    // binary-gain DCG term at 1-based rank r, floored to a long so sums
    // are integer-exact and engine-portable
    def gain(r: Column): Column =
      floor(lit(1000000.0) / log2(r + lit(1)) + lit(0.5)).cast("long")
    val qrel = docs
      .select(col(idCol), TextFns.words(col(textCol)).as("__toks"))
      .select(col(idCol),
        explode(filter(col("__toks"), t => t.isInCollection(termSet))).as("term"))
      .distinct()
      .join(broadcast(terms), Seq("term"))
      .groupBy(col("query_id"), col(idCol))
      .agg(count(lit(1)).as("__m"))
      .join(broadcast(nTerms), Seq("query_id"))
      .filter(col("__m") === col("n_terms"))
      .select(col("query_id"), col(idCol))
    val nRel = qrel.groupBy(col("query_id"))
      .agg(count(lit(1)).cast("long").as("n_relevant"))
    val hits = ranked.join(qrel, Seq("query_id", idCol))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).cast("long").as("n_retrieved_relevant"),
        min(col("rank")).cast("long").as("__first"),
        sum(gain(col("rank"))).cast("long").as("__dcg"))
    val ideal = nRel
      .select(col("query_id"),
        explode(sequence(lit(1L), least(col("n_relevant"), lit(k.toLong))))
          .as("__i"))
      .groupBy(col("query_id"))
      .agg(sum(gain(col("__i"))).cast("long").as("__idcg"))
    queries.map(_._1).toDF("query_id")
      .join(nRel, Seq("query_id"), "left")
      .join(hits, Seq("query_id"), "left")
      .join(ideal, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_relevant"), lit(0L)).as("n_relevant"),
        coalesce(col("n_retrieved_relevant"), lit(0L)).as("n_retrieved_relevant"),
        when(col("__first").isNull, lit(0L))
          .otherwise(floor(lit(1000000.0) / col("__first") + lit(0.5))
            .cast("long")).as("mrr_x1e6"),
        when(coalesce(col("n_relevant"), lit(0L)) === 0, lit(0L))
          .otherwise(floor(coalesce(col("n_retrieved_relevant"), lit(0L))
            * lit(1000000.0) / col("n_relevant") + lit(0.5)).cast("long"))
          .as("recall_x1e6"),
        when(col("__idcg").isNull || col("__dcg").isNull, lit(0L))
          .otherwise(floor(col("__dcg") * lit(1000000.0) / col("__idcg")
            + lit(0.5)).cast("long")).as("ndcg_x1e6"))
  }
}
