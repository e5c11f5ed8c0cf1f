package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data selection for LM training mixtures: DSIR-style importance scores
  * (Xie et al. 2023, "Data Selection for Language Models via Importance
  * Resampling", arXiv:2302.03169), reduced to its deterministic unigram
  * form — score(doc) = Σ_w tf(w) · (ln p_target(w) − ln p_source(w)) with
  * add-one smoothing, i.e. the log importance weight of the doc under a
  * target-domain vs source-domain bag-of-words model. High scorers are
  * the source docs most target-like — the resampling pool.
  *
  * Scale shape: ONE corpus tokenize pass feeds both the vocabulary stats
  * (word-keyed aggregate) and the per-doc term frequencies; the log-ratio
  * table is vocabulary-sized and joins word-keyed (AQE broadcasts it when
  * measured small — at 100 TB vocabulary it stays a shuffle join, which
  * is the correct shape). Corpus-level totals are one 3-scalar aggregate.
  */
object DataSelection {

  /** The (word, lr) log-importance-ratio table learned from a corpus with
    * a target-domain slice. This is the STATIC model artifact: nightly
    * recompute feeds [[scoreWith]] over new batches or a stream.
    */
  def ratioTable(df: DataFrame, idCol: String, textCol: String,
                 targetPred: Column): DataFrame = {
    val toks = df.select(targetPred.as("__t"),
      explode(TextFns.words(col(textCol))).as("w"))
    val stats = toks.groupBy(col("w")).agg(
      sum(when(col("__t"), 1L).otherwise(0L)).as("tf_t"),
      sum(when(!col("__t"), 1L).otherwise(0L)).as("tf_s"))
    val g = stats.agg(sum("tf_t"), sum("tf_s"), count(lit(1))).head()
    val (nt, ns, v) = (g.getLong(0), g.getLong(1), g.getLong(2))
    stats.select(col("w"),
      (log((col("tf_t") + lit(1.0)) / lit((nt + v).toDouble))
        - log((col("tf_s") + lit(1.0)) / lit((ns + v).toDouble))).as("lr"))
  }

  /** Score docs against a precomputed ratio table: (idCol, n_tokens,
    * score 6dp). Words outside the table's vocabulary contribute nothing
    * (inner join) — the add-one-smoothed model only covers its corpus.
    */
  def scoreWith(ratio: DataFrame, docs: DataFrame, idCol: String,
                textCol: String): DataFrame =
    docs.select(col(idCol), explode(TextFns.words(col(textCol))).as("w"))
      .groupBy(col(idCol), col("w"))
      .agg(count(lit(1)).as("tf"))
      .join(ratio, Seq("w"))
      .groupBy(col(idCol))
      .agg(sum("tf").cast("long").as("n_tokens"),
        round(sum(col("tf") * col("lr")), 6).as("score"))

  /** Per-SOURCE-doc importance score: (idCol, n_tokens, score), score
    * rounded 6dp. `targetPred` marks the target-domain rows of `df`.
    */
  def dsirScores(df: DataFrame, idCol: String, textCol: String,
                 targetPred: Column): DataFrame =
    scoreWith(ratioTable(df, idCol, textCol, targetPred),
      df.filter(!targetPred), idCol, textCol)

  /** Greedy token-budget fill: downsample each source to a per-source
    * token budget (`src_tokens · num DIV den` — integer arithmetic, so
    * engines can't disagree at the boundary), taking docs in
    * deterministic-shuffle order (md5 of source#id, the q141 shard-export
    * trick) until the budget is full. This is the "fill an N-token
    * training mixture" selection step that follows a mixture-weight
    * decision (q81/q157).
    *
    * Returns one row per source: (source, src_tokens, budget_tokens,
    * n_docs_sel, sel_tokens, fill_x1e4). A doc is taken iff the running
    * token total *including it* stays ≤ budget; sources whose first doc
    * overshoots keep 0 docs (left join + coalesce).
    *
    * Scale shape: one narrow tokenize pass; budgets are a source-keyed
    * aggregate (source-cardinality rows, broadcast back); the running sum
    * is a window PARTITIONED BY source — the per-source sort is the
    * honest cost of greedy fill and shards across executors. No global
    * window, no driver loop. At extreme per-source skew the same result
    * can be computed with the two-pass distributed prefix sum
    * ([[PrefixSum]], q67's shape) over a re-partitioned source.
    */
  def budgetFill(df: DataFrame, idCol: String, textCol: String,
                 srcCol: String, num: Int, den: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = df.select(col(srcCol).as("source"), col(idCol).as("id"),
      TextFns.tokenCount(col(textCol)).as("n_tok"),
      md5(concat_ws("#", col(srcCol), col(idCol).cast("string"))).as("ord"))
    val budgets = tok.groupBy("source")
      .agg(sum("n_tok").cast("long").as("src_tokens"))
      .withColumn("budget_tokens", expr(s"src_tokens * $num div $den"))
    val cum = tok.withColumn("cum",
      sum("n_tok").over(Window.partitionBy("source").orderBy("ord", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val sel = cum
      .join(broadcast(budgets.select("source", "budget_tokens")), Seq("source"))
      .filter(col("cum") <= col("budget_tokens"))
      .groupBy("source")
      .agg(count(lit(1)).cast("long").as("n_docs_sel"),
        sum("n_tok").cast("long").as("sel_tokens"))
    budgets.join(sel, Seq("source"), "left")
      .select(col("source"), col("src_tokens"), col("budget_tokens"),
        coalesce(col("n_docs_sel"), lit(0L)).as("n_docs_sel"),
        coalesce(col("sel_tokens"), lit(0L)).as("sel_tokens"),
        when(col("budget_tokens") > 0,
          floor(coalesce(col("sel_tokens"), lit(0L)) * lit(10000.0)
            / col("budget_tokens") + lit(0.5)).cast("long"))
          .otherwise(lit(0L)).as("fill_x1e4"))
  }

  /** One doc entering the greedy packer: shard + deterministic order key +
    * token count. Kept object-level so the Dataset encoder is derivable.
    */
  private[graft] final case class PackIn(shard: Long, ord: String, id: Long,
                                         nTok: Long)

  /** Packer output: the doc's context-window index within its shard
    * (−1 = oversize, excluded), token count carried for the stats pass.
    */
  private[graft] final case class PackAssign(shard: Long, id: Long, bin: Long,
                                             nTok: Long)

  /** Greedy no-split sequence packing: assign whole docs, in deterministic
    * md5-shuffle order within a stable md5 shard, into fixed `budget`-token
    * context windows — the "pack documents into training sequences" step
    * between selection and tensorization (the Raffel et al. T5 / GPT-style
    * packer, in its no-document-crosses-a-boundary form, so no attention
    * mask ever spans two docs). A doc goes into the current window iff it
    * fits; otherwise a new window opens. Docs longer than `budget` are
    * marked oversize (`bin = -1`) and skipped — the caller routes those to
    * a chunker ([[Chunking]]) instead of silently truncating.
    *
    * Returns one row per doc: (shard, id, bin, nTok).
    *
    * Scale shape: packing is inherently sequential PER SHARD (each doc's
    * window depends on every earlier doc), so the shard is the unit of
    * distribution — production shards are bounded (fixed doc/token counts
    * per shard at export, q141), and at 100 TB there are tens of thousands
    * of them. One shuffle keys docs by shard; within each partition the
    * scan is a single forward pass with O(1) state (current window fill),
    * resetting at shard boundaries — group state never materializes, so a
    * hot shard streams instead of OOMing. No global sort, no driver state.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    budget: Long, nShards: Int): DataFrame = {
    require(budget > 0 && nShards > 0, "budget and nShards must be positive")
    val h = md5(col(idCol).cast("string"))
    val tok = df.select(
      (conv(substring(h, 1, 4), 16, 10).cast("int") % nShards)
        .cast("long").as("shard"),
      h.as("ord"), col(idCol).cast("long").as("id"),
      TextFns.tokenCount(col(textCol)).as("nTok"))
    packScan(tok, budget)
  }

  /** The greedy scan itself over prepared (shard, ord, id, nTok) rows:
    * shard-keyed shuffle, then one forward pass per partition with O(1)
    * state, resetting at shard boundaries. Shared by [[packSequences]]
    * (whole docs, oversize → −1) and [[packWithChunking]] (pieces, never
    * oversize).
    */
  private[graft] def packScan(tok: DataFrame, budget: Long): DataFrame = {
    val spark = tok.sparkSession
    import spark.implicits._
    tok.as[PackIn]
      // explicit count: exempt from AQE coalescing (Bm25.writeIndexBody);
      // shard-contiguity within partitions (what the pack scan needs) is
      // preserved at any partition count
      .repartition(spark.sessionState.conf.numShufflePartitions,
        col("shard"))
      .sortWithinPartitions("shard", "ord", "id")
      .mapPartitions { it =>
        var cur = Long.MinValue; var bin = -1L; var fill = 0L
        it.map { r =>
          if (r.shard != cur) { cur = r.shard; bin = -1L; fill = 0L }
          if (r.nTok > budget) PackAssign(r.shard, r.id, -1L, r.nTok)
          else {
            if (bin < 0L || fill + r.nTok > budget) { bin += 1L; fill = 0L }
            fill += r.nTok
            PackAssign(r.shard, r.id, bin, r.nTok)
          }
        }
      }
      .toDF()
  }

  /** One sweep row: greedy state for one budget at one doc. */
  private[graft] final case class SweepAssign(budget: Long, shard: Long,
                                              bin: Long, nTok: Long)

  /** Packing-budget tuning curve: the q184 greedy rule evaluated at
    * SEVERAL candidate context budgets in ONE corpus scan (per-budget
    * (bin, fill) state advances in lockstep down the same shard order) —
    * the padding-burn-vs-context-length evidence for choosing a training
    * sequence length, the q167 sensitivity-sweep idea applied to packing.
    * Returns one row per budget: windows, oversize docs, packed tokens,
    * padding, fill ×10⁴, aggregated over all shards.
    *
    * Scale shape: identical to [[packSequences]] — one shard-keyed
    * shuffle, one O(budgets)-state forward pass, then a (shard, budget)
    * aggregate folded to budget level. Sweeping b budgets costs one scan,
    * not b.
    */
  def packingSweep(df: DataFrame, idCol: String, textCol: String,
                   budgets: Seq[Long], nShards: Int): DataFrame = {
    require(budgets.nonEmpty && budgets.forall(_ > 0) && nShards > 0,
      "budgets must be positive and non-empty")
    val bs = budgets.distinct.sorted
    val spark = df.sparkSession
    import spark.implicits._
    val h = md5(col(idCol).cast("string"))
    val tok = df.select(
      (conv(substring(h, 1, 4), 16, 10).cast("int") % nShards)
        .cast("long").as("shard"),
      h.as("ord"), col(idCol).cast("long").as("id"),
      TextFns.tokenCount(col(textCol)).as("nTok"))
    val assigns = tok.as[PackIn]
      // explicit count: exempt from AQE coalescing (Bm25.writeIndexBody);
      // shard-contiguity within partitions (what the pack scan needs) is
      // preserved at any partition count
      .repartition(spark.sessionState.conf.numShufflePartitions,
        col("shard"))
      .sortWithinPartitions("shard", "ord", "id")
      .mapPartitions { it =>
        val budgetsArr = bs.toArray
        var cur = Long.MinValue
        val bin = Array.fill(budgetsArr.length)(-1L)
        val fill = Array.fill(budgetsArr.length)(0L)
        it.flatMap { r =>
          if (r.shard != cur) {
            cur = r.shard
            java.util.Arrays.fill(bin, -1L)
            java.util.Arrays.fill(fill, 0L)
          }
          budgetsArr.indices.map { j =>
            val b = budgetsArr(j)
            if (r.nTok > b) SweepAssign(b, r.shard, -1L, r.nTok)
            else {
              if (bin(j) < 0L || fill(j) + r.nTok > b) {
                bin(j) += 1L; fill(j) = 0L
              }
              fill(j) += r.nTok
              SweepAssign(b, r.shard, bin(j), r.nTok)
            }
          }
        }
      }
      .toDF()
    val perShard = assigns.groupBy(col("budget"), col("shard"))
      .agg((greatest(max(col("bin")), lit(-1L)) + 1L).as("bins"),
        coalesce(sum(when(col("bin") >= 0L, col("nTok"))), lit(0L))
          .as("packed"),
        count(when(col("bin") === -1L, lit(1))).as("over"))
    perShard.groupBy(col("budget"))
      .agg(sum(col("bins")).cast("long").as("n_bins"),
        sum(col("over")).cast("long").as("n_oversize"),
        sum(col("packed")).cast("long").as("packed_tokens"))
      .withColumn("padding_tokens",
        (col("n_bins") * col("budget") - col("packed_tokens")).cast("long"))
      .withColumn("fill_x1e4",
        when(col("n_bins") > 0L,
          floor(col("packed_tokens") * lit(10000.0)
            / (col("n_bins") * col("budget")) + lit(0.5)).cast("long"))
          .otherwise(lit(0L)))
  }

  /** Chunk-then-pack: the complete packing flow — docs longer than
    * `budget` are first split into ⌈n/budget⌉ deterministic token-window
    * pieces (what [[Chunking]] does to real text; here at the token-count
    * level the packer needs), then EVERYTHING packs greedily, so nothing
    * is left behind as oversize. Pieces keep their document's shuffle
    * position (piece index appended to the md5 order key), so a split doc
    * packs as consecutive pieces. Returns per-shard stats: piece count,
    * split-doc count, window count, packed tokens, padding, fill ×10⁴.
    *
    * Identity encoding: piece rows use id·10⁴ + pieceIdx (≤ 9999 pieces ≈
    * 1M tokens per doc — raise the multiplier and the order-key pad
    * together if a corpus exceeds that). Same scan, same scale shape as
    * [[packSequences]].
    */
  def packWithChunking(df: DataFrame, idCol: String, textCol: String,
                       budget: Long, nShards: Int): DataFrame = {
    require(budget > 0 && nShards > 0, "budget and nShards must be positive")
    val h = md5(col(idCol).cast("string"))
    val base = df.select(col(idCol).cast("long").as("docId"), h.as("h"),
      TextFns.tokenCount(col(textCol)).as("docTok"))
    val pieces = base.select(col("docId"), col("h"), col("docTok"),
        explode(sequence(lit(0L),
          expr(s"(greatest(docTok, 1L) - 1L) div $budget"))).as("piece"))
      .withColumn("pieceTok",
        greatest(least(lit(budget), col("docTok") - col("piece") * budget),
          lit(0L)))
    val tok = pieces.select(
      (conv(substring(col("h"), 1, 4), 16, 10).cast("int") % nShards)
        .cast("long").as("shard"),
      concat(col("h"), lit("#"),
        lpad(col("piece").cast("string"), 4, "0")).as("ord"),
      (col("docId") * 10000L + col("piece")).as("id"),
      col("pieceTok").as("nTok"))
    packScan(tok, budget)
      .groupBy(col("shard"))
      .agg(count(lit(1)).cast("long").as("n_pieces"),
        countDistinct(when(col("id") % 10000L > 0L, expr("id div 10000")))
          .cast("long").as("n_split_docs"),
        (greatest(max(col("bin")), lit(-1L)) + 1L).cast("long").as("n_bins"),
        coalesce(sum(col("nTok")), lit(0L)).cast("long").as("packed_tokens"))
      .withColumn("padding_tokens",
        (col("n_bins") * budget - col("packed_tokens")).cast("long"))
      .withColumn("fill_x1e4",
        when(col("n_bins") > 0L,
          floor(col("packed_tokens") * lit(10000.0)
            / (col("n_bins") * budget) + lit(0.5)).cast("long"))
          .otherwise(lit(0L)))
  }

  /** Per-shard packing efficiency over [[packSequences]]: window count,
    * oversize count, packed tokens, padding (the tokens a trainer burns on
    * pad-to-budget), and fill rate ×10⁴ (fixed-point floor(x+0.5) so
    * engines can't disagree at half-ulp). One doc-level aggregate keyed by
    * shard — the packing scan's output never re-sorts.
    */
  def packingStats(df: DataFrame, idCol: String, textCol: String,
                   budget: Long, nShards: Int): DataFrame =
    packStats(packSequences(df, idCol, textCol, budget, nShards), budget)

  /** Fold (shard, id, bin, nTok) assignments — from [[packSequences]] or
    * the Catalyst-node twin [[graft.plans.Packing.packSequences]] — into
    * the per-shard efficiency stats.
    */
  private[graft] def packStats(a: DataFrame, budget: Long): DataFrame = {
    a.groupBy(col("shard"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        count(when(col("bin") === -1L, lit(1))).cast("long").as("n_oversize"),
        (greatest(max(col("bin")), lit(-1L)) + 1L).cast("long").as("n_bins"),
        coalesce(sum(when(col("bin") >= 0L, col("nTok"))), lit(0L))
          .cast("long").as("packed_tokens"))
      .withColumn("padding_tokens",
        (col("n_bins") * budget - col("packed_tokens")).cast("long"))
      .withColumn("fill_x1e4",
        when(col("n_bins") > 0L,
          floor(col("packed_tokens") * lit(10000.0)
            / (col("n_bins") * budget) + lit(0.5)).cast("long"))
          .otherwise(lit(0L)))
  }

  /** Concat-and-cut packing audit — the OTHER packing discipline: docs are
    * concatenated in deterministic shard order and cut at every `budget`
    * tokens (the T5/GPT pretraining default), so padding exists only in
    * each shard's tail but documents straddle window boundaries (which
    * costs either cross-doc attention or a mid-doc truncation). This query
    * reports the tradeoff q184's no-split packer avoids: per shard, the
    * window count, the straddling-doc count, and the tail padding.
    *
    * Pure window math — the per-shard running sum IS the window id
    * (`(cum−1) div budget`), so unlike [[packSequences]] no sequential
    * scan exists at all: one keyed shuffle, one partitioned window, one
    * aggregate. All arithmetic integral (div, never floating division).
    */
  def concatPackStats(df: DataFrame, idCol: String, textCol: String,
                      budget: Long, nShards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget > 0 && nShards > 0, "budget and nShards must be positive")
    val h = md5(col(idCol).cast("string"))
    val tok = df.select(
      (conv(substring(h, 1, 4), 16, 10).cast("int") % nShards)
        .cast("long").as("shard"),
      h.as("ord"), col(idCol).cast("long").as("id"),
      TextFns.tokenCount(col(textCol)).as("nTok"))
    val w = Window.partitionBy("shard").orderBy("ord", "id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tok.withColumn("cum", sum("nTok").over(w))
      .withColumn("straddles",
        col("nTok") > 0L &&
          expr(s"(cum - nTok) div $budget") =!= expr(s"(cum - 1) div $budget"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum("nTok").cast("long").as("total_tokens"),
        count(when(col("straddles"), lit(1))).cast("long")
          .as("n_boundary_docs"))
      .withColumn("n_bins", expr(s"(total_tokens + $budget - 1) div $budget"))
      .withColumn("tail_padding",
        (col("n_bins") * budget - col("total_tokens")).cast("long"))
  }

  /** Exact top-fraction selection by score WITHOUT a global sort — "keep
    * the best `num/den` of the corpus by quality score", the selection
    * step after scoring (q154) and before packing (q184). Selection is
    * exact and deterministic: the score threshold is an exact order
    * statistic, and ties at the boundary score are broken by md5(id) (the
    * engine's stable-shuffle order), so two engines pick the same docs.
    *
    * k = N·num div den (integer). Docs with score strictly above the
    * boundary score are all in; the boundary-score group contributes its
    * first `k − (docs above)` members in md5 order.
    *
    * Scale shape: ONE corpus pass builds the fixed-point score histogram
    * (≤10⁶+1 rows by construction); the descending cumulative runs over
    * that histogram via the two-pass [[PrefixSum]]; the boundary bucket is
    * ONE collected row. The corpus is then filtered by broadcast scalar
    * threshold — only the boundary-score GROUP (tie-sized, not
    * corpus-sized) passes through a rank window, partitioned by its score
    * key. No global sort or corpus-wide window anywhere. If the boundary
    * group itself were pathologically hot (a corpus where half the docs
    * share one score), pre-salt the tie rank by md5 prefix — the
    * deterministic order makes the split associative.
    *
    * Returns the selected rows of `scored`: (idCol, score).
    */
  def topFractionByScore(scored: DataFrame, idCol: String,
                         num: Int, den: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(num >= 0 && den > 0, "need num >= 0 and den > 0")
    // checkpoint the narrow (id, score, key) projection: five downstream
    // actions (count, prefix-sum bounds/totals, boundary lookup, final
    // filters) would otherwise each replay the upstream scoring scan
    val sc = scored.select(col(idCol), col("score"),
        floor(col("score") * lit(1000000.0) + lit(0.5)).cast("long").as("__s"))
      .localCheckpoint()
    val n = sc.count()
    val k = n * num / den
    if (k <= 0L) return scored.filter(lit(false)).select(col(idCol), col("score"))
    val hist = sc.groupBy(col("__s")).agg(count(lit(1)).as("__cnt"))
      .withColumn("__negs", -col("__s"))
      .localCheckpoint() // distinct-score-sized; prefix sum reads it 3×
    val cum = PrefixSum.runningSum(hist, "__negs", "__cnt", "__cum")
    // boundary bucket: the highest-score bucket whose running total first
    // reaches k — everything above it is fully selected
    val b = cum.filter(col("__cum") - col("__cnt") < k)
      .orderBy(col("__s")).limit(1)
      .select(col("__s"), (lit(k) - (col("__cum") - col("__cnt"))).as("__take"))
      .head()
    val (sB, takeB) = (b.getLong(0), b.getLong(1))
    val above = sc.filter(col("__s") > sB).select(col(idCol), col("score"))
    val wTie = Window.partitionBy(col("__s"))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    val boundary = sc.filter(col("__s") === sB)
      .withColumn("__r", row_number().over(wTie))
      .filter(col("__r") <= takeB)
      .select(col(idCol), col("score"))
    above.unionByName(boundary)
  }

  /** Stride-scheduled source interleave — the final ORDERING step of the
    * mixture family (q81 weights → q157 temperature → q161 fill → this):
    * a training order where every source is spread uniformly instead of
    * appearing in contiguous blocks (blocked order = catastrophic
    * single-source gradient windows). Doc r of a source with Nₛ docs gets
    * virtual time t = r/Nₛ (per-source md5 rank order), and the global
    * ascending-t order interleaves sources proportionally to size —
    * classic stride scheduling, deterministic on any engine (one IEEE
    * division; ties broken by (source, id)).
    *
    * Returns (idCol, source, vt, shard) with shard = the doc's
    * 1/`nShards` virtual-time slice — consecutive shards ARE the training
    * order at file granularity, so the writer never needs a global sort:
    * per-shard counts of every source differ by at most 1 from Nₛ/nShards
    * (spec-pinned invariant).
    *
    * Scale shape: one per-source rank window (source-keyed shuffle) + a
    * broadcast of the source-count table. No global window or sort; the
    * order is materialized as a computed COLUMN, not a sort operation.
    */
  def stratifiedInterleave(df: DataFrame, idCol: String, srcCol: String,
                           nShards: Int, epoch: Long = 1L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nShards > 0, "nShards must be positive")
    // the epoch salts the per-source rank hash: every epoch gets a fresh,
    // equally-uniform order (multi-epoch training must not replay the
    // same sequence), and the same (epoch, corpus) always reproduces it
    val ordKey = md5(concat_ws("#", lit(epoch), col(idCol).cast("string")))
    val w = Window.partitionBy(col(srcCol)).orderBy(ordKey, col(idCol))
    val ranked = df.select(col(idCol), col(srcCol).as("source"))
      .withColumn("__r", row_number().over(w).cast("long"))
    val counts = df.groupBy(col(srcCol).as("source"))
      .agg(count(lit(1)).as("__n"))
    ranked.join(broadcast(counts), Seq("source"))
      .withColumn("vt", col("__r").cast("double") / col("__n"))
      .withColumn("shard",
        least(floor(col("vt") * nShards), lit(nShards - 1L)).cast("long"))
      .select(col(idCol), col("source"), col("vt"), col("shard"))
  }

  /** Leakage-free train/val/test assignment: the split hash runs over the
    * NEAR-DUP GROUP key, not the doc id, so every member of a near-dup
    * component lands in the same split BY CONSTRUCTION — closing the hole
    * q80's plain per-doc hash split leaves and q159's audit measures
    * (near-identical docs straddling train and test silently inflate
    * eval). Group key = connected-component id over exact n-gram-Jaccard
    * pairs (the component's minimum doc id); singletons group as
    * themselves, so their assignment is IDENTICAL to the plain q80 rule —
    * adopting this split re-assigns only documents that have a near-dup.
    *
    * Split rule (shared with q80): first hex char of md5(group_key) —
    * 0-9ab train (12/16), cd val (2/16), else test (2/16).
    *
    * Scale shape: pair generation here is the exact inverted-index engine
    * (the oracle baseline); at corpus scale pass [[DedupOps.minhashLshPairs]]
    * or [[DedupOps.prefixJaccardPairs]] output as `pairs` instead — the
    * component loop and the assignment are unchanged. Assignment itself
    * is one left join (components table is dup-bounded, far smaller than
    * the corpus) plus a narrow hash map.
    */
  def leakageFreeSplit(df: DataFrame, idCol: String, textCol: String,
                       n: Int, threshold: Double,
                       pairs: Option[DataFrame] = None): DataFrame = {
    val edges = pairs.getOrElse(
      DedupOps.ngramJaccardPairs(df, idCol, textCol, n, threshold))
    val comp = GraphOps.connectedComponents(edges, "id_a", "id_b")
      .select(col("id").as(idCol), col("component"))
    df.select(col(idCol))
      .join(comp, Seq(idCol), "left")
      .withColumn("group_key", coalesce(col("component"), col(idCol)))
      .withColumn("__h", substring(md5(col("group_key").cast("string")), 1, 1))
      .withColumn("split",
        when(col("__h").between("0", "9") || col("__h").isin("a", "b"), "train")
          .when(col("__h").isin("c", "d"), "val")
          .otherwise("test"))
      .select(col(idCol), col("group_key"), col("split"))
  }

  /** Greedy k-center coreset — Gonzalez (1985) farthest-first traversal
    * over a quantized-integer embedding column (see
    * [[PortableAnn.quant]]): seed with the lowest id, then k−1 times add
    * the point whose min squared-L2 distance to the chosen set is
    * largest (ties → lowest id). The classic 2-approximation for
    * diversity-maximizing subset selection — in training-data land, the
    * coreset/prototype picker that covers the embedding space with k
    * exemplars (each point is within `coverage_after` of a center).
    *
    * Determinism: distances are exact integer L2² over the quantized
    * vectors ([[graft.functions.LongDist2Expr]], codegen'd) and every
    * argmax is fully tie-broken, so the selection restates in SQL — the
    * q221 oracle unrolls these k rounds as DuckDB CTEs.
    *
    * Scale shape: k scans of the corpus, each ONE whole-stage-codegen'd
    * aggregate (`max(struct(dmin, -id, qv))` — no sort, no shuffle wider
    * than the 32-partition partial-max combine); driver state is the
    * selected k×d integer matrix (model-sized). The min-distance chain is
    * a collapsed projection against the ≤k broadcast center literals —
    * per-row cost O(k·d) multiply-adds, negligible against scan I/O; no
    * corpus-scale state is cached or checkpointed.
    *
    * Returns ≤ k driver-built rows (early-stop once every point
    * coincides with a chosen center): (sel_rank 1-based, idCol, d2_sel =
    * the point's min-distance² to the prior centers when chosen — 0 for
    * the seed — and coverage_after = max over ALL points of
    * min-distance² to centers 1..sel_rank, the covering-radius² curve).
    */
  def kcenterCoreset(df: DataFrame, idCol: String, qvCol: String,
                     k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol).cast("long").as("id"), col(qvCol).as("qv"))
    def d2To(center: Array[Long]): Column =
      graft.functions.LongVectorExprs.dist2(col("qv"),
        array(center.map(lit(_)): _*))

    val seedOpt = base.orderBy(col("id")).limit(1)
      .select(col("id"), col("qv")).collect().headOption
    if (seedOpt.isEmpty)
      return Seq.empty[(Long, Long, Long, Long)]
        .toDF("sel_rank", idCol, "d2_sel", "coverage_after")
    val seed = seedOpt.get
    val seedId = seed.getLong(0)
    var cur = base.withColumn("dmin", d2To(seed.getSeq[Long](1).toArray))
    // (rank, id, d2_sel) in selection order; coverage is stitched after.
    val picks = scala.collection.mutable.ArrayBuffer((1L, seedId, 0L))
    var round = 2
    var saturated = false
    while (round <= k && !saturated) {
      val m = kcenterArgmax(cur).head().getStruct(0)
      val (d2, id, cq) =
        (m.getLong(0), -m.getLong(1), m.getSeq[Long](2).toArray)
      // max dmin = 0 ⇒ every point coincides with a chosen center — a
      // further "farthest" pick is meaningless; stop like q222 does at
      // full coverage (unreachable on distinct-vector corpora, so the
      // unrolled oracle never sees the corner)
      if (d2 == 0L) saturated = true
      else {
        picks += ((round.toLong, id, d2))
        cur = cur.withColumn("dmin", least(col("dmin"), d2To(cq)))
        round += 1
      }
    }
    val covK = cur.agg(max(col("dmin"))).head().getLong(0)
    val rows = picks.toSeq.zipWithIndex.map { case ((r, id, d2), i) =>
      val cov = if (i + 1 < picks.length) picks(i + 1)._3 else covK
      (r, id, d2, cov)
    }
    rows.toDF("sel_rank", idCol, "d2_sel", "coverage_after")
  }

  /** One k-center round's argmax: `max(struct(dmin, -id, qv))` — a plain
    * partial-max aggregate (no sort, no window); exposed for the
    * PlanShapeSpec pin.
    */
  private[graft] def kcenterArgmax(cur: DataFrame): DataFrame =
    cur.agg(max(struct(col("dmin"), (-col("id")).as("nid"),
      col("qv").as("cq"))).as("m"))

  /** One coverage round's candidate table + argmax: broadcast ANTI join
    * against the picks-bounded covered set, then the same sortless
    * argmax; exposed for the PlanShapeSpec pin.
    */
  private[graft] def coverageRound(grams: DataFrame,
                                   pickedIds: Seq[Long]): DataFrame = {
    val cand =
      if (pickedIds.isEmpty) grams
      else {
        val covered = grams.filter(col("id").isin(pickedIds: _*))
          .select("shingle").distinct()
        grams.join(broadcast(covered), Seq("shingle"), "left_anti")
      }
    cand.groupBy("id").agg(count(lit(1)).as("gain"))
      .agg(max(struct(col("gain"), (-col("id")).as("nid"))).as("m"))
  }

  /** Greedy maximum-coverage document selection — the (1−1/e) submodular
    * greedy (Nemhauser/Wolsey/Fisher 1978): round i picks the document
    * covering the most word n-grams not yet covered by the picks so far
    * (ties → lowest id). The coverage-maximizing dual of [[kcenterCoreset]]:
    * k-center spreads exemplars in embedding space; this spreads them in
    * n-gram space — the "pick k docs that span the corpus vocabulary"
    * curation primitive.
    *
    * Scale shape: the distinct (doc, shingle) table materializes ONCE
    * (`localCheckpoint` — it is re-scanned every round), then each round
    * is one broadcast ANTI join against the covered-shingle set (bounded
    * by the k picked docs' shingles — model-sized, never corpus-sized)
    * plus one `max(struct)` argmax aggregate (no sort). Driver state is
    * the picked id list; the covered SET never leaves the cluster.
    *
    * Stops early if every shingle is covered. Returns ≤ k driver-built
    * rows (sel_rank, idCol, gain = newly covered shingles,
    * covered_total = running distinct-shingle coverage).
    */
  def greedyCoverage(df: DataFrame, idCol: String, textCol: String,
                     n: Int, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val grams = DedupOps.shingles(df, idCol, textCol, n)
      .select(col(idCol).cast("long").as("id"), col("shingle"))
      // lazy: round 1's argmax reads every partition and materializes
      // the gram table; rounds 2..k hit the cache
      .localCheckpoint(eager = false)
    val picks = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    var pickedIds = List.empty[Long]
    var coveredTotal = 0L
    var round = 1
    var saturated = false
    while (round <= k && !saturated) {
      val top = coverageRound(grams, pickedIds).head().getStruct(0)
      if (top == null) saturated = true
      else {
        val (gain, id) = (top.getLong(0), -top.getLong(1))
        coveredTotal += gain
        picks += ((round.toLong, id, gain, coveredTotal))
        pickedIds ::= id
        round += 1
      }
    }
    picks.toSeq.toDF("sel_rank", idCol, "gain", "covered_total")
  }
}
