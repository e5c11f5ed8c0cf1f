package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hashed-feature linear text classifier inference — the fastText-style
  * quality-filter shape (CCNet / LLaMA-style corpus pipelines score every
  * web document with a small linear model and keep the high-scoring tail):
  * tokenize, hash each token into a weight bucket, sum the weights, squash
  * through a sigmoid. The weights here are a deterministic closed form of
  * the bucket id (a stand-in for a trained vector — a real model would ride
  * along as a broadcast float array indexed by the same buckets); the
  * scoring plumbing is the real thing.
  *
  * Reproducibility: the token hash is the md5-low-64 convention shared with
  * [[DedupOps.simhashMd5]] (= DuckDB `md5_number_lower`), and the per-doc
  * weight sum is accumulated in INTEGER space — float addition order can
  * differ between engines, integer addition cannot — so the whole score is
  * recomputable bit-for-bit by a SQL oracle. The sigmoid is applied ONCE
  * per document to an integer-derived value, not accumulated.
  *
  * Scale shape: a pure per-row map over the corpus — no shuffle, no
  * explode, one text pass per document. At 100 TB this is the cheapest kind
  * of operator there is; the only cost that matters is reading the text
  * column, which column pruning already minimizes.
  */
object QualityClassifier {

  private val tokenRe = java.util.regex.Pattern.compile("[a-z0-9]+")

  /** Buckets = 2001 so the centered weight (b − 1000)/1000 spans [−1, 1]. */
  val NumBuckets = 2001L

  /** Per-document (token count, integer weight-bucket sum) in one pass. */
  private val featUdf = udf { text: String =>
    if (text == null) (0L, 0L)
    else {
      val m = tokenRe.matcher(text.toLowerCase(java.util.Locale.ROOT))
      var n = 0L
      var w = 0L
      while (m.find()) {
        n += 1
        w += java.lang.Long.remainderUnsigned(
          DedupOps.md5Low64Token(m.group()), NumBuckets)
      }
      (n, w)
    }
  }

  /** Score every row of `df`: returns (idCol, [carry...], n_tokens,
    * w_sum, score, keep) where score = sigmoid of the mean centered
    * bucket weight (scaled ×4 so corpus-typical means land on the
    * sigmoid's slope) and keep = score ≥ 0.5. Zero-token documents score
    * 0.5 by convention. `carry` columns ride through the (narrow) map —
    * downstream consumers that need, e.g., `source` next to the score
    * (q207's weighted sampler) get it without a corpus self-join.
    */
  def score(df: DataFrame, idCol: String, textCol: String,
            carry: Seq[String] = Nil): DataFrame = {
    val z = (col("w_sum") - lit(1000L) * col("n_tokens")) /
      (lit(250.0) * col("n_tokens"))
    val prob = when(col("n_tokens") === 0L, lit(0.5))
      .otherwise(round(lit(1.0) / (lit(1.0) + exp(-z)), 6))
    df.select(col(idCol) +: carry.map(col) :+ featUdf(col(textCol)).as("f"): _*)
      .select(col(idCol) +: carry.map(col)
        :+ col("f._1").as("n_tokens") :+ col("f._2").as("w_sum"): _*)
      .withColumn("score", prob)
      .withColumn("keep", (col("score") >= 0.5).cast("int"))
  }

  /** Exact ROC-AUC of a score column against 0/1 labels — the
    * discrimination summary next to q165's calibration curve. Computed as
    * the tie-corrected Mann–Whitney rank-sum: group once by distinct score
    * (fixed-point ×10⁶, so the key is integral and engine-portable), take
    * the cumulative negative count over the DISTINCT-SCORE table, and fold
    * `2U = Σ_s np(s)·(2·neg_below(s) + nn(s))` — ties contribute half,
    * with every term an exact integer until the single final division.
    *
    * Scale shape: the corpus is touched by ONE groupBy(score); ranking
    * happens on the distinct-score table (≤10⁶+1 rows by construction)
    * via the two-pass [[PrefixSum]] — no corpus sort, no SinglePartition
    * window anywhere. Returns one row: (n_pos, n_neg, u2, auc 6dp);
    * degenerate single-class inputs report auc = 0.
    */
  /** Exact average precision (area under the precision-recall curve in
    * its standard step form): AP = Σ_s np(s) · P(s) / N_pos over distinct
    * scores s descending, where P(s) = cumulative positives at-or-above s
    * over cumulative total at-or-above s — every positive contributes the
    * precision at its own score level, ties sharing one level (the
    * scikit-learn `average_precision_score` definition on quantized
    * scores). The complement of [[auc]] for imbalanced labels: ROC-AUC
    * saturates when negatives dominate, AP does not.
    *
    * Same scale shape as [[auc]]: ONE corpus groupBy(fixed-point score);
    * both cumulatives ride the two-pass [[PrefixSum]] over the
    * checkpointed distinct-score histogram (descending via the negated
    * key). Returns (n_pos, n_neg, ap 6dp); 0 when no positives.
    */
  def averagePrecision(scored: DataFrame, idCol: String, labels: DataFrame,
                       labelCol: String): DataFrame = {
    val sc = scored.select(col(idCol),
      floor(col("score") * lit(1000000.0) + lit(0.5)).cast("long").as("s"))
    val g = sc
      .join(labels.select(col(idCol), col(labelCol).cast("long").as("__l")),
        Seq(idCol))
      .groupBy(col("s"))
      .agg(sum(col("__l")).as("np"),
        (count(lit(1)) - sum(col("__l"))).as("nn"))
      .withColumn("__negs", -col("s"))
      .localCheckpoint() // PrefixSum runs 3 actions per call — see auc
    val c1 = PrefixSum.runningSum(g, "__negs", "np", "cum_np")
    val c = PrefixSum.runningSum(
      c1.withColumn("__n", col("np") + col("nn")), "__negs", "__n", "cum_all")
    c.agg(sum("np").cast("long").as("n_pos"),
        sum("nn").cast("long").as("n_neg"),
        coalesce(sum(col("np") * col("cum_np").cast("double")
          / col("cum_all")), lit(0.0)).as("__apSum"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0L, round(col("__apSum") / col("n_pos"), 6))
          .otherwise(lit(0.0)).as("ap"))
  }

  def auc(scored: DataFrame, idCol: String, labels: DataFrame,
          labelCol: String): DataFrame = {
    val sc = scored.select(col(idCol),
      floor(col("score") * lit(1000000.0) + lit(0.5)).cast("long").as("s"))
    // materialize the distinct-score histogram (≤10⁶+1 rows) once: the
    // prefix sum underneath runs three separate actions (bounds, bucket
    // totals, final agg), and without this each would replay the corpus
    // scoring scan (measured 2.4 s vs 0.4 s warm at sf0.1)
    val g = sc
      .join(labels.select(col(idCol), col(labelCol).cast("long").as("__l")),
        Seq(idCol))
      .groupBy(col("s"))
      .agg(sum(col("__l")).as("np"),
        (count(lit(1)) - sum(col("__l"))).as("nn"))
      .localCheckpoint()
    PrefixSum.runningSum(g, "s", "nn", "cum_nn")
      .agg(sum("np").cast("long").as("n_pos"),
        sum("nn").cast("long").as("n_neg"),
        coalesce(sum(col("np") *
          (lit(2L) * (col("cum_nn") - col("nn")) + col("nn"))), lit(0L))
          .cast("long").as("u2"))
      .select(col("n_pos"), col("n_neg"), col("u2"),
        when(col("n_pos") > 0L && col("n_neg") > 0L,
          round(col("u2") / (lit(2.0) * col("n_pos") * col("n_neg")), 6))
          .otherwise(lit(0.0)).as("auc"))
  }
}
