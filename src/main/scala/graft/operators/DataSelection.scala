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
}
