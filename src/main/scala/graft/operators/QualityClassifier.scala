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

  /** Score every row of `df`: returns (idCol, n_tokens, w_sum, score,
    * keep) where score = sigmoid of the mean centered bucket weight
    * (scaled ×4 so corpus-typical means land on the sigmoid's slope) and
    * keep = score ≥ 0.5. Zero-token documents score 0.5 by convention.
    */
  def score(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val z = (col("w_sum") - lit(1000L) * col("n_tokens")) /
      (lit(250.0) * col("n_tokens"))
    val prob = when(col("n_tokens") === 0L, lit(0.5))
      .otherwise(round(lit(1.0) / (lit(1.0) + exp(-z)), 6))
    df.select(col(idCol), featUdf(col(textCol)).as("f"))
      .select(col(idCol), col("f._1").as("n_tokens"), col("f._2").as("w_sum"))
      .withColumn("score", prob)
      .withColumn("keep", (col("score") >= 0.5).cast("int"))
  }
}
