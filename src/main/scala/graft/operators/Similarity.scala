package graft.operators

import graft.functions.VectorFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (reference O2 — cosine top-k
  * against the full store — plus the ANN scale path the reference lacks).
  *
  * Scale design:
  *  - `topK`: one narrow scan computing sim, then TakeOrderedAndProject
  *    (per-partition top-k + driver merge of k·partitions rows — no global
  *    sort, no shuffle of the corpus).
  *  - `knnJoin`: broadcast the (small) query side against the corpus scan;
  *    per-query top-k via window over a (queryId)-partitioned shuffle of
  *    only (queryId, vecId, sim) triples — never the vectors themselves.
  *  - `nearDupPairs`: exact all-pairs within the corpus — O(n²/2); correct
  *    baseline for the LSH variant. At 100 TB use `lshNearDupCandidates`
  *    (random-hyperplane bucketing) so only per-bucket pairs are generated.
  */
object Similarity {

  /** Normalize corpus once: adds `__norm`. */
  private def withNorm(df: DataFrame, embCol: String): DataFrame =
    df.withColumn("__norm", VectorFns.norm(col(embCol)))

  /** Top-k most-similar rows to one query vector (given as a literal array). */
  def topK(corpus: DataFrame, idCol: String, embCol: String,
           query: Array[Double], k: Int): DataFrame = {
    val q = lit(query)
    val qNorm = math.sqrt(query.map(x => x * x).sum)
    withNorm(corpus, embCol)
      .select(col(idCol),
        (VectorFns.dot(col(embCol), q) / (col("__norm") * lit(qNorm))).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** k-NN join: for every row of `queries`, its top-k neighbors from
    * `corpus` (self-matches excluded). Query side is broadcast.
    */
  def knnJoin(queries: DataFrame, corpus: DataFrame,
              idCol: String, embCol: String, k: Int): DataFrame = {
    val q = withNorm(queries, embCol)
      .select(col(idCol).as("query_id"), col(embCol).as("__qemb"),
        col("__norm").as("__qnorm"))
    val c = withNorm(corpus, embCol)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col(idCol))
    c.crossJoin(broadcast(q))
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol),
        (VectorFns.dot(col(embCol), col("__qemb"))
          / (col("__norm") * col("__qnorm"))).as("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Hard-negative mining (contrastive-training data prep): for each query
    * row, its top-k most-similar corpus rows with a DIFFERENT label — the
    * negatives that sit closest to the decision boundary. Same shape as
    * [[knnJoin]] (query side broadcast, per-query top-k heap) with the
    * label-mismatch predicate inside the codegen'd filter, so excluded
    * same-label rows never reach the window.
    */
  def hardNegatives(queries: DataFrame, corpus: DataFrame,
                    idCol: String, embCol: String, labelCol: String,
                    k: Int): DataFrame = {
    val q = withNorm(queries, embCol)
      .select(col(idCol).as("query_id"), col(labelCol).as("__qlabel"),
        col(embCol).as("__qemb"), col("__norm").as("__qnorm"))
    val c = withNorm(corpus, embCol)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col(idCol))
    c.crossJoin(broadcast(q))
      .filter(col(labelCol) =!= col("__qlabel"))
      .select(col("query_id"), col(idCol), col(labelCol),
        (VectorFns.dot(col(embCol), col("__qemb"))
          / (col("__norm") * col("__qnorm"))).as("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Exact embedding near-duplicate pairs: all (a<b) with cosine ≥ threshold.
    * O(n²/2) — the correctness baseline the LSH variant is judged against.
    */
  def nearDupPairs(df: DataFrame, idCol: String, embCol: String,
                   threshold: Double): DataFrame = {
    val a = withNorm(df, embCol)
      .select(col(idCol).as("id_a"), col(embCol).as("__ea"), col("__norm").as("__na"))
    val b = withNorm(df, embCol)
      .select(col(idCol).as("id_b"), col(embCol).as("__eb"), col("__norm").as("__nb"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (VectorFns.dot(col("__ea"), col("__eb")) / (col("__na") * col("__nb"))).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embeddings with the deterministic
    * [[IvfIndex]] k-means quantizer, then drop every vector that has a
    * lower-id neighbor IN THE SAME CLUSTER with cosine ≥ threshold. The
    * all-pairs search collapses to per-cluster pairs — O(Σ|c|²) instead of
    * O(n²), and each cluster's pair generation is local to its shuffle
    * partition, which is what makes semantic dedup feasible at corpus
    * scale. With nClusters = 1 the cluster restriction vanishes and the
    * drop set is exactly the all-pairs rule — that twin is SQL-oracled
    * (q137); the clustered path can only UNDER-drop (it misses cross-cluster
    * pairs), a containment pinned in SimilaritySpec.
    *
    * Output: (idCol, n_close_lower, kept) — kept = 1 iff no lower-id
    * same-cluster neighbor clears the threshold.
    */
  def semanticDedup(df: DataFrame, idCol: String, embCol: String,
                    nClusters: Int, iters: Int, threshold: Double): DataFrame = {
    val model = IvfIndex.train(df, idCol, embCol, nClusters, iters)
    val assigned = withNorm(IvfIndex.assign(df, embCol, model), embCol)
    val a = assigned.select(col("cell"), col(idCol).as("id_a"),
      col(embCol).as("__ea"), col("__norm").as("__na"))
    val b = assigned.select(col("cell"), col(idCol).as("id_b"),
      col(embCol).as("__eb"), col("__norm").as("__nb"))
    val dropped = a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .filter((VectorFns.dot(col("__ea"), col("__eb"))
        / (col("__na") * col("__nb"))) >= threshold)
      .groupBy(col("id_b").as(idCol))
      .agg(count(lit(1)).as("n_close_lower"))
    df.select(col(idCol))
      .join(dropped, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_close_lower"), lit(0L)).as("n_close_lower"),
        when(col("n_close_lower").isNull, lit(1L)).otherwise(lit(0L)).as("kept"))
  }

  /** Deterministic random hyperplanes (fixed seed — no runtime RNG). */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  /** Sign-random-projection LSH signature: bit i = (v · plane_i) >= 0. */
  def lshSignature(embCol: String, planes: Array[Array[Double]]) = {
    planes.zipWithIndex.map { case (p, i) =>
      when(VectorFns.dot(col(embCol), lit(p)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
  }

  /** ANN near-dup candidates via banded sign-LSH: rows sharing any band of
    * the signature land in one bucket; pairs are generated per bucket and
    * then verified with the exact cosine. Shuffle volume is O(n·bands), and
    * pair generation is local to each bucket — the 100 TB path.
    */
  def lshNearDupPairs(df: DataFrame, idCol: String, embCol: String,
                      threshold: Double, nPlanes: Int = 16, bands: Int = 4,
                      dim: Int = 64): DataFrame = {
    val planes = hyperplanes(nPlanes, dim)
    val bits = nPlanes / bands
    val sig = withNorm(df, embCol)
      .withColumn("__sig", lshSignature(embCol, planes))
    val banded = sig.select(
      col(idCol), col(embCol), col("__norm"), col("__sig"),
      explode(array((0 until bands).map { bIdx =>
        struct(lit(bIdx).as("band"),
          col("__sig").bitwiseAND(lit(((1L << bits) - 1) << (bIdx * bits))).as("key"))
      }: _*)).as("b"))
      .select(col(idCol), col(embCol), col("__norm"),
        col("b.band").as("band"), col("b.key").as("key"))
    val l = banded.select(col("band"), col("key"), col(idCol).as("id_a"),
      col(embCol).as("__ea"), col("__norm").as("__na"))
    val r = banded.select(col("band"), col("key"), col(idCol).as("id_b"),
      col(embCol).as("__eb"), col("__norm").as("__nb"))
    l.join(r, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (VectorFns.dot(col("__ea"), col("__eb")) / (col("__na") * col("__nb"))).as("sim"))
      .filter(col("sim") >= threshold)
      .dropDuplicates("id_a", "id_b")
  }

  /** Exact sparse TF-IDF cosine pair join over a TEXT column — the
    * lexical-vector complement of the dense-embedding [[nearDupPairs]]
    * and the set-Jaccard family: pairs whose tf·ln(N/df) vectors clear
    * `threshold` cosine. Tokens are the P9 word tokenizer (`[a-z]{3,}`).
    *
    * Scale shape: the pair join is an inverted term index (term-keyed
    * self-join), so cost is Σ|postings|² over INDEXED terms only.
    * Corpus-saturating terms (df = N) carry ln(N/df) = 0 — they cannot
    * move the dot product or the norms, so they are dropped BEFORE the
    * index is built: the hottest postings lists never exist, the exact
    * result is unchanged (the same trick `maxShingleDf` applies
    * heuristically is available here for free, from the weighting itself).
    * The threshold compares the 6-dp ROUNDED cosine in both engines, so
    * the keep/drop decision is taken on the value both report.
    */
  def sparseCosinePairs(df: DataFrame, idCol: String, textCol: String,
                        threshold: Double): DataFrame = {
    val nDocs = df.count()
    val tf = df
      .select(col(idCol), explode(graft.functions.TextFns.words(col(textCol)))
        .as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).cast("long").as("tf"))
    val termDf = tf.groupBy(col("term"))
      .agg(countDistinct(col(idCol)).cast("long").as("df"))
      .filter(col("df") < nDocs)
    val w = tf.join(broadcast(termDf), Seq("term"))
      .select(col(idCol), col("term"),
        (col("tf") * log(lit(nDocs.toDouble) / col("df"))).as("w"))
    val norms = w.groupBy(col(idCol)).agg(sqrt(sum(col("w") * col("w"))).as("norm"))
    val dots = w.select(col(idCol).as("id_a"), col("term"), col("w").as("w_a"))
      .hint("shuffle_hash")
      .join(w.select(col(idCol).as("id_b"), col("term"), col("w").as("w_b")),
        Seq("term"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(col("w_a") * col("w_b")).as("dot"))
    dots
      .join(norms.select(col(idCol).as("id_a"), col("norm").as("na")), Seq("id_a"))
      .join(norms.select(col(idCol).as("id_b"), col("norm").as("nb")), Seq("id_b"))
      .withColumn("cosine", round(col("dot") / (col("na") * col("nb")), 6))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
