package graft.operators

import graft.functions.VectorFns
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over a dense embedding column — the
  * clustering primitive under corpus organization (topic bucketing,
  * SemDeDup's cluster stage, IVF coarse quantizers). [[IvfIndex.train]]
  * runs the same loop shape for its coarse quantizer; this is the
  * general operator form with a deterministic init so an exact
  * unrolled-SQL oracle exists (same trick as q121's k-core unroll).
  *
  * Scale shape per iteration:
  *  - assignment: centroids are model-sized (k·d doubles) and BROADCAST;
  *    the corpus scan computes argmin squared-L2 via the codegen'd
  *    [[graft.functions.DotProductExpr]] (d² = v·v − 2·v·c + c·c) and a
  *    single min(struct) aggregate — one narrow pass, no shuffle of the
  *    vectors beyond the (id-keyed) argmin combine.
  *  - update: per-(cluster, dim) running means via posexplode — ONE
  *    shuffle whose key space is k·d (model-sized), partially aggregated
  *    map-side; the k·d result is collected to the driver (it IS the
  *    model), never the corpus.
  *
  * Deterministic init = the k lowest-id vectors (a production run would
  * seed with k-means|| — init strategy is orthogonal to the loop shape).
  * Empty clusters keep their previous centroid (standard Lloyd fix).
  */
object KMeansOps {

  private def vecs(df: DataFrame, idCol: String, vecCol: String) =
    df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))

  /** `updates` Lloyd rounds (assign + centroid update each) from the
    * deterministic init; returns the k centroids, index-aligned.
    */
  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int,
          updates: Int): Array[Array[Double]] = {
    val spark = df.sparkSession
    import spark.implicits._
    val v = vecs(df, idCol, vecCol)
    var centroids: Array[Array[Double]] = v.orderBy(col("id")).limit(k)
      .collect().map(_.getSeq[Double](1).toArray)
    for (_ <- 1 to updates) {
      val cdf = centroids.zipWithIndex.map { case (a, i) => (i, a) }
        .toSeq.toDF("c", "cv")
      val assigned = v.crossJoin(broadcast(cdf))
        .select(col("id"), col("v"), col("c"),
          (VectorFns.dot(col("v"), col("v"))
            - lit(2.0) * VectorFns.dot(col("v"), col("cv"))
            + VectorFns.dot(col("cv"), col("cv"))).as("d2"))
        .groupBy(col("id"))
        .agg(min(struct(col("d2"), col("c"), col("v"))).as("m"))
        .select(col("m.c").as("c"), col("m.v").as("v"))
      val dimMeans = assigned
        .select(col("c"), posexplode(col("v")).as(Seq("i", "x")))
        .groupBy(col("c"), col("i")).agg(avg(col("x")).as("m"))
        .collect()
      val next = centroids.map(_.clone())
      dimMeans.foreach { r: Row =>
        next(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
      }
      centroids = next
    }
    centroids
  }

  /** Assign every row to its nearest centroid of a FIXED model:
    * (idCol, cluster, d2). This is the model-APPLY half — reused by the
    * summary below and by the streaming twin
    * ([[graft.streaming.StreamingOps.streamKMeansAssign]]), where the
    * trained centroids are the static artifact each micro-batch joins.
    */
  def assignWith(model: Array[Array[Double]], df: DataFrame, idCol: String,
                 vecCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cdf = model.zipWithIndex.map { case (a, i) => (i, a) }
      .toSeq.toDF("c", "cv")
    vecs(df, idCol, vecCol).crossJoin(broadcast(cdf))
      .select(col("id"), col("c"),
        (VectorFns.dot(col("v"), col("v"))
          - lit(2.0) * VectorFns.dot(col("v"), col("cv"))
          + VectorFns.dot(col("cv"), col("cv"))).as("d2"))
      .groupBy(col("id"))
      .agg(min(struct(col("d2"), col("c"))).as("m"))
      .select(col("id").as(idCol), col("m.c").as("cluster"),
        col("m.d2").as("d2"))
  }

  /** Simplified (centroid-based) silhouette per cluster — the clustering
    * counterpart of the classifier/retrieval eval metrics (q187/q203):
    * for each point, a = distance to its own centroid, b = distance to
    * the nearest OTHER centroid, s = (b − a) / max(a, b) — which reduces
    * to 1 − a/b since b ≥ a by construction. The exact silhouette's
    * per-PAIR form is O(n²) and cannot run at corpus scale; the
    * centroid-based simplification (Hruschka et al.'s "simplified
    * silhouette") is the standard linear-time substitute and needs only
    * the k×dim model. Returns every cluster 0..k−1: (cluster, n_points,
    * mean_silhouette 6dp), empty clusters 0/0.0.
    *
    * Scale shape: one broadcast of the k×dim centroid table against a
    * single corpus scan (k·n distance rows), a per-point rank window
    * (k-row partitions), then a k-row aggregate — no corpus self-join,
    * no driver-side data beyond the model. d² is clamped at 0 before
    * sqrt (the dot-product identity can go −ε in floating point).
    */
  def silhouette(df: DataFrame, idCol: String, vecCol: String, k: Int,
                 updates: Int): DataFrame = {
    require(k >= 2, "silhouette needs at least two clusters")
    val spark = df.sparkSession
    import spark.implicits._
    val model = fit(df, idCol, vecCol, k, updates)
    val cdf = model.zipWithIndex.map { case (a, i) => (i, a) }
      .toSeq.toDF("c", "cv")
    val dists = vecs(df, idCol, vecCol).crossJoin(broadcast(cdf))
      .select(col("id"), col("c"),
        (VectorFns.dot(col("v"), col("v"))
          - lit(2.0) * VectorFns.dot(col("v"), col("cv"))
          + VectorFns.dot(col("cv"), col("cv"))).as("d2"))
    val w = Window.partitionBy(col("id")).orderBy(col("d2"), col("c"))
    val per = dists
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .groupBy(col("id"))
      .agg(min(when(col("rn") === 1, col("c"))).as("cl"),
        min(when(col("rn") === 1, col("d2"))).as("a2"),
        min(when(col("rn") === 2, col("d2"))).as("b2"))
      .select(col("cl"),
        when(col("b2") <= lit(0.0), lit(0.0))
          .otherwise((sqrt(greatest(col("b2"), lit(0.0)))
            - sqrt(greatest(col("a2"), lit(0.0))))
            / sqrt(greatest(col("b2"), lit(0.0)))).as("s"))
    val stats = per.groupBy(col("cl"))
      .agg(count(lit(1)).cast("long").as("n_points"),
        round(avg(col("s")), 6).as("mean_silhouette"))
    spark.range(0, k).toDF("cluster")
      .join(stats, col("cluster") === col("cl"), "left")
      .select(col("cluster"),
        coalesce(col("n_points"), lit(0L)).as("n_points"),
        coalesce(col("mean_silhouette"), lit(0.0)).as("mean_silhouette"))
      .orderBy(col("cluster"))
  }

  /** Per-cluster summary after `updates` Lloyd rounds: (cluster, n_points,
    * mean_d2 6dp) for every cluster id 0..k-1 (empty clusters emit 0/0.0).
    */
  def clusterSummary(df: DataFrame, idCol: String, vecCol: String, k: Int,
                     updates: Int): DataFrame = {
    val spark = df.sparkSession
    val model = fit(df, idCol, vecCol, k, updates)
    val stats = assignWith(model, df, idCol, vecCol)
      .groupBy(col("cluster").as("c"))
      .agg(count(lit(1)).cast("long").as("n_points"),
        round(avg(col("d2")), 6).as("mean_d2"))
    spark.range(0, k).toDF("cluster")
      .join(stats, col("cluster") === col("c"), "left")
      .select(col("cluster"),
        coalesce(col("n_points"), lit(0L)).as("n_points"),
        coalesce(col("mean_d2"), lit(0.0)).as("mean_d2"))
      .orderBy(col("cluster"))
  }
}
