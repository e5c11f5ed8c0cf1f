package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8): compress each embedding dimension to one
  * unsigned byte with a per-dimension affine codebook
  * `v ≈ min_d + code · (max_d − min_d)/255` — the third rung of the
  * compression ladder next to [[IvfIndex]] (routing) and [[PqIndex]]
  * (subspace codebooks). 4× smaller than float32 with near-exact
  * distances; the standard default for "the vectors don't fit hot
  * storage but PQ recall is too lossy".
  *
  * Training is one posexplode + groupBy(dim) pass (per-dimension min/max —
  * `dim` rows collected, never corpus-sized); encoding is a narrow UDF
  * pass; search scans codes only and re-ranks a shortlist against the
  * full-precision vectors, so the expensive floats are touched for
  * `shortlist` rows per query. At `shortlist = corpus` the result is
  * EXACTLY brute-force top-k — the oracle-visible twin (q135), same trick
  * as q129/q130.
  */
object SqIndex {

  /** Per-dimension affine dequantization parameters. */
  final case class Model(mins: Array[Double], scales: Array[Double]) {
    def dim: Int = mins.length
  }

  /** Per-dimension min/max over the corpus: one narrow shuffle keyed on
    * the dimension index, `dim` rows to the driver.
    */
  def train(df: DataFrame, embCol: String): Model = {
    val stats = df
      .select(posexplode(col(embCol)).as(Seq("pos", "v")))
      .groupBy(col("pos"))
      .agg(min(col("v").cast("double")).as("mn"),
        max(col("v").cast("double")).as("mx"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    val mins = stats.map(_._2)
    val scales = stats.map { case (_, mn, mx) =>
      val s = (mx - mn) / 255.0
      if (s > 0) s else 1.0 // constant dimension: every code is 0
    }
    Model(mins, scales)
  }

  /** Adds `qcode`: one byte per dimension (narrow map, no shuffle). */
  def encode(df: DataFrame, embCol: String, model: Model): DataFrame = {
    val enc = udf { v: Seq[Float] =>
      val out = new Array[Byte](model.dim)
      var i = 0
      while (i < model.dim) {
        val c = math.round((v(i) - model.mins(i)) / model.scales(i)).toInt
        out(i) = math.max(0, math.min(255, c)).toByte
        i += 1
      }
      out
    }
    df.withColumn("qcode", enc(col(embCol)))
  }

  /** Approximate squared-L2 of one query against the codes (bytes only —
    * the float vectors are never read), then exact re-rank of the
    * `shortlist` best on full precision. Ties broken by id everywhere.
    */
  def searchWithRerank(corpus: DataFrame, idCol: String, embCol: String,
                       model: Model, query: Array[Double],
                       shortlist: Int, topK: Int): DataFrame = {
    val approx = udf { code: Array[Byte] =>
      var d = 0.0
      var i = 0
      while (i < code.length) {
        val x = model.mins(i) + (code(i) & 0xFF) * model.scales(i) - query(i)
        d += x * x
        i += 1
      }
      d
    }
    val cand = encode(corpus, embCol, model)
      .select(col(idCol), approx(col("qcode")).as("approx_dist"))
      .orderBy(col("approx_dist"), col(idCol))
      .limit(shortlist)
    val exact = udf { v: Seq[Float] =>
      var d = 0.0
      var i = 0
      while (i < v.length) { val x = v(i) - query(i); d += x * x; i += 1 }
      d
    }
    corpus.join(cand.select(idCol), Seq(idCol), "left_semi")
      .select(col(idCol), exact(col(embCol)).as("dist"))
      .orderBy(col("dist"), col(idCol))
      .limit(topK)
  }
}
