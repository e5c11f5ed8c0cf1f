package graft.embed

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding generation (reference `embeddings/embed_generator.py` +
  * `local_embedder.py`): text chunks → dense vectors, behind a pluggable
  * provider so the engine's correctness path never loads a model
  * (SURVEY.md §7.2 step 6: deterministic hash-based vectorizer for tests;
  * a real sentence-transformer/HTTP provider implements the same trait).
  *
  * Execution shape: `mapPartitions` with provider-supplied batching (the
  * reference's batch-100 semantics, `embeddings/config.py:60`) — one
  * provider instance per partition, vectors never collected to the driver;
  * output is a columnar `array<float>` parquet table, replacing the
  * reference's pickle store (SURVEY §7.5 risk 8).
  */
object Embedder {

  /** Batch embedding provider. Must be Serializable; `embed` receives up to
    * `batchSize` texts per call.
    */
  trait Provider extends Serializable {
    def dim: Int
    def batchSize: Int = 100
    def embed(texts: Seq[String]): Seq[Array[Float]]
  }

  /** Deterministic, model-free provider: L2-normalized token-hash random
    * projections. Stable across runs/JVMs (murmur-free: uses a fixed LCG on
    * string hashCode), so specs can hash outputs.
    */
  final class HashingProvider(override val dim: Int = 64) extends Provider {
    def embed(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
      val v = new Array[Float](dim)
      if (t != null) t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).foreach { tok =>
        var h = tok.hashCode.toLong & 0xffffffffL
        (0 until dim).foreach { i =>
          h = (h * 6364136223846793005L + 1442695040888963407L)
          v(i) += (((h >>> 33).toInt % 3) - 1).toFloat // -1, 0, 1
        }
      }
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      if (n > 0) (0 until dim).foreach(i => v(i) = (v(i) / n).toFloat)
      v
    }
  }

  /** Embed `textCol` of `df` → (idCol, embedding). Batches per partition. */
  def embedChunks(df: DataFrame, idCol: String, textCol: String,
                  provider: Provider): DataFrame = {
    val out = new StructType()
      .add("chunk_id", StringType)
      .add("embedding", ArrayType(FloatType))
    val idIdx = df.columns.indexOf(idCol)
    val txtIdx = df.columns.indexOf(textCol)
    df.mapPartitions { rows =>
      rows.grouped(provider.batchSize).flatMap { batch =>
        val vecs = provider.embed(batch.map(_.getString(txtIdx)))
        batch.zip(vecs).map { case (r, v) =>
          Row(r.get(idIdx).toString, v.toSeq)
        }
      }
    }(Encoders.row(out))
  }
}
