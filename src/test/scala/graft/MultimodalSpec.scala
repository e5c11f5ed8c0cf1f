package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  /** Synthesize a binary media table from documents (payload = utf8 bytes —
    * opaque to the pipeline, which is the point).
    */
  private def media = Tables(spark, sf, "documents")
    .select(col("doc_id").as("media_id"),
      lit("image").as("media_type"),
      col("text").cast("binary").as("payload"))

  test("decode stub attaches deterministic metadata per row") {
    val d1 = Multimodal.decode(media, "media_id", "payload")
    val d2 = Multimodal.decode(media, "media_id", "payload")
    assert(d1.count() == media.count())
    assert(d1.exceptAll(d2).count() == 0) // deterministic
    val row = d1.filter(col("media_id") === 0).collect()(0)
    assert(Set("png", "jpeg", "webp").contains(row.getAs[String]("format")))
    assert(row.getAs[Int]("width") >= 64)
  }

  test("feature extraction: L1-normalized 16-bin histogram, payload pruned") {
    val f = Multimodal.featureExtract(media, "media_id", "payload")
    assert(f.columns.toSeq == Seq("media_id", "features"))
    val feats = f.filter(col("media_id") === 0).collect()(0)
      .getAs[scala.collection.Seq[Float]]("features")
    assert(feats.size == 16)
    assert(math.abs(feats.sum - 1.0f) < 1e-3)
  }

  test("frame sampling keeps every stride-th frame") {
    val decoded = Multimodal.decode(media, "media_id", "payload")
    val frames = Multimodal.frameSample(decoded, stride = 10)
    val one = decoded.filter(col("media_id") === 0).collect()(0)
    val expected = (0 until one.getAs[Int]("n_frames") by 10).size
    assert(frames.filter(col("media_id") === 0).count() == expected)
  }

  test("resize spec clamps longer edge preserving aspect") {
    val decoded = Multimodal.decode(media, "media_id", "payload")
    val resized = Multimodal.resizeSpec(decoded, maxEdge = 256)
    resized.collect().foreach { r =>
      val (w, h) = (r.getAs[Int]("target_width"), r.getAs[Int]("target_height"))
      assert(w <= 256 || h <= 256)
      assert(math.max(w, h) <= 256 ||
        math.max(r.getAs[Int]("width"), r.getAs[Int]("height")) <= 256)
    }
  }

  test("binary-size partitioning bounds bytes per partition") {
    val parted = Multimodal.withBinaryPartitioning(media, "payload",
      targetBytes = 20000)
    assert(parted.rdd.getNumPartitions >= 2)
  }
}
