package graft

import graft.operators.{IvfIndex, Similarity}
import org.apache.spark.sql.functions._

class IvfIndexSpec extends SparkSpec {

  private def embs = Tables(spark, sf, "embeddings")
  private lazy val model = IvfIndex.train(embs, "vec_id", "embedding", k = 8, iters = 3)

  test("training is deterministic and produces k centroids") {
    assert(model.k == 8)
    val model2 = IvfIndex.train(embs, "vec_id", "embedding", k = 8, iters = 3)
    assert(model.centroids.map(_.toSeq).toSeq == model2.centroids.map(_.toSeq).toSeq)
  }

  test("assignment covers all rows and cells are within range") {
    val assigned = IvfIndex.assign(embs, "embedding", model)
    assert(assigned.count() == embs.count())
    val cells = assigned.select("cell").distinct().collect().map(_.getInt(0))
    assert(cells.forall(c => c >= 0 && c < 8))
    assert(cells.length > 1, "degenerate clustering: single cell")
  }

  test("nprobe = k recovers brute-force results exactly") {
    val queries = embs.filter(col("vec_id") < 5)
    val exact = Similarity.knnJoin(queries, embs, "vec_id", "embedding", 5)
      .select("query_id", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ann = IvfIndex.search(queries, embs, "vec_id", "embedding",
      model, nprobe = 8, topK = 5)
      .select("query_id", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(ann == exact)
  }

  test("small nprobe keeps useful recall at a fraction of the scan") {
    val queries = embs.filter(col("vec_id") < 20)
    val exact = Similarity.knnJoin(queries, embs, "vec_id", "embedding", 10)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = IvfIndex.search(queries, embs, "vec_id", "embedding",
      model, nprobe = 3, topK = 10)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall $recall too low even for nprobe=3")
    assert(ann.subsetOf(
      Similarity.knnJoin(queries, embs, "vec_id", "embedding", 2000)
        .select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet))
  }
}
