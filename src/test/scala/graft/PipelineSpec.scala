package graft

import graft.functions.TextFns
import graft.operators.Chunking
import org.apache.spark.sql.functions._

/** End-to-end checks of the §7.3 flagship slice (q39): clean → gate →
  * chunk → denormalize → aggregate.
  */
class PipelineSpec extends SparkSpec {

  test("flagship pipeline: chunk totals reconcile with direct computation") {
    val out = SparkEntry.queries("q39_flagship_pipeline")(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    val totalChunks = rows.map(_.getAs[Long]("n_chunks")).sum
    // recompute independently
    val docs = Tables(spark, sf, "documents")
      .withColumn("clean_text", TextFns.cleanText(col("text")))
      .filter(length(col("clean_text")) >= 200)
    val expected = docs.select("doc_id", "clean_text").collect()
      .map(r => Chunking.chunk(r.getLong(0).toString, r.getString(1)).length).sum
    assert(totalChunks == expected)
    // every source group counts only gated docs
    val nDocs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(nDocs == docs.select("doc_id").distinct().count())
  }

  test("quality gate drops short documents before chunking") {
    val out = SparkEntry.queries("q39_flagship_pipeline")(spark, sf)
    val gated = Tables(spark, sf, "documents")
      .withColumn("c", TextFns.cleanText(col("text")))
      .filter(length(col("c")) < 200).count()
    assert(gated > 0, "fixture should contain sub-gate documents")
    // gated docs contribute no chunks: reconciliation above proves it
    assert(out.agg(sum("n_chunks")).collect()(0).getLong(0) > 0)
  }
}
