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

  test("data card aggregates corpus composition without collecting text") {
    val docs = Tables(spark, sf, "documents")
    val card = graft.quality.DataCard.build(docs, "doc_id", "text",
        "lang", "source")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(card("n_docs") == docs.count())
    assert(card("n_sources") == docs.select("source").distinct().count())
    assert(card("top_lang_docs") <= card("n_docs"))
    assert(card("quality_pass_docs") <= card("n_docs"))
    assert(card("n_tokens") > 0 && card("n_chars") > card("n_tokens"))
    // redundant = docs minus distinct fingerprints (one keeper per group)
    val distinctFp = docs
      .select(TextFns.fingerprint(col("text"))).distinct().count()
    assert(card("exact_dup_redundant_docs") == docs.count() - distinctFp,
      card.toString)
    // packing readiness rows: every doc fits the 2048 window (corpus max
    // is ~99 tokens), so windows exist, nothing is oversize, and fill is
    // a valid rate
    assert(card("pack_windows_b2048") > 0 && card("pack_oversize_docs") == 0)
    assert(card("pack_fill_x1e4") > 0 && card("pack_fill_x1e4") <= 10000)
  }

  test("validation gate passes healthy stages and fails on critical anomalies") {
    import spark.implicits._
    import graft.pipeline.{CriticalAnomalyException, PaperPipeline}
    def stage(ids: Seq[Long]) = ids.zipWithIndex.map { case (id, i) =>
      (id, true, (i % 3).toLong, 2000 + (i % 20), s"domain${i % 4}")
    }.toDF("paper_id", "has_intro", "citation_count", "year", "domain")
    // healthy: unique ids, varied years/domains -> no critical gate
    val ok = PaperPipeline.validate(stage(1L to 100L))
    assert(ok.filter(col("severity") === "critical").isEmpty)
    // >5% duplicate ids -> duplicate_papers critical -> run fails
    val dupIds = (1L to 100L) ++ (1L to 10L)
    val ex = intercept[CriticalAnomalyException] {
      PaperPipeline.validate(stage(dupIds))
    }
    assert(ex.getMessage.contains("duplicate_papers"), ex.getMessage)
  }
}
