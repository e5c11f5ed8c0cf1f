package graft

import graft.operators.{ContentExtraction, MetadataProjection}
import graft.sources.HttpSource
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Mirrors the reference's `tests/unit/test_metadata_utils.py` surface:
  * field-by-field projection semantics, defaults, None/unicode edges.
  */
class MetadataProjectionSpec extends SparkSpec {

  private val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")

  private def rawDf(rows: Row*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows),
      HttpSource.rawPaperSchema)

  private def fullRow = Row(
    "p1", "Tïtle ∑", "abstract", 2020, 42, 7,
    Map("DOI" -> "10.1/x"),
    Seq(Row("a1", "Ada"), Row("a2", "Bob")),
    (1 to 60).map(i => Row(s"r$i")),
    Seq("CS", "Math"), Seq("JournalArticle"),
    Row("the tldr"), Row("http://pdf"), "ml")

  private def nullRow = Row(
    "p2", null, null, null, null, null, null, null, null, null, null,
    null, null, "ml")

  test("30-field projection: values, joins, json boundaries") {
    val out = MetadataProjection.project(rawDf(fullRow), "cs", ts).collect()(0)
    assert(out.getAs[String]("paper_id") == "p1")
    assert(out.getAs[String]("title") == "Tïtle ∑")
    assert(out.getAs[Int]("citation_count") == 42)
    assert(out.getAs[String]("authors") == "Ada, Bob")
    assert(out.getAs[String]("author_ids") == """["a1","a2"]""")
    assert(out.getAs[String]("external_ids").contains("\"DOI\""))
    assert(out.getAs[scala.collection.Seq[String]]("references_id").size == 50) // capped
    assert(out.getAs[String]("tldr") == "the tldr")
    assert(out.getAs[String]("open_access_pdf_url") == "http://pdf")
    assert(out.getAs[String]("domain") == "cs")
    assert(out.getAs[scala.collection.Seq[String]]("sub_domains") == Seq("ml"))
    assert(out.getAs[java.sql.Timestamp]("scraped_at") == ts)
    assert(out.getAs[String]("status") == "pending")
    assert(!out.getAs[Boolean]("has_intro"))
  }

  test("null-heavy record gets defaults, empty joins, null json") {
    val out = MetadataProjection.project(rawDf(nullRow), "cs", ts).collect()(0)
    assert(out.getAs[Int]("year") == 0)
    assert(out.getAs[Int]("citation_count") == 0)
    assert(out.getAs[Int]("influential_citation_count") == 0)
    assert(out.getAs[String]("authors") == "")
    assert(out.getAs[scala.collection.Seq[String]]("references_id").isEmpty)
    assert(out.isNullAt(out.fieldIndex("external_ids")))
    assert(out.isNullAt(out.fieldIndex("tldr")))
  }

  test("extraction tiers: priority, tags, abstract+tldr concat") {
    import spark.implicits._
    val long = "x" * 300
    val df = Seq(
      (1L, long, null, null, "abs", null),
      (2L, null, long, null, "abs", null),
      (3L, null, null, long, "abs", null),
      (4L, null, null, null, "a" * 60, "tl"),
      (5L, null, null, null, "short", null))
      .toDF("id", "html", "grobid", "rx", "abst", "tldr")
    val out = ContentExtraction.extract(df, col("html"), col("grobid"),
      col("rx"), col("abst"), col("tldr"))
      .select("id", "extraction_method", "content_quality", "status", "introduction")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) == "arxiv_html" && out(1L).getString(2) == "high")
    assert(out(2L).getString(1) == "grobid" && out(2L).getString(2) == "high")
    assert(out(3L).getString(1) == "pymupdf_regex" && out(3L).getString(2) == "medium")
    assert(out(4L).getString(1) == "abstract_tldr" && out(4L).getString(2) == "low")
    assert(out(4L).getString(4) == ("a" * 60) + " Summary: tl")
    assert(out(5L).getString(3) == "failed")
  }
}
