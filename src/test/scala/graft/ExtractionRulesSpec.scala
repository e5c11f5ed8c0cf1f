package graft

import graft.operators.ExtractionRules
import org.scalatest.funsuite.AnyFunSuite

/** Fixture tests for the S11-S13 parse rules, mirroring the reference's
  * `test_content_extractor.py` cases (same markup shapes, same accept /
  * reject outcomes) minus the transport mocking.
  */
class ExtractionRulesSpec extends AnyFunSuite {

  // --- S11 ArXiv HTML (test_successful_arxiv_html_extraction) ---

  private val htmlS1 = """
    <html>
        <body>
            <section id="S1">
                <p>This is the introduction paragraph one with sufficient content for testing purposes.</p>
                <p>This is paragraph two with more content to reach the minimum length requirement of over two hundred characters.</p>
                <p>And a third paragraph to ensure we have enough content overall to pass validation checks.</p>
            </section>
        </body>
    </html>
  """

  test("html: section#S1 paragraphs are joined with blank lines and accepted") {
    val r = ExtractionRules.htmlIntroduction(htmlS1)
    assert(r.isDefined)
    assert(r.get.length > 200)
    assert(r.get.toLowerCase.contains("introduction paragraph"))
    assert(r.get.split("\n\n").length == 3)
  }

  test("html: no introduction section -> None (section_not_found)") {
    assert(ExtractionRules.htmlIntroduction(
      "<html><body><p>No introduction here</p></body></html>").isEmpty)
  }

  test("html: falls back to text search for 'introduction' heading") {
    val html = """
      <html>
          <body>
              <section>
                  <h2>Introduction to the topic</h2>
                  <p>This is a long introduction paragraph with sufficient content to pass validation.</p>
                  <p>Another paragraph with more detailed information about the research topic.</p>
                  <p>Yet another paragraph to ensure we meet the 200 character minimum requirement.</p>
              </section>
          </body>
      </html>
    """
    val r = ExtractionRules.htmlIntroduction(html)
    assert(r.isDefined && r.get.length > 200)
  }

  test("html: short content (< 200 chars) is rejected") {
    val html = """
      <html><body><section id="S1"><p>Too short.</p></section></body></html>
    """
    assert(ExtractionRules.htmlIntroduction(html).isEmpty)
    assert(ExtractionRules.htmlIntroduction(null).isEmpty)
  }

  // --- S12 GROBID TEI (test_successful_grobid_extraction) ---

  test("tei: div[type=introduction] paragraphs accepted") {
    val xml = """
      <TEI>
          <text>
              <body>
                  <div type="introduction">
                      <p>This is the introduction paragraph with detailed content about the research.</p>
                      <p>Another paragraph with more information to meet minimum length requirements.</p>
                      <p>Third paragraph adding even more context and details to the introduction.</p>
                  </div>
              </body>
          </text>
      </TEI>
    """
    val r = ExtractionRules.teiIntroduction(xml)
    assert(r.isDefined)
    assert(r.get.length > 200)
    assert(r.get.toLowerCase.contains("introduction paragraph"))
  }

  test("tei: no introduction div -> None (grobid_no_introduction_div)") {
    val xml = """
      <TEI><text><body>
        <div type="methods"><p>Methods section content.</p></div>
      </body></text></TEI>
    """
    assert(ExtractionRules.teiIntroduction(xml).isEmpty)
  }

  // --- S13 PDF regex (test_successful_regex_extraction) ---

  // NOTE: unlike the reference's (PyMuPDF-gated, effectively never-run)
  // fixture, the header lines here are NOT indented — the reference CODE
  // anchors start patterns at (?:^|\n), so an indented "1. Introduction"
  // never matches (verified by running content_extractor.py's logic on its
  // own fixture). Real PDF page text has headers at line starts.
  private val pdfText = """Abstract
This is the abstract of the paper with some additional context.

1. Introduction
This is the introduction section with detailed content about the research topic and methodology.
The introduction continues with more information and context for the study being conducted here.
We present several key findings and motivations for this work in the following paragraphs today.
Additional content to ensure we exceed the two hundred character minimum requirement needed.

2. Methods
This is the methods section.
"""

  test("pdf: numbered-introduction boundaries extracted and collapsed") {
    val r = ExtractionRules.pdfIntroduction(pdfText)
    assert(r.isDefined, "extraction should return content")
    assert(r.get.length >= 200)
    assert(r.get.toLowerCase.contains("introduction"))
    // end boundary respected: methods text never leaks in
    assert(!r.get.contains("methods section"))
    // whitespace fully collapsed
    assert(!r.get.exists(c => c == '\n' || c == '\t'))
  }

  test("pdf: indented headers never match (reference anchor quirk preserved)") {
    val indented = pdfText.linesIterator.map("    " + _).mkString("\n")
    assert(ExtractionRules.pdfIntroduction(indented).isEmpty)
  }

  test("pdf: no introduction header -> None") {
    assert(ExtractionRules.pdfIntroduction(
      "Abstract only. Some words.\n2. Methods\nstuff").isEmpty)
  }

  test("pdf: introduction longer than 15000 chars is rejected") {
    val text = "1. Introduction\n" + ("A" * 20000) + "\n2. Methods"
    assert(ExtractionRules.pdfIntroduction(text).isEmpty)
  }

  test("pdf: missing end pattern falls back to a 10000-char window") {
    val body = ("sentence filler words here " * 40).trim // ~1080 chars
    val r = ExtractionRules.pdfIntroduction("1. Introduction\n" + body)
    assert(r.isDefined)
    assert(r.get == body.replaceAll("\\s+", " "))
    val giant = "x" * 30000
    val fallback = ExtractionRules.pdfIntroduction("1. Introduction\n" + giant)
    // 10000-char window -> inside the (200, 15000) gate -> accepted
    assert(fallback.isDefined && fallback.get.length <= 10000)
  }

  test("pdf: start patterns are tried in order (numbered wins over plain)") {
    val body = ("content words here " * 20).trim
    val text = s"Introduction\nearly plain heading\n1. Introduction\n$body"
    val r = ExtractionRules.pdfIntroduction(text)
    // '1. Introduction' (pattern 1) matches even though plain 'Introduction'
    // appears earlier in the text — pattern ORDER wins, as in the reference
    assert(r.isDefined)
    assert(!r.get.contains("early plain heading"))
  }

  // --- full dispatcher over raw payloads ---

  test("extractFromRaw parses tiers then applies the gate chain") {
    val spark = SparkSpec.session
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val longPara = ("This paragraph is long enough to clear the two hundred " +
      "character acceptance threshold for parsed introductions by a " +
      "comfortable margin, repeated to be safe. ") * 2
    val df = Seq(
      (1L, s"<section id='S1'><p>$longPara</p></section>", null: String,
        null: String, null: String, null: String),
      (2L, null: String, s"<div type='introduction'><p>$longPara</p></div>",
        null: String, null: String, null: String),
      (3L, null: String, null: String, s"1. Introduction\n$longPara\n2. Methods",
        null: String, null: String),
      (4L, null: String, null: String, null: String,
        "An abstract that is decently sized for the fallback tier.", "tl;dr"),
      (5L, null: String, null: String, null: String, null: String, null: String))
      .toDF("id", "html", "tei", "pdf", "abstract", "tldr")
    val out = ExtractionRules.extractFromRaw(df, col("html"), col("tei"),
      col("pdf"), col("abstract"), col("tldr"))
      .select("id", "extraction_method", "content_quality", "status")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getString(3))).toMap
    assert(out(1L) == (("arxiv_html", "high", "success_arxiv_html")))
    assert(out(2L) == (("grobid", "high", "success_grobid")))
    assert(out(3L) == (("pymupdf_regex", "medium", "success_pymupdf_regex")))
    assert(out(4L) == (("abstract_tldr", "low", "success_abstract_tldr")))
    assert(out(5L)._3 == "failed")
  }
}
