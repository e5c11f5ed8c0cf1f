package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The canonical 30-field flat projection of a raw nested paper record
  * (reference P1-P6, `Ingestion/metadata_utils.py:6-84` and the richer
  * variant `ingestion.py:194-236`) as ONE `select` — every rule below is a
  * column expression, so the whole projection whole-stage-codegens and costs
  * a single narrow pass:
  *
  *  - P2 safe nested get  → native struct access (null-safe by construction)
  *  - P3 authors → ", "-joined names → `array_join(transform(...))`
  *  - P4 reference/citation structs → id arrays, capped at `maxRefs`
  *  - P5 maps/arrays → JSON strings at the flat boundary → `to_json`
  *  - defaults: citation counts → 0, status → 'pending'
  *  - injected lineage: search_term, domain, sub_domains=[search_term],
  *    scraped_at = caller-supplied deterministic timestamp (SURVEY.md §7.5
  *    risk 5: never call the clock inside the plan).
  */
object MetadataProjection {

  def project(raw: DataFrame, domain: String, scrapedAt: java.sql.Timestamp,
              maxRefs: Int = 50): DataFrame = {
    raw.select(
      col("paperId").as("paper_id"),
      col("title"),
      col("abstract"),
      coalesce(col("year"), lit(0)).as("year"),
      coalesce(col("citationCount"), lit(0)).as("citation_count"),
      coalesce(col("influentialCitationCount"), lit(0)).as("influential_citation_count"),
      to_json(col("externalIds")).as("external_ids"),
      array_join(transform(coalesce(col("authors"), array()),
        a => a.getField("name")), ", ").as("authors"),
      to_json(transform(coalesce(col("authors"), array()),
        a => a.getField("authorId"))).as("author_ids"),
      slice(filter(transform(coalesce(col("references"), array()),
        r => r.getField("paperId")), _.isNotNull), 1, maxRefs).as("references_id"),
      to_json(col("fieldsOfStudy")).as("fields_of_study"),
      to_json(col("publicationTypes")).as("publication_types"),
      col("tldr").getField("text").as("tldr"),
      col("openAccessPdf").getField("url").as("open_access_pdf_url"),
      col("search_term"),
      lit(domain).as("domain"),
      array(col("search_term")).as("sub_domains"),
      lit(scrapedAt).as("scraped_at"),
      lit(false).as("has_intro"),
      lit("pending").as("status"))
  }
}

/** Tiered content-extraction semantics (reference S14/S15,
  * `Ingestion/content_extractor.py:181-219`): given the per-tier candidate
  * texts (fetched upstream through the transport layer), pick the first
  * acceptable tier and tag method/quality — a pure `coalesce`/`when` chain.
  *
  * Tier gates re-expressed from the reference:
  *  - arxiv_html:     ≥ 200 chars                (quality high)
  *  - grobid:         200–15000 chars            (quality high)
  *  - pymupdf_regex:  200–15000 chars            (quality medium)
  *  - abstract_tldr:  abstract > 50 chars, tldr appended when present
  *                    (quality low); tldr alone as last resort
  */
object ContentExtraction {

  def extract(df: DataFrame, htmlCol: Column, grobidCol: Column,
              regexCol: Column, abstractCol: Column, tldrCol: Column): DataFrame = {
    val htmlOk = htmlCol.isNotNull && length(htmlCol) >= 200
    val grobidOk = grobidCol.isNotNull && length(grobidCol).between(200, 15000)
    val regexOk = regexCol.isNotNull && length(regexCol).between(200, 15000)
    val absOk = abstractCol.isNotNull && length(abstractCol) > 50
    val absTldr = when(tldrCol.isNotNull,
      concat(abstractCol, lit(" Summary: "), tldrCol)).otherwise(abstractCol)

    val content = when(htmlOk, htmlCol)
      .when(grobidOk, grobidCol)
      .when(regexOk, regexCol)
      .when(absOk, absTldr)
      .when(tldrCol.isNotNull, tldrCol)
    val method = when(htmlOk, "arxiv_html")
      .when(grobidOk, "grobid")
      .when(regexOk, "pymupdf_regex")
      .when(absOk || tldrCol.isNotNull, "abstract_tldr")
    val quality = when(htmlOk || grobidOk, "high")
      .when(regexOk, "medium")
      .when(absOk || tldrCol.isNotNull, "low")

    df.withColumn("introduction", content)
      .withColumn("extraction_method", method)
      .withColumn("content_quality", quality)
      .withColumn("has_intro", content.isNotNull)
      .withColumn("intro_length",
        coalesce(length(content), lit(0)).cast("long"))
      .withColumn("status",
        when(content.isNotNull, concat(lit("success_"), method))
          .otherwise("failed"))
  }
}
