package graft.queries

import graft.{QDef, Tables}
import graft.functions.TextFns
import graft.operators.{Bias, Chunking, Enrichment, ExtractionRules, Multimodal, Profiling}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Enrichment + bias-analysis surface (reference P10-P12, A1-A5, A14-A17)
  * plus the end-to-end flagship document pipeline (SURVEY.md §7.3).
  */
object PipelineQueries {

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  val defs: Seq[QDef] = Seq(

    // P10/P12: importance score + decade per order.
    QDef("q33_importance_score",
      (s, d) => t(s, d, "orders").select(
        col("o_orderkey"),
        Enrichment.decade(year(col("o_orderdate"))).as("decade"),
        Enrichment.importanceScore(col("o_totalprice"),
          year(col("o_orderdate")), nowYear = 2026).as("importance_x1e4"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
             |CAST(floor(year(o_orderdate) / 10) * 10 AS BIGINT) AS decade,
             |CAST(floor(least(100.0, 10.0 * log10(o_totalprice + 1.0)
             |  * greatest(0.5, 1.0 - (2026 - year(o_orderdate)) / 50.0))
             |  * 10000 + 0.5) AS BIGINT) AS importance_x1e4
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // P11: keyword-priority classification of part types.
    QDef("q34_classify",
      (s, d) => t(s, d, "part")
        .withColumn("category", Enrichment.classify(col("p_type"), Seq(
          "ECONOMY" -> "budget", "PROMO" -> "promo", "STANDARD" -> "standard",
          "MEDIUM" -> "mid", "SMALL" -> "compact", "LARGE" -> "large"),
          fallback = "other"))
        .groupBy(col("category"))
        .agg(count(lit(1)).cast("long").as("n"),
          round(avg(col("p_retailprice")), 6).as("avg_price"))
        .orderBy(col("category")),
      Some("""SELECT CASE
             |  WHEN p_type LIKE '%ECONOMY%' THEN 'budget'
             |  WHEN p_type LIKE '%PROMO%' THEN 'promo'
             |  WHEN p_type LIKE '%STANDARD%' THEN 'standard'
             |  WHEN p_type LIKE '%MEDIUM%' THEN 'mid'
             |  WHEN p_type LIKE '%SMALL%' THEN 'compact'
             |  WHEN p_type LIKE '%LARGE%' THEN 'large'
             |  ELSE 'other' END AS category,
             |count(*) AS n, round(avg(p_retailprice), 6) AS avg_price
             |FROM part GROUP BY 1 ORDER BY 1""".stripMargin)),

    // A3: disparity stats over segment means (threshold 50 per reference).
    QDef("q35_disparity",
      (s, d) => Bias.disparity(t(s, d, "customer"), "c_mktsegment",
          "c_acctbal", threshold = 50.0),
      Some("""SELECT round(max(m), 6) AS max_mean, round(min(m), 6) AS min_mean,
             |round(max(m) / (min(m) + 1e-6), 6) AS disparity_ratio,
             |round(max(m) - min(m), 6) AS disparity_diff,
             |round(max(m) - min(m), 6) > 50.0 AS alert
             |FROM (SELECT c_mktsegment, avg(c_acctbal) AS m
             |      FROM customer GROUP BY 1)""".stripMargin)),

    // A4/A5: underrepresentation vs median group size (customers/nation).
    QDef("q36_underrepresentation",
      (s, d) => Bias.underrepresentation(t(s, d, "customer"), "c_nationkey"),
      Some("""WITH c AS (SELECT c_nationkey, count(*) AS n
             |           FROM customer GROUP BY 1)
             |SELECT c_nationkey, n, round(median_n, 2) AS median_n,
             |CAST(n AS DOUBLE) < median_n AS underrepresented,
             |CASE WHEN CAST(n AS DOUBLE) < median_n
             |     THEN CAST(ceil(median_n) AS BIGINT) - n ELSE 0 END AS needed
             |FROM c, (SELECT quantile_cont(n, 0.5) AS median_n FROM c)
             |ORDER BY c_nationkey""".stripMargin)),

    // A14: nation × market-segment heatmap (pivoted mean balance).
    QDef("q37_pivot_heatmap",
      (s, d) => t(s, d, "customer")
        .join(broadcast(t(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .pivot("c_mktsegment",
          Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"))
        .agg(round(avg(col("c_acctbal")), 4))
        .orderBy(col("n_name")),
      Some("""SELECT n_name,
             |round(avg(c_acctbal) FILTER (c_mktsegment = 'AUTOMOBILE'), 4) AS "AUTOMOBILE",
             |round(avg(c_acctbal) FILTER (c_mktsegment = 'BUILDING'), 4) AS "BUILDING",
             |round(avg(c_acctbal) FILTER (c_mktsegment = 'FURNITURE'), 4) AS "FURNITURE",
             |round(avg(c_acctbal) FILTER (c_mktsegment = 'HOUSEHOLD'), 4) AS "HOUSEHOLD",
             |round(avg(c_acctbal) FILTER (c_mktsegment = 'MACHINERY'), 4) AS "MACHINERY"
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // A16: top-decile skew of order totals.
    QDef("q38_top_decile",
      (s, d) => Bias.topDecileSkew(t(s, d, "orders"), "o_totalprice"),
      Some("""WITH qq AS (SELECT quantile_cont(o_totalprice, 0.9) AS p90v,
             |                   quantile_cont(o_totalprice, 0.5) AS medv FROM orders),
             |agg AS (SELECT round(max(p90v), 6) AS p90, round(max(medv), 6) AS median,
             |               round(avg(o_totalprice), 6) AS top_decile_mean,
             |               count(*) AS n_top
             |        FROM orders, qq WHERE o_totalprice >= p90v)
             |SELECT p90, median, top_decile_mean, n_top,
             |round(top_decile_mean / median, 6) AS skew_ratio FROM agg""".stripMargin)),

    // A17: success-rate by group (has-enough-content rate per source).
    QDef("q47_success_rate",
      (s, d) => Bias.successRate(
          t(s, d, "documents").withColumn("ok", col("n_chars") >= 200),
          "source", col("ok")),
      Some("""SELECT source,
             |CAST(sum(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END) AS BIGINT) AS n_success,
             |count(*) AS n,
             |round(sum(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END) * 100.0 / count(*), 6) AS rate
             |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

    // A18: grouped describe — count/avg/stddev/min/quartiles/max per group.
    QDef("q48_grouped_describe",
      (s, d) => t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).cast("long").as("n"),
          round(avg(col("o_totalprice")), 6).as("mean"),
          round(stddev_samp(col("o_totalprice")), 6).as("std"),
          min(col("o_totalprice")).as("min"),
          round(expr("percentile(o_totalprice, 0.25)"), 6).as("p25"),
          round(expr("percentile(o_totalprice, 0.5)"), 6).as("p50"),
          round(expr("percentile(o_totalprice, 0.75)"), 6).as("p75"),
          max(col("o_totalprice")).as("max"))
        .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority, count(*) AS n,
             |round(avg(o_totalprice), 6) AS mean,
             |round(stddev_samp(o_totalprice), 6) AS std,
             |min(o_totalprice) AS min,
             |round(quantile_cont(o_totalprice, 0.25), 6) AS p25,
             |round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
             |round(quantile_cont(o_totalprice, 0.75), 6) AS p75,
             |max(o_totalprice) AS max
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // The reference's full five-gate dataset anomaly detector
    // (schema_validator.py:140-235) over a deterministic paper-shaped
    // projection of documents (doc_id % derivations keep every gate's
    // percentage exact at any scale factor; all five gates fire here).
    QDef("q74_anomaly_gates",
      (s, d) => {
        val papers = t(s, d, "documents").select(
          // prefix fingerprint: the corpus' dups are near-dups, so full-text
          // md5 is collision-free; the 80-char prefix catches them (q26)
          md5(substring(col("text"), 1, 80)).as("paper_id"),
          (col("doc_id") % 4 === 0).as("has_intro"), // 75% missing
          when(col("doc_id") % 4 === 0, col("doc_id")).otherwise(lit(0L))
            .as("citation_count"), // 75% zero
          when(col("doc_id") % 4 =!= 0, lit(2021L))
            .otherwise(lit(2000L) + col("doc_id") % 15).as("year"), // 75% 2021
          when(col("doc_id") % 8 =!= 0, lit("cs"))
            .otherwise(concat(lit("d"), col("doc_id") % 5)).as("domain")) // 87.5% cs
        Profiling.anomalyGates(papers, "paper_id", "has_intro",
          "citation_count", "year", "domain")
      },
      Some("""WITH papers AS (SELECT
             |    md5(substr(text, 1, 80)) AS paper_id,
             |    doc_id % 4 = 0 AS has_intro,
             |    CASE WHEN doc_id % 4 = 0 THEN doc_id ELSE 0 END AS citation_count,
             |    CASE WHEN doc_id % 4 <> 0 THEN 2021 ELSE 2000 + doc_id % 15 END AS year,
             |    CASE WHEN doc_id % 8 <> 0 THEN 'cs' ELSE 'd' || CAST(doc_id % 5 AS VARCHAR) END AS domain
             |  FROM documents),
             |base AS (SELECT count(*) AS n,
             |    CAST(sum(CASE WHEN NOT has_intro THEN 1 ELSE 0 END) AS BIGINT) AS n_no_intro,
             |    count(*) - CAST(count(DISTINCT paper_id) AS BIGINT) AS n_dup,
             |    CAST(sum(CASE WHEN citation_count = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_cit,
             |    CAST(count(DISTINCT year) AS BIGINT) AS n_year,
             |    CAST(count(DISTINCT domain) AS BIGINT) AS n_domain
             |  FROM papers),
             |ty AS (SELECT CAST(year AS VARCHAR) AS top_year, CAST(count(*) AS BIGINT) AS top_year_n
             |       FROM papers GROUP BY year ORDER BY count(*) DESC, year LIMIT 1),
             |td AS (SELECT domain AS top_domain, CAST(count(*) AS BIGINT) AS top_domain_n
             |       FROM papers GROUP BY domain ORDER BY count(*) DESC, domain LIMIT 1),
             |stats AS (SELECT * FROM base, ty, td)
             |SELECT * FROM (
             |  SELECT 'extraction_failure_spike' AS anomaly_type, 'has_intro' AS column_name,
             |    CASE WHEN round(n_no_intro * 100.0 / n, 2) > 80 THEN 'critical' ELSE 'warning' END AS severity,
             |    round(n_no_intro * 100.0 / n, 2) AS pct, n_no_intro AS detail_n
             |  FROM stats WHERE round(n_no_intro * 100.0 / n, 2) > 60
             |  UNION ALL
             |  SELECT 'duplicate_papers', 'paper_id',
             |    CASE WHEN round(n_dup * 100.0 / n, 2) > 5 THEN 'critical' ELSE 'warning' END,
             |    round(n_dup * 100.0 / n, 2), n_dup
             |  FROM stats WHERE n_dup > 0
             |  UNION ALL
             |  SELECT 'low_citation_anomaly', 'citation_count', 'warning',
             |    round(n_zero_cit * 100.0 / n, 2), n_zero_cit
             |  FROM stats WHERE round(n_zero_cit * 100.0 / n, 2) > 70
             |  UNION ALL
             |  SELECT 'temporal_bias', 'year', 'warning',
             |    round(top_year_n * 100.0 / n, 2), top_year_n
             |  FROM stats WHERE round(top_year_n * 100.0 / n, 2) > 70 AND n_year > 1
             |  UNION ALL
             |  SELECT 'domain_skew', 'domain', 'warning',
             |    round(top_domain_n * 100.0 / n, 2), top_domain_n
             |  FROM stats WHERE round(top_domain_n * 100.0 / n, 2) > 85 AND n_domain > 1)
             |ORDER BY anomaly_type""".stripMargin)),

    // A12: domain anomaly profile — conditional percentages + severity
    // tagging (extraction-failure / zero-citation / top-share gates).
    QDef("q62_anomaly_profile",
      (s, d) => {
        val docs = t(s, d, "documents")
        val agg = docs.agg(
          count(lit(1)).cast("long").as("n"),
          sum(when(col("n_chars") < 200, 1L).otherwise(0L)).cast("long").as("n_short"),
          max(col("n_chars")).as("max_chars"))
        val topShare = docs.groupBy(col("source"))
          .agg(count(lit(1)).cast("long").as("sn"))
          .agg(max(col("sn")).cast("long").as("top_source_n"))
        agg.crossJoin(topShare)
          .withColumn("short_pct", round(col("n_short") * 100.0 / col("n"), 6))
          .withColumn("top_source_pct", round(col("top_source_n") * 100.0 / col("n"), 6))
          .withColumn("severity",
            when(col("short_pct") > 80, "critical")
              .when(col("short_pct") > 60, "warning")
              .otherwise("ok"))
      },
      Some("""SELECT n, n_short, max_chars, top_source_n,
             |round(n_short * 100.0 / n, 6) AS short_pct,
             |round(top_source_n * 100.0 / n, 6) AS top_source_pct,
             |CASE WHEN round(n_short * 100.0 / n, 6) > 80 THEN 'critical'
             |     WHEN round(n_short * 100.0 / n, 6) > 60 THEN 'warning'
             |     ELSE 'ok' END AS severity
             |FROM (SELECT count(*) AS n,
             |        CAST(sum(CASE WHEN n_chars < 200 THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
             |        max(n_chars) AS max_chars FROM documents),
             |     (SELECT CAST(max(sn) AS BIGINT) AS top_source_n FROM
             |        (SELECT count(*) AS sn FROM documents GROUP BY source))""".stripMargin)),

    // Histogram binning (fixed-width buckets over order totals).
    QDef("q63_histogram",
      (s, d) => t(s, d, "orders")
        .withColumn("bucket",
          least(lit(19L), floor(col("o_totalprice") / 50000)).cast("long"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).cast("long").as("n"),
          round(avg(col("o_totalprice")), 6).as("avg_total"))
        .orderBy(col("bucket")),
      Some("""SELECT CAST(least(19, floor(o_totalprice / 50000)) AS BIGINT) AS bucket,
             |count(*) AS n, round(avg(o_totalprice), 6) AS avg_total
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Correlation / covariance statistics (lineitem price vs quantity).
    QDef("q64_corr_stats",
      (s, d) => t(s, d, "lineitem").agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("covar_qty_price"),
        round(corr(col("l_discount"), col("l_tax")), 6).as("corr_disc_tax"),
        count(lit(1)).cast("long").as("n")),
      Some("""SELECT round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
             |round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
             |round(corr(l_discount, l_tax), 6) AS corr_disc_tax,
             |count(*) AS n FROM lineitem""".stripMargin)),

    // Sorted array aggregation rendered as CSV (collect_list + sort_array).
    QDef("q65_array_agg",
      (s, d) => t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(concat_ws(",",
          sort_array(collect_set(year(col("o_orderdate")).cast("long")))).as("years"),
          count(lit(1)).cast("long").as("n_orders"))
        .orderBy(col("o_custkey")),
      Some("""SELECT o_custkey,
             |array_to_string(list_sort(list(DISTINCT CAST(year(o_orderdate) AS BIGINT))), ',') AS years,
             |count(*) AS n_orders
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Multimodal decode + feature pipeline over the committed golden media
    // table (tools/make_media_fixture.py: stdlib-encoded PNG + WAV payloads
    // and opaque blobs, with expected metadata/features computed in Python,
    // independently of this code). The REAL decoders run — ImageIO for the
    // images, javax.sound for the audio — and the opaque rows exercise the
    // deterministic stub fallback; the oracle compares the per-format
    // aggregate against the tool's expected columns. Scale-independent
    // input (the fixture IS the query input), so this row stays green at
    // any sfDir.
    QDef("q55_multimodal",
      (s, _) => {
        val media = s.read.parquet(graft.Fixtures.golden("media.parquet"))
          .select(col("media_id"), col("payload"))
        val decoded = Multimodal.decode(media, "media_id", "payload")
        val feats = Multimodal.featureExtract(media, "media_id", "payload")
        decoded.join(feats, "media_id")
          .groupBy(col("format"))
          .agg(count(lit(1)).cast("long").as("n"),
            round(avg(col("width")), 2).as("avg_width"),
            round(avg(element_at(col("features"), 1)), 6).as("avg_bin0"))
          .orderBy(col("format"))
      },
      Some(s"""SELECT exp_format AS format, count(*) AS n,
             |round(avg(exp_width), 2) AS avg_width,
             |round(avg(exp_bin0), 6) AS avg_bin0
             |FROM read_parquet('${graft.Fixtures.golden("media.parquet")}')
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Audio dedup over the committed golden audio table
    // (tools/make_audio_fixture.py: stdlib-wave clips with PLANTED
    // duplicate groups — integer volume rescales, a silent pair, a
    // mono/stereo twin — plus undecodable rows the operator must drop).
    // The REAL decoder runs (javax.sound); the oracle groups by the
    // tool's independently-computed expected fingerprint. The envelope
    // hash is integer-exact by design, so the two implementations must
    // agree bit-for-bit. Scale-independent input, green at any sfDir.
    QDef("q216_audio_dedup",
      (s, _) => {
        val audio = s.read.parquet(graft.Fixtures.golden("audio.parquet"))
          .select(col("media_id"), col("payload"))
        Multimodal.audioDupGroups(audio, "media_id", "payload")
          .select(col("fingerprint"), col("keeper"),
            col("n_dups"),
            array_join(transform(col("members"), _.cast("string")), ",")
              .as("members"))
          .orderBy(col("fingerprint"))
      },
      Some(s"""SELECT exp_fingerprint AS fingerprint,
             |  CAST(min(media_id) AS BIGINT) AS keeper,
             |  count(*) AS n_dups,
             |  array_to_string(list_sort(list(media_id)), ',') AS members
             |FROM read_parquet('${graft.Fixtures.golden("audio.parquet")}')
             |WHERE exp_fingerprint IS NOT NULL
             |GROUP BY 1 HAVING count(*) > 1 ORDER BY fingerprint""".stripMargin)),

    // §7.3 flagship slice: clean → quality gate (F5: ≥200 chars) → chunk →
    // denormalize source (J6) → per-source chunk stats. Oracle: the clean
    // step is q13's (SQL-verified) rules and the chunk step is the
    // reference chunker run over exactly that cleaned text
    // (tools/make_chunk_fixtures.py fixture) — so the end-to-end aggregate
    // is fully checked, not rows-only.
    QDef("q39_flagship_pipeline",
      (s, d) => {
        val base = t(s, d, "documents")
          .withColumn("clean_text", TextFns.cleanText(col("text")))
          .filter(length(col("clean_text")) >= 200)
        // source rides through the Generate as a pass-through column — no
        // corpus-sized dimension join back onto the chunks
        val chunks = Chunking.chunkDocumentsGen(
          base.select(col("doc_id"), col("source"), col("clean_text")),
          "doc_id", "clean_text", passThrough = Seq("source"))
        chunks
          .groupBy(col("source"))
          .agg(countDistinct(col("doc_id")).cast("long").as("n_docs"),
            count(lit(1)).cast("long").as("n_chunks"),
            round(avg(col("token_count")), 4).as("avg_chunk_tokens"))
          .orderBy(col("source"))
      },
      Some(s"""SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             |  count(*) AS n_chunks,
             |  round(avg(token_count), 4) AS avg_chunk_tokens
             |FROM read_parquet('${graft.Fixtures.goldenSf("flagship_chunks")}')
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // The reference DAG's full spine as ONE query (test_dag.py:750 —
    // collect → extract → clean → chunk): reference-shaped RAW payloads
    // (q128's synthesis) → S11-S13 parse rules → S14/S15 gate chain →
    // P7 clean → ≥200-char quality gate → P8 chunker → per-(source,
    // extraction_method) chunk stats. Oracle: the extraction+clean steps
    // restated in (q128/q13-verified) SQL, chunked by RUNNING the reference
    // chunker.py over exactly that text (tools/make_chunk_fixtures.py §d).
    QDef("q131_full_spine",
      (s, d) => {
        val raw = t(s, d, "documents").select(
          col("doc_id"), col("source"),
          when(col("doc_id") % 4 === 0, concat(
            lit("<html><body><section id=\"S1\"><p>"), col("text"),
            lit("</p></section></body></html>")))
            .when(col("doc_id") % 4 === 1, concat(
              lit("<html><body><section><h2>Introduction</h2><p>"), col("text"),
              lit("</p></section></body></html>")))
            .as("html_raw"),
          when(col("doc_id") % 4 === 2, concat(
            lit("<TEI><text><body><div type=\"introduction\"><p>"), col("text"),
            lit("</p></div></body></text></TEI>"))).as("tei_raw"),
          when(col("doc_id") % 4 === 3, concat(
            lit("Title page\n1. Introduction\n"), col("text"),
            lit("\n2. Methods\nrest of paper"))).as("pdf_raw"),
          substring(col("text"), 1, 120).as("abst"),
          when(col("doc_id") % 3 === 0, substring(col("text"), 1, 40)).as("tldr"))
        val extracted = ExtractionRules.extractFromRaw(raw, col("html_raw"),
            col("tei_raw"), col("pdf_raw"), col("abst"), col("tldr"))
          .withColumn("clean_text", TextFns.cleanText(col("introduction")))
          .filter(length(col("clean_text")) >= 200)
          .select(col("doc_id"), col("source"), col("extraction_method"),
            col("clean_text"))
        Chunking.chunkDocumentsGen(extracted, "doc_id", "clean_text",
            passThrough = Seq("source", "extraction_method"))
          .groupBy(col("source"), col("extraction_method"))
          .agg(countDistinct(col("doc_id")).cast("long").as("n_docs"),
            count(lit(1)).cast("long").as("n_chunks"),
            round(avg(col("token_count")), 4).as("avg_chunk_tokens"))
          .orderBy(col("source"), col("extraction_method"))
      },
      Some(s"""SELECT source, extraction_method,
             |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             |  count(*) AS n_chunks,
             |  round(avg(token_count), 4) AS avg_chunk_tokens
             |FROM read_parquet('${graft.Fixtures.goldenSf("spine_chunks")}')
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Curation spine: the training-data side of the pipeline run end to
    // end as ONE oracle-checked query — quality funnel (q164's rules) →
    // exact keep-first dedup on the content fingerprint (q13's form) →
    // per-source token-budget fill (q161) → shard assignment (q141's
    // stable md5 convention) → per-source attrition/selection summary.
    // Every stage is integer/string-exact; each wide op is keyed
    // (fingerprint, source, source) — no global window, no collect.
    // S10 latest-run selection as a gate row: three ACCUMULATING runs of
    // the documents table land as run_ts=r0/r1/r2 partitions via the K1
    // stage writer (reference: timestamped blobs, `schema_validator.py:
    // 590-623`); the reader lists the runs driver-side, picks max
    // run_ts, and reads ONLY that partition. The oracle restates the
    // latest run's content (the %4<3 slice) from the base table with
    // the selected run stamped — picking r1 instead, or unioning runs,
    // changes rows and hash.
    QDef("q233_latest_run",
      (s, d) => {
        val all = t(s, d, "documents")
        val base = graft.Scratch.dir("q233_stage")
        Seq("r0" -> 1, "r1" -> 2, "r2" -> 3).foreach { case (ts, upTo) =>
          graft.sinks.Sinks.writeStage(
            all.filter(col("doc_id") % 4 < upTo)
              .select(col("doc_id"), col("source")),
            base, "processed", ts)
        }
        graft.sinks.Sinks.readLatestRun(s, s"$base/stage=processed")
          .select(col("doc_id"), col("source"), col("run_ts"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
             |'r2' AS run_ts
             |FROM documents WHERE doc_id % 4 < 3 ORDER BY doc_id""".stripMargin)),

    // K4 DB-boundary coercion as a gate row: control-char strip on
    // strings, 1000-char title truncation, array columns → JSON
    // strings, and the references_id/has_intro renames
    // (`upload_papers_to_supabase.py:145-221`) — every rule is pure SQL,
    // restated verbatim by the oracle (chr(1)/chr(7) plant the control
    // chars portably; RE2 and Java agree on the [\x00-…] class).
    QDef("q234_coerce_for_db",
      (s, d) => {
        val staged = t(s, d, "documents").select(
          col("doc_id"),
          concat(lit("\u0001Ti\u0007tle "), col("text")).as("title"),
          array(col("source"), col("lang")).as("references_id"),
          when(col("doc_id") % 2 === 0, 1L).otherwise(0L).as("has_intro"))
        graft.sinks.Sinks.coerceForDb(staged).orderBy(col("doc_id"))
      },
      Some("""SELECT CAST(doc_id AS BIGINT) AS doc_id,
             |substr(regexp_replace(chr(1) || 'Ti' || chr(7) || 'tle ' || text,
             |  '[\x00-\x08\x0b\x0c\x0e-\x1f]', '', 'g'), 1, 1000) AS title,
             |CAST(to_json([source, lang]) AS VARCHAR) AS reference_ids,
             |CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS BIGINT)
             |  AS has_introduction
             |FROM documents ORDER BY doc_id""".stripMargin)),

    QDef("q166_curation_spine",
      (s, d) => {
        val toks = regexp_extract_all(lower(col("text")),
          lit("[a-z0-9]+"), lit(0))
        val base = t(s, d, "documents").select(col("doc_id"), col("text"),
          col("source"), col("n_chars"), col("lang"),
          size(toks).cast("long").as("n_tok"),
          size(array_distinct(toks)).cast("long").as("n_uniq"))
        val pass = base.filter(col("n_chars") >= 200 && col("lang") =!= "zh"
          && col("n_tok") >= 40 && col("n_uniq") * 100 >= col("n_tok") * 35
          && col("n_chars") <= 500)
        val wFp = org.apache.spark.sql.expressions.Window
          .partitionBy(col("__fp")).orderBy(col("doc_id"))
        val dd = pass
          .withColumn("__fp",
            md5(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")))
          .withColumn("__rn", row_number().over(wFp))
          .filter(col("__rn") === 1)
        val tok = dd.select(col("source"), col("doc_id"),
          TextFns.tokenCount(col("text")).as("n_ws"),
          md5(concat_ws("#", col("source"), col("doc_id").cast("string")))
            .as("ord"))
        val budgets = tok.groupBy(col("source"))
          .agg(sum("n_ws").cast("long").as("dd_tokens"))
          .withColumn("budget_tokens", expr("dd_tokens * 3 div 5"))
        val wSrc = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(col("ord"), col("doc_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        val hh = md5(col("doc_id").cast("string"))
        val sel = tok.withColumn("cum", sum("n_ws").over(wSrc))
          .join(broadcast(budgets.select(col("source"),
            col("budget_tokens"))), Seq("source"))
          .filter(col("cum") <= col("budget_tokens"))
          .withColumn("shard_id",
            (conv(substring(hh, 1, 4), 16, 10).cast("int") % 16)
              .cast("long"))
        val raw = base.groupBy(col("source"))
          .agg(count(lit(1)).cast("long").as("n_raw"))
        val fil = pass.groupBy(col("source"))
          .agg(count(lit(1)).cast("long").as("n_filtered"))
        val ddc = dd.groupBy(col("source"))
          .agg(count(lit(1)).cast("long").as("n_deduped"))
        val slc = sel.groupBy(col("source"))
          .agg(count(lit(1)).cast("long").as("n_selected"),
            sum("n_ws").cast("long").as("sel_tokens"),
            countDistinct(col("shard_id")).cast("long").as("n_shards"))
        raw.join(fil, Seq("source"), "left")
          .join(ddc, Seq("source"), "left")
          .join(slc, Seq("source"), "left")
          .select(col("source"), col("n_raw"),
            coalesce(col("n_filtered"), lit(0L)).as("n_filtered"),
            coalesce(col("n_deduped"), lit(0L)).as("n_deduped"),
            coalesce(col("n_selected"), lit(0L)).as("n_selected"),
            coalesce(col("sel_tokens"), lit(0L)).as("sel_tokens"),
            coalesce(col("n_shards"), lit(0L)).as("n_shards"))
          .orderBy(col("source"))
      },
      Some("""WITH base AS (SELECT doc_id, text, source, n_chars, lang,
             |    len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tok,
             |    len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS n_uniq
             |  FROM documents),
             |pass AS (SELECT * FROM base WHERE n_chars >= 200 AND lang <> 'zh'
             |    AND n_tok >= 40 AND n_uniq * 100 >= n_tok * 35
             |    AND n_chars <= 500),
             |dd AS (SELECT * FROM (SELECT *, row_number() OVER (
             |      PARTITION BY md5(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))
             |      ORDER BY doc_id) AS rn FROM pass) WHERE rn = 1),
             |tok AS (SELECT source, doc_id,
             |    CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS n_ws,
             |    md5(source || '#' || CAST(doc_id AS VARCHAR)) AS ord
             |  FROM dd),
             |bud AS (SELECT source, CAST(sum(n_ws) AS BIGINT) AS dd_tokens,
             |    CAST(sum(n_ws) AS BIGINT) * 3 // 5 AS budget_tokens
             |  FROM tok GROUP BY 1),
             |cum AS (SELECT source, doc_id, n_ws,
             |    sum(n_ws) OVER (PARTITION BY source ORDER BY ord, doc_id
             |      ROWS UNBOUNDED PRECEDING) AS cum FROM tok),
             |sel AS (SELECT cum.source, cum.doc_id, cum.n_ws,
             |    CAST(CAST(('0x' || substr(md5(CAST(cum.doc_id AS VARCHAR)), 1, 4))
             |      AS INTEGER) % 16 AS BIGINT) AS shard_id
             |  FROM cum JOIN bud USING (source)
             |  WHERE cum.cum <= bud.budget_tokens),
             |raw AS (SELECT source, CAST(count(*) AS BIGINT) AS n_raw
             |        FROM base GROUP BY 1),
             |fil AS (SELECT source, CAST(count(*) AS BIGINT) AS n_filtered
             |        FROM pass GROUP BY 1),
             |ddc AS (SELECT source, CAST(count(*) AS BIGINT) AS n_deduped
             |        FROM dd GROUP BY 1),
             |slc AS (SELECT source, CAST(count(*) AS BIGINT) AS n_selected,
             |    CAST(sum(n_ws) AS BIGINT) AS sel_tokens,
             |    CAST(count(DISTINCT shard_id) AS BIGINT) AS n_shards
             |  FROM sel GROUP BY 1)
             |SELECT raw.source, raw.n_raw,
             |  COALESCE(fil.n_filtered, 0) AS n_filtered,
             |  COALESCE(ddc.n_deduped, 0) AS n_deduped,
             |  COALESCE(slc.n_selected, 0) AS n_selected,
             |  COALESCE(slc.sel_tokens, 0) AS sel_tokens,
             |  COALESCE(slc.n_shards, 0) AS n_shards
             |FROM raw LEFT JOIN fil USING (source)
             |  LEFT JOIN ddc USING (source) LEFT JOIN slc USING (source)
             |ORDER BY raw.source""".stripMargin))
  )
}
