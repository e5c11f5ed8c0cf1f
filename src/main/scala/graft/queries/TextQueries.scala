package graft.queries

import graft.{QDef, Tables}
import graft.functions.TextFns
import graft.operators.{Bm25, BqIndex, Chunking, DataSelection, DedupOps, Hybrid, PortableAnn, PrefixSum, Profiling, Similarity, TextMining}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operator surface over the `documents` table: cleaning
  * (P7), tokenization/keywords (P9), language-ID, quality scoring,
  * fingerprinting, chunking (P8).
  *
  * All but the chunker are pure expression pipelines with DuckDB oracles.
  * The chunker is stateful per-row expansion (UDF + explode) — not
  * SQL-expressible, covered by ScalaTest invariants + rows-only check.
  */
object TextQueries {

  private def docs(s: SparkSession, d: String) = Tables(s, d, "documents")

  // BM25 retrieval queries over the synthetic vocabulary; the oracle's
  // VALUES list is generated from the SAME tokenizer (Bm25.queryTerms) so
  // Spark and SQL agree on the term set by construction.
  private val bm25Queries = Seq(
    "s1" -> "fast hash join",
    "s2" -> "window sort merge",
    "s3" -> "stream filter vector")
  private val bm25TermValues = bm25Queries
    .flatMap { case (qid, q) => Bm25.queryTerms(q).map(t => s"('$qid', '$t')") }
    .mkString(", ")

  /** q139/q227/q228/q229/q231 shared oracle: Okapi BM25 with 6dp-rounded
    * scores before ranking (the term-sharded indexed path is lossless,
    * the delete path reads tombstone-filtered postings with an
    * exactly-shifted stats row, and the streamed path sums exact
    * per-segment stats rows, so one SQL restatement — over `corpus`,
    * the live document set — hash-checks all five).
    */
  private def bm25TopkSqlOver(corpus: String): String =
    s"""WITH corpus AS ($corpus),
       |q(query_id, term) AS (VALUES $bm25TermValues),
       |tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]{3,}')) AS term
       |        FROM corpus),
       |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n,
       |    avg(len(regexp_extract_all(lower(text), '[a-z]{3,}'))) AS avgdl
       |  FROM corpus),
       |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS doc_len FROM tok GROUP BY 1),
       |tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM tok
       |       WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY 1, 2),
       |idf AS (SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df FROM tf GROUP BY 1),
       |scored AS (SELECT q.query_id, tf.doc_id,
       |    round(sum(ln(1.0 + (stats.n - idf.df + 0.5) / (idf.df + 0.5))
       |      * (tf.tf * (1.2 + 1.0)
       |         / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.doc_len / stats.avgdl)))), 6) AS score
       |  FROM tf JOIN idf USING (term) JOIN q USING (term)
       |    JOIN dl USING (doc_id), stats
       |  GROUP BY 1, 2)
       |SELECT query_id, rank, doc_id, score FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY score DESC, doc_id) AS rank FROM scored)
       |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  private lazy val bm25TopkSql: String =
    bm25TopkSqlOver("SELECT * FROM documents")

  /** q198's blocklist: multi-word substrings over the corpus vocabulary,
    * each border-free (no non-empty proper prefix that is also a suffix),
    * so occurrences cannot self-overlap and the oracle's replace-based
    * non-overlapping count equals Aho-Corasick's all-occurrence count —
    * TextMiningSpec asserts the border-free property for every term.
    */
  val blocklistTerms: Seq[String] = Seq(
    "fast table", "big query", "scan slow", "window stream",
    "value table", "merge batch")

  val defs: Seq[QDef] = Seq(

    // P7 cleaning chain + content fingerprint. Hash the cleaned text so the
    // result stays small while pinning every regex step.
    QDef("q13_clean_fingerprint",
      (s, d) => docs(s, d).select(
        col("doc_id"),
        md5(TextFns.cleanText(col("text"))).as("clean_md5"),
        TextFns.fingerprint(col("text")).as("fingerprint"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |md5(trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             |  text, 'https?://[^ \t\n\r\f\x0B]+', ' ', 'g'),
             |  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', ' ', 'g'),
             |  '\[[0-9, ]+\]', ' ', 'g'),
             |  '\([A-Za-z]+ et al[.,][^)]*\)', ' ', 'g'),
             |  '[^a-zA-Z0-9 .,;:!?()''-]', ' ', 'g'),
             |  '  *', ' ', 'g'))) AS clean_md5,
             |md5(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS fingerprint
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Token counting: whitespace tokens, BPE-ish subwords, keyword-grade
    // words, stopword occurrences — one narrow scan, all codegen'd.
    QDef("q14_token_stats",
      (s, d) => docs(s, d).select(
        col("doc_id"),
        TextFns.tokenCount(col("text")).as("n_tokens"),
        TextFns.subwordCount(col("text")).as("n_subwords"),
        size(TextFns.words(col("text"))).cast("long").as("n_words"),
        TextFns.stopwordCount(col("text")).as("n_stopwords"))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
             |CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS n_tokens,
             |CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9 ]')) AS BIGINT) AS n_subwords,
             |CAST(len(regexp_extract_all(lower(text), '[a-z]{3,}')) AS BIGINT) AS n_words,
             |CAST(len(regexp_extract_all(lower(text), '\\b${TextFns.stopwords.mkString("(", "|", ")")}\\b')) AS BIGINT) AS n_stopwords
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Language-ID by marker-stopword argmax with fixed tie priority.
    QDef("q15_lang_id",
      (s, d) => docs(s, d).select(
        col("doc_id"),
        TextFns.languageId(col("text")).as("lang_pred"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |CASE WHEN best = 0 THEN 'unknown'
             |     WHEN en = best THEN 'en'
             |     WHEN es = best THEN 'es'
             |     WHEN de = best THEN 'de'
             |     ELSE 'fr' END AS lang_pred
             |FROM (SELECT doc_id, en, es, de, fr, greatest(en, es, de, fr) AS best
             |  FROM (SELECT doc_id,
             |    len(regexp_extract_all(lower(text), '\b(the|and|of|to|is|a)\b')) AS en,
             |    len(regexp_extract_all(lower(text), '\b(el|la|los|que|de|y)\b')) AS es,
             |    len(regexp_extract_all(lower(text), '\b(der|die|und|das|nicht|ist)\b')) AS de,
             |    len(regexp_extract_all(lower(text), '\b(le|les|des|et|une|est)\b')) AS fr
             |  FROM documents))
             |ORDER BY doc_id""".stripMargin)),

    // Metadata-language audit: declared `lang` column vs the n-gram
    // detector — the confusion matrix + per-declared-language agreement
    // rate. Disagreement rows are exactly where metadata-trusting
    // per-language pipelines (tokenizer choice, stopword lists, quality
    // thresholds) silently misprocess documents. One scan + one grouped
    // aggregate; the tiny lang×lang matrix carries its own marginals.
    QDef("q194_lang_agreement",
      (s, d) => docs(s, d)
        .select(col("lang"), TextFns.languageId(col("text")).as("detected"))
        .groupBy(col("lang"), col("detected"))
        .agg(count(lit(1)).cast("long").as("n_docs"))
        .withColumn("lang_total",
          sum(col("n_docs")).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("lang"))).cast("long"))
        .withColumn("agree_x1e4",
          when(col("lang") === col("detected"),
            floor(col("n_docs") * lit(10000.0) / col("lang_total") + lit(0.5))
              .cast("long")).otherwise(lit(0L)))
        .orderBy(col("lang"), col("detected")),
      Some("""WITH det AS (SELECT lang,
             |  CASE WHEN best = 0 THEN 'unknown'
             |       WHEN en = best THEN 'en'
             |       WHEN es = best THEN 'es'
             |       WHEN de = best THEN 'de'
             |       ELSE 'fr' END AS detected
             |FROM (SELECT lang, en, es, de, fr, greatest(en, es, de, fr) AS best
             |  FROM (SELECT lang,
             |    len(regexp_extract_all(lower(text), '\b(the|and|of|to|is|a)\b')) AS en,
             |    len(regexp_extract_all(lower(text), '\b(el|la|los|que|de|y)\b')) AS es,
             |    len(regexp_extract_all(lower(text), '\b(der|die|und|das|nicht|ist)\b')) AS de,
             |    len(regexp_extract_all(lower(text), '\b(le|les|des|et|une|est)\b')) AS fr
             |  FROM documents))),
             |g AS (SELECT lang, detected, CAST(count(*) AS BIGINT) AS n_docs
             |      FROM det GROUP BY 1, 2),
             |t AS (SELECT lang, CAST(sum(n_docs) AS BIGINT) AS lang_total
             |      FROM g GROUP BY 1)
             |SELECT g.lang, g.detected, g.n_docs, t.lang_total,
             |  CASE WHEN g.lang = g.detected THEN CAST(floor(
             |      g.n_docs * 10000.0 / t.lang_total + 0.5) AS BIGINT)
             |    ELSE 0 END AS agree_x1e4
             |FROM g JOIN t USING (lang)
             |ORDER BY lang, detected""".stripMargin)),

    // Composite quality score (length/alpha/stopword saturation).
    QDef("q16_text_quality",
      (s, d) => docs(s, d).select(
        col("doc_id"),
        TextFns.qualityScore(col("text")).as("quality_x1e4"))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
             |CAST(floor((least(1.0, n_chars_d / 500.0) * 0.4
             |  + (CASE WHEN n_chars_d > 0 THEN alpha / n_chars_d ELSE 0.0 END) * 0.3
             |  + least(1.0, (CASE WHEN toks > 0 THEN stops / toks ELSE 0.0 END) * 3.0) * 0.3) * 100 * 10000 + 0.5) AS BIGINT) AS quality_x1e4
             |FROM (SELECT doc_id,
             |  CAST(length(text) AS DOUBLE) AS n_chars_d,
             |  CAST(len(regexp_extract_all(text, '[a-zA-Z]')) AS DOUBLE) AS alpha,
             |  CAST(len(regexp_extract_all(text, '[^ ]+')) AS DOUBLE) AS toks,
             |  CAST(len(regexp_extract_all(lower(text), '\\b${TextFns.stopwords.mkString("(", "|", ")")}\\b')) AS DOUBLE) AS stops
             |FROM documents) ORDER BY doc_id""".stripMargin)),

    // A15/P9: global top-20 keywords after stoplist (explode → count → topk;
    // Spark plans the limit as TakeOrderedAndProject over partial counts).
    QDef("q17_keywords_global",
      (s, d) => docs(s, d)
        .select(explode(TextFns.words(col("text"))).as("keyword"))
        .filter(!col("keyword").isin(TextFns.stopwords: _*))
        .groupBy(col("keyword"))
        .agg(count(lit(1)).cast("long").as("n"))
        .orderBy(col("n").desc, col("keyword"))
        .limit(20),
      Some(s"""SELECT keyword, count(*) AS n
             |FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]{3,}')) AS keyword
             |      FROM documents)
             |WHERE keyword NOT IN (${TextFns.stopwords.map(w => s"'$w'").mkString(", ")})
             |GROUP BY 1 ORDER BY n DESC, keyword LIMIT 20""".stripMargin)),

    // P9 proper: per-document top-3 keywords, rank by (count desc, keyword).
    QDef("q18_keywords_perdoc",
      (s, d) => {
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("n").desc, col("keyword"))
        docs(s, d)
          .select(col("doc_id"), explode(TextFns.words(col("text"))).as("keyword"))
          .filter(!col("keyword").isin(TextFns.stopwords: _*))
          .groupBy(col("doc_id"), col("keyword"))
          .agg(count(lit(1)).cast("long").as("n"))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 3)
          .orderBy(col("doc_id"), col("rank"))
      },
      Some(s"""SELECT doc_id, keyword, n, rank FROM (
             |  SELECT doc_id, keyword, n,
             |    row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, keyword) AS rank
             |  FROM (SELECT doc_id, keyword, count(*) AS n
             |    FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]{3,}')) AS keyword
             |          FROM documents)
             |    WHERE keyword NOT IN (${TextFns.stopwords.map(w => s"'$w'").mkString(", ")})
             |    GROUP BY 1, 2))
             |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin)),

    // Stratified downsampling: ≤5 docs per language, deterministically
    // ranked by content hash (the reproducible-sampling shape every
    // training-data pipeline needs — no RNG, same sample every run).
    QDef("q66_stratified_sample",
      (s, d) => {
        val w = Window.partitionBy(col("lang"))
          .orderBy(md5(col("text")), col("doc_id"))
        docs(s, d)
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 5)
          .select(col("lang"), col("doc_id"), col("rk"))
          .orderBy(col("lang"), col("rk"))
      },
      Some("""SELECT lang, doc_id, rk FROM (
             |  SELECT lang, doc_id,
             |    row_number() OVER (PARTITION BY lang
             |                       ORDER BY md5(text), doc_id) AS rk
             |  FROM documents)
             |WHERE rk <= 5 ORDER BY lang, rk""".stripMargin)),

    // Token-budget batch assembly: pack documents into training batches of
    // ~2000 est. tokens in deterministic doc order via an exclusive
    // running sum. The running sum is the DISTRIBUTED two-pass prefix sum
    // (PrefixSum.runningSum) — a plain global window would plan an
    // `Exchange SinglePartition` and move the whole table to one task.
    QDef("q67_token_batches",
      (s, d) => {
        val base = docs(s, d)
          .select(col("doc_id"), (col("n_chars") / 4).cast("long").as("toks"))
        PrefixSum.runningSum(base, "doc_id", "toks", "cum")
          .withColumn("batch_id",
            floor((col("cum") - col("toks")) / 2000).cast("long"))
          .groupBy(col("batch_id"))
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(col("toks")).cast("long").as("batch_tokens"))
          .orderBy(col("batch_id"))
      },
      Some("""SELECT batch_id, count(*) AS n_docs,
             |CAST(sum(toks) AS BIGINT) AS batch_tokens FROM (
             |  SELECT CAST(floor((sum(toks) OVER (ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - toks) / 2000) AS BIGINT) AS batch_id,
             |    toks
             |  FROM (SELECT doc_id, CAST(n_chars // 4 AS BIGINT) AS toks
             |        FROM documents))
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // TF-IDF: top-5 terms per document, tf × ln(N/df). Two key-local
    // aggregations; the per-term document-frequency table is tiny (vocab
    // rows) and broadcast-joins onto the term counts. Scores ranked on the
    // 6dp-rounded value with a term tie-break so both engines order
    // identically.
    QDef("q70_tfidf_topterms",
      (s, d) => {
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("term"))
        val docsDf = docs(s, d)
        val nDocs = docsDf.count()
        val tf = docsDf
          .select(col("doc_id"), explode(TextFns.words(col("text"))).as("term"))
          .groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).cast("long").as("tf"))
        val df = tf.groupBy(col("term"))
          .agg(countDistinct(col("doc_id")).cast("long").as("df"))
        tf.join(broadcast(df), Seq("term"))
          .withColumn("score",
            round(col("tf") * log(lit(nDocs.toDouble) / col("df")), 6))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 5)
          .select(col("doc_id"), col("rank"), col("term"), col("tf"),
            col("df"), col("score"))
          .orderBy(col("doc_id"), col("rank"))
      },
      Some("""WITH tf AS (SELECT doc_id, term, count(*) AS tf FROM (
             |    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]{3,}')) AS term
             |    FROM documents) GROUP BY 1, 2),
             |idf AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
             |        FROM tf GROUP BY 1),
             |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
             |scored AS (SELECT doc_id, term, tf, df,
             |    round(tf * ln(n_docs / df), 6) AS score
             |  FROM tf JOIN idf USING (term), n)
             |SELECT doc_id, rank, term, tf, df, score FROM (
             |  SELECT *, row_number() OVER (PARTITION BY doc_id
             |    ORDER BY score DESC, term) AS rank FROM scored)
             |WHERE rank <= 5 ORDER BY doc_id, rank""".stripMargin)),

    // Okapi BM25 top-k retrieval: postings (one corpus scan, broadcast
    // query-term semi-join) → df/idf on matching terms only → per-query
    // rank window. Scores rounded 6dp BEFORE ranking so the order is
    // engine-portable; doc_id breaks ties. Exact SQL oracle (same formula).
    QDef("q139_bm25_topk",
      (s, d) => Bm25.topK(docs(s, d), "doc_id", "text", bm25Queries, k = 10)
        .orderBy(col("query_id"), col("rank")),
      Some(bm25TopkSql)),

    // q139 through the PERSISTED term-sharded index: write the full
    // inverted index (postings partitioned by term hash + stats table),
    // then retrieve with the query terms' shards pushed as a partition
    // filter. Scoring shares topK's code path and the indexed read is
    // lossless (a term's postings all live in its shard), so the SAME
    // oracle hash-checks the layout path. Timed cost includes the index
    // build; the query half reads only the query terms' shards.
    QDef("q227_bm25_indexed",
      (s, d) => {
        val dir = graft.Scratch.dir("q227_index")
        Bm25.writeIndex(docs(s, d), "doc_id", "text", dir)
        Bm25.topKIndexed(s, dir, "doc_id", bm25Queries, k = 10)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(bm25TopkSql)),

    // The INCREMENTAL index lifecycle for BM25 (the third of the three
    // persisted indexes to get it, after IVF and dedup): build on 90% of
    // the corpus, fold the doc_id%10==0 batch in with appendToIndex, then
    // retrieve. df/idf derive from postings at query time and the stats
    // merge is exact (integral token sums), so the appended index is
    // row-identical to a from-scratch build over the union — the SAME
    // full-corpus oracle hash-checks the whole lifecycle.
    QDef("q228_bm25_incremental",
      (s, d) => {
        val all = docs(s, d)
        val dir = graft.Scratch.dir("q228_index")
        Bm25.writeIndex(all.filter(col("doc_id") % 10 =!= 0),
          "doc_id", "text", dir)
        Bm25.appendToIndex(all.filter(col("doc_id") % 10 === 0),
          "doc_id", "text", dir)
        Bm25.topKIndexed(s, dir, "doc_id", bm25Queries, k = 10)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(bm25TopkSql)),

    // The DELETE half of the index lifecycle: build over the full corpus,
    // tombstone the doc_id%10==0 batch OUT (O(batch) sidecar rows — no
    // shard is rewritten, a doc's terms hash across ~every shard), then
    // retrieve. The read anti-joins the tombstones so df/idf re-derive
    // over live docs only, and the stats shift is exact (integral token
    // sums from the doc-length sidecar), so the result hash-matches a
    // live-only oracle. Compaction equivalence is pinned in Bm25Spec.
    QDef("q229_bm25_delete",
      (s, d) => {
        val all = docs(s, d)
        val dir = graft.Scratch.dir("q229_index")
        Bm25.writeIndex(all, "doc_id", "text", dir)
        Bm25.removeFromIndex(all.filter(col("doc_id") % 10 === 0)
          .select("doc_id"), "doc_id", dir)
        Bm25.topKIndexed(s, dir, "doc_id", bm25Queries, k = 10)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(bm25TopkSqlOver(
        "SELECT * FROM documents WHERE doc_id % 10 <> 0"))),

    // The STREAMING half of the index lifecycle: base index on a third of
    // the corpus, then Structured Streaming folds the rest in — each
    // micro-batch an immutable segment (per-batch overwrite = exactly-once
    // on replay), file-source with maxFilesPerTrigger=1 so the increment
    // genuinely arrives over multiple micro-batches. topKIndexed reads
    // base + segments with exact summed stats, so the streamed index
    // retrieves row-identically to a from-scratch build — the SAME
    // full-corpus oracle hash-checks continuous ingestion end to end.
    QDef("q231_bm25_streamed",
      (s, d) => {
        val all = docs(s, d)
        val base = graft.Scratch.dir("q231")
        val dir = s"$base/index"
        Bm25.writeIndex(all.filter(col("doc_id") % 3 === 0),
          "doc_id", "text", dir)
        val incDir = s"$base/increment"
        all.filter(col("doc_id") % 3 =!= 0).select("doc_id", "text")
          .repartition(3).write.parquet(incDir)
        val stream = s.readStream
          .schema(s.read.parquet(incDir).schema)
          .option("maxFilesPerTrigger", "1").parquet(incDir)
        val q = graft.streaming.StreamingOps.streamBm25Index(
          stream, "doc_id", "text", dir, s"$base/ckpt")
        q.processAllAvailable()
        q.stop()
        Bm25.topKIndexed(s, dir, "doc_id", bm25Queries, k = 10)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(bm25TopkSql)),

    // Retrieval evaluation: exact MRR / recall@10 / nDCG@10 for the BM25
    // ranker against boolean-AND pseudo-qrels (relevant iff the doc holds
    // every query term — independent of the scoring formula). DCG terms
    // are floored to integers BEFORE summing, so aggregation order cannot
    // perturb the fixed-point result.
    QDef("q203_retrieval_eval",
      (s, d) => Bm25.evalMetrics(docs(s, d), "doc_id", "text", bm25Queries,
          k = 10)
        .orderBy(col("query_id")),
      Some(s"""WITH q(query_id, term) AS (VALUES $bm25TermValues),
             |nq AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_terms FROM q GROUP BY 1),
             |tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]{3,}')) AS term
             |        FROM documents),
             |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n,
             |    avg(len(regexp_extract_all(lower(text), '[a-z]{3,}'))) AS avgdl
             |  FROM documents),
             |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS doc_len FROM tok GROUP BY 1),
             |tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM tok
             |       WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY 1, 2),
             |idf AS (SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df FROM tf GROUP BY 1),
             |scored AS (SELECT q.query_id, tf.doc_id,
             |    round(sum(ln(1.0 + (stats.n - idf.df + 0.5) / (idf.df + 0.5))
             |      * (tf.tf * (1.2 + 1.0)
             |         / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.doc_len / stats.avgdl)))), 6) AS score
             |  FROM tf JOIN idf USING (term) JOIN q USING (term)
             |    JOIN dl USING (doc_id), stats
             |  GROUP BY 1, 2),
             |ranked AS (SELECT query_id, doc_id, rank FROM (
             |    SELECT *, row_number() OVER (PARTITION BY query_id
             |      ORDER BY score DESC, doc_id) AS rank FROM scored)
             |  WHERE rank <= 10),
             |dt AS (SELECT DISTINCT t.doc_id, q.query_id, q.term
             |       FROM (SELECT DISTINCT doc_id, term FROM tok) t JOIN q USING (term)),
             |qrel AS (SELECT dt.query_id, dt.doc_id FROM dt JOIN nq USING (query_id)
             |         GROUP BY dt.query_id, dt.doc_id, nq.n_terms
             |         HAVING count(*) = nq.n_terms),
             |nrel AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_relevant FROM qrel GROUP BY 1),
             |hit AS (SELECT r.query_id, r.rank FROM ranked r JOIN qrel USING (query_id, doc_id)),
             |agg AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_rr,
             |        CAST(min(rank) AS BIGINT) AS first_rank,
             |        CAST(sum(CAST(floor(1000000.0 / log2(rank + 1) + 0.5) AS BIGINT)) AS BIGINT) AS dcg
             |        FROM hit GROUP BY 1),
             |ideal AS (SELECT n.query_id,
             |        CAST(sum(CAST(floor(1000000.0 / log2(i + 1) + 0.5) AS BIGINT)) AS BIGINT) AS idcg
             |        FROM nrel n, UNNEST(range(1, least(n.n_relevant, 10) + 1)) AS u(i)
             |        GROUP BY 1),
             |qs AS (SELECT DISTINCT query_id FROM q)
             |SELECT qs.query_id, coalesce(n.n_relevant, 0) AS n_relevant,
             |  coalesce(a.n_rr, 0) AS n_retrieved_relevant,
             |  CASE WHEN a.first_rank IS NULL THEN 0
             |       ELSE CAST(floor(1000000.0 / a.first_rank + 0.5) AS BIGINT) END AS mrr_x1e6,
             |  CASE WHEN coalesce(n.n_relevant, 0) = 0 THEN 0
             |       ELSE CAST(floor(coalesce(a.n_rr, 0) * 1000000.0 / n.n_relevant + 0.5) AS BIGINT) END AS recall_x1e6,
             |  CASE WHEN i.idcg IS NULL OR a.dcg IS NULL THEN 0
             |       ELSE CAST(floor(a.dcg * 1000000.0 / i.idcg + 0.5) AS BIGINT) END AS ndcg_x1e6
             |FROM qs LEFT JOIN nrel n USING (query_id) LEFT JOIN agg a USING (query_id)
             |LEFT JOIN ideal i USING (query_id)
             |ORDER BY query_id""".stripMargin)),

    // Passage-level duplication profile: sliding 5-token windows, a window
    // duplicated iff its passage occurs ≥2 times corpus-wide. Exact oracle
    // builds the same windows with list slicing. explode_outer keeps
    // zero-window docs (tokens < 5) at n_windows = 0.
    QDef("q140_dup_passages",
      (s, d) => DedupOps.duplicatePassages(docs(s, d), "doc_id", "text", winTokens = 5)
        .orderBy(col("doc_id")),
      Some("""WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts FROM documents),
             |pos AS (SELECT doc_id, ts, unnest(range(1, len(ts) - 3)) AS i FROM tok),
             |gr AS (SELECT doc_id, array_to_string(ts[i:i+4], ' ') AS g FROM pos),
             |dup AS (SELECT g FROM gr GROUP BY 1 HAVING count(*) >= 2),
             |per AS (SELECT gr.doc_id, CAST(count(*) AS BIGINT) AS n_windows,
             |    CAST(count(dup.g) AS BIGINT) AS n_dup_windows
             |  FROM gr LEFT JOIN dup ON gr.g = dup.g GROUP BY 1)
             |SELECT d.doc_id, COALESCE(per.n_windows, 0) AS n_windows,
             |  COALESCE(per.n_dup_windows, 0) AS n_dup_windows,
             |  CASE WHEN COALESCE(per.n_windows, 0) = 0 THEN 0.0
             |       ELSE round(per.n_dup_windows / CAST(per.n_windows AS DOUBLE), 6) END AS dup_frac
             |FROM documents d LEFT JOIN per USING (doc_id)
             |ORDER BY d.doc_id""".stripMargin)),

    // PII redaction: deterministic synthetic PII (email/url/number) is
    // spliced into the corpus, redacted with typed placeholders, and
    // audited. Pure regexp_replace chain — codegen'd, zero shuffle.
    QDef("q75_pii_redaction",
      (s, d) => {
        val seeded = docs(s, d).withColumn("text2", concat(col("text"),
          when(col("doc_id") % 5 === 0,
            concat(lit(" contact user"), col("doc_id"), lit("@example.com now")))
            .otherwise(lit("")),
          when(col("doc_id") % 7 === 0,
            concat(lit(" see https://example.org/p/"), col("doc_id"), lit(" or")))
            .otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            concat(lit(" call 555-01"),
              lpad((col("doc_id") % 100).cast("string"), 2, "0"),
              lit("-99 ok"))).otherwise(lit(""))))
        seeded.select(col("doc_id"),
            TextFns.redactPii(col("text2")).as("clean"))
          .withColumn("n_email", (size(split(col("clean"), "<EMAIL>", -1)) - 1)
            .cast("long"))
          .withColumn("n_url", (size(split(col("clean"), "<URL>", -1)) - 1)
            .cast("long"))
          .withColumn("n_number", (size(split(col("clean"), "<NUMBER>", -1)) - 1)
            .cast("long"))
          .select(col("doc_id"), md5(col("clean")).as("clean_md5"),
            col("n_email"), col("n_url"), col("n_number"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH seeded AS (SELECT doc_id, text
             |  || CASE WHEN doc_id % 5 = 0
             |       THEN ' contact user' || doc_id || '@example.com now' ELSE '' END
             |  || CASE WHEN doc_id % 7 = 0
             |       THEN ' see https://example.org/p/' || doc_id || ' or' ELSE '' END
             |  || CASE WHEN doc_id % 11 = 0
             |       THEN ' call 555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '-99 ok' ELSE '' END
             |  AS text2 FROM documents),
             |red AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(text2,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |    'https?://[^ \t\n\r\f\x0B]+', '<URL>', 'g'),
             |    '[0-9][0-9() .-]{6,}[0-9]', '<NUMBER>', 'g') AS clean
             |  FROM seeded)
             |SELECT doc_id, md5(clean) AS clean_md5,
             |CAST(len(string_split(clean, '<EMAIL>')) - 1 AS BIGINT) AS n_email,
             |CAST(len(string_split(clean, '<URL>')) - 1 AS BIGINT) AS n_url,
             |CAST(len(string_split(clean, '<NUMBER>')) - 1 AS BIGINT) AS n_number
             |FROM red ORDER BY doc_id""".stripMargin)),

    // Gopher/C4-style heuristic quality rules per document: word count
    // window, mean word length window, symbol ratio, minimum stopword
    // hits — narrow per-row expressions only, keep decision as one boolean.
    // Ratios are fixed-point (×1e4, floor(x+0.5)) — round() diverges between
    // engines on exact-half rationals like alpha_chars/n_words.
    QDef("q76_quality_rules",
      (s, d) => {
        val nWords = size(TextFns.words(col("text"))).cast("long")
        val nAlpha = length(regexp_replace(col("text"), "[^a-zA-Z]", "")).cast("long")
        val nStops = size(regexp_extract_all(lower(col("text")),
          lit(s"\\b${TextFns.stopwords.mkString("(", "|", ")")}\\b"),
          lit(0))).cast("long")
        val nSymbols = (length(col("text")) -
          length(regexp_replace(col("text"), "[#.]", ""))).cast("long")
        def fp(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
          floor(num * 10000.0 / den + 0.5).cast("long")
        docs(s, d).select(col("doc_id"),
            nWords.as("n_words"), nAlpha.as("n_alpha"),
            nStops.as("n_stopword_hits"), nSymbols.as("n_symbols"))
          .withColumn("mean_word_len_x1e4",
            fp(col("n_alpha"), greatest(col("n_words"), lit(1L))))
          .withColumn("symbol_ratio_x1e4",
            fp(col("n_symbols"), greatest(col("n_words"), lit(1L))))
          .withColumn("keep",
            col("n_words").between(15, 100000) &&
              col("mean_word_len_x1e4").between(20000L, 100000L) &&
              col("symbol_ratio_x1e4") < 1000L &&
              col("n_stopword_hits") >= 2L)
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id, n_words, n_alpha, n_stopword_hits, n_symbols,
             |CAST(floor(n_alpha * 10000.0 / greatest(n_words, 1) + 0.5) AS BIGINT) AS mean_word_len_x1e4,
             |CAST(floor(n_symbols * 10000.0 / greatest(n_words, 1) + 0.5) AS BIGINT) AS symbol_ratio_x1e4,
             |(n_words BETWEEN 15 AND 100000)
             |  AND (CAST(floor(n_alpha * 10000.0 / greatest(n_words, 1) + 0.5) AS BIGINT) BETWEEN 20000 AND 100000)
             |  AND CAST(floor(n_symbols * 10000.0 / greatest(n_words, 1) + 0.5) AS BIGINT) < 1000
             |  AND n_stopword_hits >= 2 AS keep
             |FROM (SELECT doc_id,
             |  CAST(len(regexp_extract_all(lower(text), '[a-z]{3,}')) AS BIGINT) AS n_words,
             |  CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS n_alpha,
             |  CAST(len(regexp_extract_all(lower(text), '\\b${TextFns.stopwords.mkString("(", "|", ")")}\\b')) AS BIGINT) AS n_stopword_hits,
             |  CAST(length(text) - length(regexp_replace(text, '[#.]', '', 'g')) AS BIGINT) AS n_symbols
             |FROM documents) ORDER BY doc_id""".stripMargin)),

    // Repetition profile (Gopher-style repetition gates): most-frequent
    // bigram count + within-doc repeated-trigram mass, one narrow scan.
    QDef("q78_repetition",
      (s, d) => DedupOps.repetitionStats(docs(s, d), "doc_id", "text")
        .orderBy(col("doc_id")),
      Some("""WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
             |bic AS (SELECT doc_id, array_to_string(list_slice(t, i, i+1), ' ') AS g, count(*) AS c
             |        FROM toks, UNNEST(range(1, len(t))) AS u(i) GROUP BY 1, 2),
             |bitop AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bigram_n FROM bic GROUP BY 1),
             |tric AS (SELECT doc_id, array_to_string(list_slice(t, i, i+2), ' ') AS g, count(*) AS c
             |         FROM toks, UNNEST(range(1, len(t)-1)) AS u(i) GROUP BY 1, 2),
             |trig AS (SELECT doc_id, CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_trigram_occ,
             |         CAST(count(*) AS BIGINT) AS n_distinct_trigrams FROM tric GROUP BY 1)
             |SELECT k.doc_id, CAST(len(k.t) AS BIGINT) AS n_tokens,
             |coalesce(b.top_bigram_n, 0) AS top_bigram_n,
             |coalesce(g.dup_trigram_occ, 0) AS dup_trigram_occ,
             |coalesce(g.n_distinct_trigrams, 0) AS n_distinct_trigrams
             |FROM toks k LEFT JOIN bitop b USING (doc_id) LEFT JOIN trig g USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // Benchmark decontamination: distinct 4-gram overlap against a
    // deterministic pseudo-benchmark slice (doc_id % 97 = 0). One tokenize
    // pass per doc slice; only the benchmark's distinct gram set is cached
    // and it broadcasts only while small, shuffled-hash otherwise — see
    // DedupOps.decontaminate for the scale rationale.
    QDef("q79_decontaminate",
      (s, d) => DedupOps.decontaminate(docs(s, d), "doc_id", "text", 4,
          col("doc_id") % 97 === 0)
        .orderBy(col("doc_id")),
      Some("""WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
             |grams AS (SELECT DISTINCT doc_id, array_to_string(list_slice(t, i, i+3), ' ') AS g
             |          FROM toks, UNNEST(range(1, len(t)-2)) AS u(i)),
             |bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0)
             |SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_shared_grams
             |FROM grams c JOIN bench b USING (g)
             |WHERE c.doc_id % 97 <> 0
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Span-level decontamination: q79's benchmark overlap located as token
    // RANGES (surgical excision evidence) instead of a per-doc drop score.
    // Same bench slice + broadcast gating as q79; the marked subset is
    // contamination-bounded before the per-doc span merge.
    QDef("q197_decontaminate_spans",
      (s, d) => DedupOps.decontaminateSpans(docs(s, d), "doc_id", "text", 4,
          col("doc_id") % 97 === 0)
        .orderBy(col("doc_id")),
      Some("""WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
             |pg AS (SELECT doc_id, i AS pos, array_to_string(list_slice(t, i, i + 3), ' ') AS g
             |       FROM toks, UNNEST(range(1, len(t) - 2)) AS u(i)),
             |bench AS (SELECT DISTINCT g FROM pg WHERE doc_id % 97 = 0),
             |mk AS (SELECT pg.doc_id, pg.pos FROM pg JOIN bench USING (g) WHERE pg.doc_id % 97 <> 0),
             |isl AS (SELECT doc_id, pos, CASE WHEN pe IS NULL OR pos >= pe THEN 1 ELSE 0 END AS ni
             |        FROM (SELECT doc_id, pos, max(pos + 4) OVER (PARTITION BY doc_id ORDER BY pos
             |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe FROM mk)),
             |g2 AS (SELECT doc_id, pos, sum(ni) OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM isl),
             |sp AS (SELECT doc_id, island, max(pos) + 4 - min(pos) AS len, count(*) AS nw FROM g2 GROUP BY 1, 2),
             |ag AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
             |       CAST(sum(len) AS BIGINT) AS tokens_removed,
             |       CAST(sum(nw) AS BIGINT) AS n_marked_windows FROM sp GROUP BY 1)
             |SELECT d.doc_id, CAST(len(d.t) AS BIGINT) AS n_tokens,
             |  coalesce(a.n_marked_windows, 0) AS n_marked_windows,
             |  coalesce(a.n_spans, 0) AS n_spans,
             |  coalesce(a.tokens_removed, 0) AS tokens_removed,
             |  CASE WHEN len(d.t) = 0 THEN 0.0
             |       ELSE round(coalesce(a.tokens_removed, 0) / len(d.t), 6) END AS removed_frac
             |FROM toks d LEFT JOIN ag a USING (doc_id)
             |WHERE d.doc_id % 97 <> 0 ORDER BY doc_id""".stripMargin)),

    // Per-suite contamination matrix: q79 against MANY benchmark suites
    // at once — sparse (doc, suite) overlap cells from ONE gram pass;
    // suite gram sets are S x benchmark-bounded and gated-broadcast.
    QDef("q202_contamination_matrix",
      (s, d) => DedupOps.contaminationBySuite(docs(s, d), "doc_id", "text", 4,
          Seq("A" -> (col("doc_id") % 97 === 0),
            "B" -> (col("doc_id") % 89 === 0)))
        .orderBy(col("doc_id"), col("suite")),
      Some("""WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
             |grams AS (SELECT DISTINCT doc_id, array_to_string(list_slice(t, i, i+3), ' ') AS g
             |          FROM toks, UNNEST(range(1, len(t)-2)) AS u(i)),
             |su AS (SELECT 'A' AS suite, g FROM grams WHERE doc_id % 97 = 0
             |       UNION SELECT 'B' AS suite, g FROM grams WHERE doc_id % 89 = 0),
             |probe AS (SELECT doc_id, g FROM grams WHERE doc_id % 97 <> 0 AND doc_id % 89 <> 0),
             |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams FROM probe GROUP BY 1),
             |sh AS (SELECT p.doc_id, s.suite, CAST(count(*) AS BIGINT) AS n_shared_grams
             |       FROM probe p JOIN su s USING (g) GROUP BY 1, 2)
             |SELECT sh.doc_id, sh.suite, sh.n_shared_grams, t.n_grams,
             |  round(sh.n_shared_grams / CAST(t.n_grams AS DOUBLE), 6) AS shared_frac
             |FROM sh JOIN tot t USING (doc_id)
             |ORDER BY doc_id, suite""".stripMargin)),

    // APPLY the q197 excision: per surviving doc, the de-contaminated
    // token stream proven by content hash (md5 of the kept tokens) — the
    // corpus never shuffles; spans broadcast onto a narrow array filter.
    QDef("q201_excise_contamination",
      (s, d) => DedupOps.exciseContamination(docs(s, d), "doc_id", "text", 4,
          col("doc_id") % 97 === 0)
        .orderBy(col("doc_id")),
      Some("""WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
             |pg AS (SELECT doc_id, i AS pos, array_to_string(list_slice(t, i, i + 3), ' ') AS g
             |       FROM toks, UNNEST(range(1, len(t) - 2)) AS u(i)),
             |bench AS (SELECT DISTINCT g FROM pg WHERE doc_id % 97 = 0),
             |mk AS (SELECT pg.doc_id, pg.pos FROM pg JOIN bench USING (g) WHERE pg.doc_id % 97 <> 0),
             |isl AS (SELECT doc_id, pos, CASE WHEN pe IS NULL OR pos >= pe THEN 1 ELSE 0 END AS ni
             |        FROM (SELECT doc_id, pos, max(pos + 4) OVER (PARTITION BY doc_id ORDER BY pos
             |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe FROM mk)),
             |g2 AS (SELECT doc_id, pos, sum(ni) OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM isl),
             |sp AS (SELECT doc_id, island, min(pos) AS s, max(pos) + 4 AS e FROM g2 GROUP BY 1, 2),
             |pos AS (SELECT doc_id, i, t[i] AS tok FROM toks, UNNEST(range(1, len(t) + 1)) AS u(i)
             |        WHERE doc_id % 97 <> 0),
             |kept AS (SELECT p.doc_id, p.i, p.tok FROM pos p
             |         WHERE NOT EXISTS (SELECT 1 FROM sp
             |           WHERE sp.doc_id = p.doc_id AND p.i >= sp.s AND p.i < sp.e)),
             |ag AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
             |       md5(string_agg(tok, ' ' ORDER BY i)) AS m FROM kept GROUP BY 1)
             |SELECT d.doc_id, coalesce(a.n_kept, 0) AS n_tokens_kept,
             |  coalesce(a.m, md5('')) AS kept_md5
             |FROM (SELECT doc_id FROM toks WHERE doc_id % 97 <> 0) d
             |LEFT JOIN ag a USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // Intra-document repetition removal: within-doc keep-first on token
    // trigram windows, marked windows merged to maximal spans — the
    // MassiveText-style self-repeat trim decision (q78 only scores it).
    QDef("q199_intradoc_dedup",
      (s, d) => DedupOps.intraDocDupSpans(docs(s, d), "doc_id", "text", 3)
        .orderBy(col("doc_id")),
      Some("""WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
             |pg AS (SELECT doc_id, i AS pos, array_to_string(list_slice(t, i, i + 2), ' ') AS g
             |       FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)),
             |mk AS (SELECT doc_id, pos FROM (
             |        SELECT doc_id, pos, row_number() OVER (PARTITION BY doc_id, g ORDER BY pos) AS rn FROM pg)
             |       WHERE rn > 1),
             |isl AS (SELECT doc_id, pos, CASE WHEN pe IS NULL OR pos >= pe THEN 1 ELSE 0 END AS ni
             |        FROM (SELECT doc_id, pos, max(pos + 3) OVER (PARTITION BY doc_id ORDER BY pos
             |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe FROM mk)),
             |g2 AS (SELECT doc_id, pos, sum(ni) OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM isl),
             |sp AS (SELECT doc_id, island, max(pos) + 3 - min(pos) AS len, count(*) AS nw FROM g2 GROUP BY 1, 2),
             |ag AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
             |       CAST(sum(len) AS BIGINT) AS tokens_removed,
             |       CAST(sum(nw) AS BIGINT) AS n_marked_windows FROM sp GROUP BY 1)
             |SELECT d.doc_id, CAST(len(d.t) AS BIGINT) AS n_tokens,
             |  coalesce(a.n_marked_windows, 0) AS n_marked_windows,
             |  coalesce(a.n_spans, 0) AS n_spans,
             |  coalesce(a.tokens_removed, 0) AS tokens_removed,
             |  CASE WHEN len(d.t) = 0 THEN 0.0
             |       ELSE round(coalesce(a.tokens_removed, 0) / len(d.t), 6) END AS removed_frac
             |FROM toks d LEFT JOIN ag a USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // Blocklist audit via ONE Aho-Corasick pass (substring semantics; the
    // oracle's replace-based count equals the all-occurrence count because
    // every term is border-free — asserted in TextMiningSpec).
    QDef("q198_blocklist_hits",
      (s, d) => TextMining.blocklistHits(docs(s, d), "text",
          TextQueries.blocklistTerms)
        .orderBy(col("term")),
      Some(s"""WITH terms(term) AS (VALUES ${TextQueries.blocklistTerms
               .map(t => s"('$t')").mkString(", ")}),
             |h AS (SELECT t.term,
             |    (len(lower(d.text)) - len(replace(lower(d.text), t.term, ''))) // len(t.term) AS c
             |  FROM documents d CROSS JOIN terms t)
             |SELECT term, CAST(count(*) FILTER (WHERE c > 0) AS BIGINT) AS n_docs,
             |  CAST(sum(c) AS BIGINT) AS n_hits
             |FROM h GROUP BY 1 ORDER BY term""".stripMargin)),

    // Tokenizer fertility per language: subwords per whitespace token and
    // chars per subword (x1e4 fixed point) — the multilingual tokenizer-
    // efficiency diagnostic (CJK text shows its per-char fertility here).
    QDef("q200_fertility_by_lang",
      (s, d) => docs(s, d)
        .groupBy(col("lang"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(length(col("text"))).cast("long").as("sum_chars"),
          sum(TextFns.tokenCount(col("text"))).cast("long").as("sum_ws_tokens"),
          sum(TextFns.subwordCount(col("text"))).cast("long").as("sum_subwords"))
        .withColumn("fertility_x1e4", when(col("sum_ws_tokens") === 0, lit(0L))
          .otherwise(floor(col("sum_subwords") * lit(10000.0)
            / col("sum_ws_tokens") + lit(0.5)).cast("long")))
        .withColumn("chars_per_subword_x1e4", when(col("sum_subwords") === 0, lit(0L))
          .otherwise(floor(col("sum_chars") * lit(10000.0)
            / col("sum_subwords") + lit(0.5)).cast("long")))
        .orderBy(col("lang")),
      Some("""SELECT lang, n_docs, sum_chars, sum_ws_tokens, sum_subwords,
             |  CASE WHEN sum_ws_tokens = 0 THEN 0
             |       ELSE CAST(floor(sum_subwords * 10000.0 / sum_ws_tokens + 0.5) AS BIGINT) END AS fertility_x1e4,
             |  CASE WHEN sum_subwords = 0 THEN 0
             |       ELSE CAST(floor(sum_chars * 10000.0 / sum_subwords + 0.5) AS BIGINT) END AS chars_per_subword_x1e4
             |FROM (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(sum(length(text)) AS BIGINT) AS sum_chars,
             |    CAST(sum(len(regexp_extract_all(text, '[^ ]+'))) AS BIGINT) AS sum_ws_tokens,
             |    CAST(sum(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9 ]'))) AS BIGINT) AS sum_subwords
             |  FROM documents GROUP BY 1)
             |ORDER BY lang""".stripMargin)),

    // Deterministic train/val/test split: first hex digit of md5(doc_id)
    // buckets 75/12.5/12.5 — stable under resharding and across engines.
    QDef("q80_hash_split",
      (s, d) => docs(s, d)
        .withColumn("h", substring(md5(col("doc_id").cast("string")), 1, 1))
        .withColumn("split",
          when(col("h").between("0", "9") || col("h").isin("a", "b"), "train")
            .when(col("h").isin("c", "d"), "val")
            .otherwise("test"))
        .groupBy(col("split"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"))
        .orderBy(col("split")),
      Some("""WITH s AS (SELECT *, substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS h FROM documents)
             |SELECT CASE WHEN h BETWEEN '0' AND '9' OR h IN ('a','b') THEN 'train'
             |            WHEN h IN ('c','d') THEN 'val' ELSE 'test' END AS split,
             |count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
             |FROM s GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Deterministic shard export: md5-hash global shuffle order, 16 shards,
    // within-shard positions — one shuffle keyed by shard + local sort (the
    // rank window partitions by shard_id; never a global sort).
    QDef("q141_shard_export",
      (s, d) => graft.operators.Relational.shardExport(docs(s, d), "doc_id", 16)
        .orderBy(col("shard_id"), col("position")),
      Some("""WITH s AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
             |t AS (SELECT doc_id, h,
             |    CAST(CAST(('0x' || substr(h, 1, 4)) AS INTEGER) % 16 AS BIGINT) AS shard_id
             |  FROM s)
             |SELECT doc_id, shard_id,
             |  CAST(row_number() OVER (PARTITION BY shard_id ORDER BY h, doc_id) AS BIGINT) AS position,
             |  h AS order_key
             |FROM t ORDER BY shard_id, position""".stripMargin)),

    // OOV-rate audit: fraction of an increment's tokens unseen in the
    // corpus vocabulary — the vocab-drift signal that decides tokenizer
    // retraining. Vocab is word-keyed (one aggregate); the increment
    // left-joins it and aggregates per doc. Same increment convention as
    // q142 (doc_id%10==0).
    QDef("q149_oov_rate",
      (s, d) => {
        val all = docs(s, d)
        val vocab = all.filter(col("doc_id") % 10 =!= 0)
          .select(explode(TextFns.words(col("text"))).as("w")).distinct()
          .withColumn("known", lit(1L))
        all.filter(col("doc_id") % 10 === 0)
          .select(col("doc_id"), explode_outer(TextFns.words(col("text"))).as("w"))
          .join(vocab, Seq("w"), "left")
          .groupBy(col("doc_id"))
          .agg(count(col("w")).as("n_tokens"),
            count(when(col("w").isNotNull && col("known").isNull, lit(1)))
              .as("n_oov"))
          .withColumn("oov_rate", when(col("n_tokens") === 0, lit(0.0))
            .otherwise(round(col("n_oov").cast("double") / col("n_tokens"), 6)))
          .orderBy(col("doc_id"))
      },
      Some("""WITH vocab AS (SELECT DISTINCT unnest(regexp_extract_all(lower(text), '[a-z]{3,}')) AS w
             |  FROM documents WHERE doc_id % 10 <> 0),
             |tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]{3,}')) AS w
             |  FROM documents WHERE doc_id % 10 = 0),
             |per AS (SELECT t.doc_id, count(*) AS n_tokens,
             |    count(*) FILTER (WHERE v.w IS NULL) AS n_oov
             |  FROM tok t LEFT JOIN vocab v ON t.w = v.w GROUP BY 1)
             |SELECT d.doc_id, COALESCE(per.n_tokens, 0) AS n_tokens,
             |  COALESCE(per.n_oov, 0) AS n_oov,
             |  CASE WHEN COALESCE(per.n_tokens, 0) = 0 THEN 0.0
             |       ELSE round(per.n_oov / CAST(per.n_tokens AS DOUBLE), 6) END AS oov_rate
             |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) d
             |LEFT JOIN per USING (doc_id) ORDER BY d.doc_id""".stripMargin)),

    // Unicode NFC normalization: decomposed combining sequences are
    // spliced in deterministically (q75's PII-splice pattern), normalized
    // with Java's Normalizer, and hash-pinned against DuckDB's
    // nfc_normalize — same Unicode algorithm, independent implementations.
    QDef("q148_unicode_nfc",
      (s, d) => docs(s, d)
        .withColumn("t2", concat(col("text"),
          when(col("doc_id") % 7 === 0, lit(" café")).otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            lit(" Ångström")).otherwise(lit(""))))
        .select(col("doc_id"),
          when(TextFns.nfcNormalize(col("t2")) =!= col("t2"), 1L).otherwise(0L)
            .as("changed"),
          md5(TextFns.nfcNormalize(col("t2"))).as("nfc_md5"))
        .orderBy(col("doc_id")),
      Some("""WITH s AS (SELECT doc_id, text
             |    || CASE WHEN doc_id % 7 = 0 THEN ' cafe' || chr(769) ELSE '' END
             |    || CASE WHEN doc_id % 11 = 0
             |       THEN ' A' || chr(778) || 'ngstro' || chr(776) || 'm' ELSE '' END AS t2
             |  FROM documents)
             |SELECT doc_id,
             |  CAST(CASE WHEN nfc_normalize(t2) <> t2 THEN 1 ELSE 0 END AS BIGINT) AS changed,
             |  md5(nfc_normalize(t2)) AS nfc_md5
             |FROM s ORDER BY doc_id""".stripMargin)),

    // Snapshot diff for dataset versioning: old = docs with id%5≠0, new =
    // docs with id%3≠0 and id%7==0 texts edited — so every status arises.
    // One full-outer fingerprint join; content never shuffles.
    QDef("q147_snapshot_diff",
      (s, d) => {
        val all = docs(s, d)
        val oldSnap = all.filter(col("doc_id") % 5 =!= 0)
        val newSnap = all.filter(col("doc_id") % 3 =!= 0)
          .withColumn("text", when(col("doc_id") % 7 === 0,
            concat(col("text"), lit(" edited"))).otherwise(col("text")))
        graft.operators.Relational.snapshotDiff(oldSnap, newSnap, "doc_id",
            TextFns.fingerprint(col("text")))
          .orderBy(col("doc_id"))
      },
      Some("""WITH oldd AS (SELECT doc_id,
             |    md5(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS fp
             |  FROM documents WHERE doc_id % 5 <> 0),
             |newd AS (SELECT doc_id,
             |    md5(regexp_replace(lower(
             |      CASE WHEN doc_id % 7 = 0 THEN text || ' edited' ELSE text END),
             |      '[^a-z0-9]+', ' ', 'g')) AS fp
             |  FROM documents WHERE doc_id % 3 <> 0)
             |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
             |  CASE WHEN o.doc_id IS NULL THEN 'added'
             |       WHEN n.doc_id IS NULL THEN 'deleted'
             |       WHEN o.fp <> n.fp THEN 'changed'
             |       ELSE 'unchanged' END AS status
             |FROM oldd o FULL OUTER JOIN newd n ON o.doc_id = n.doc_id
             |ORDER BY doc_id""".stripMargin)),

    // Length-bucketed batching audit: fixed 64-token brackets (how
    // production packing brackets work — no global sort, pure map +
    // one keyed aggregate), per-bracket padding waste = n·max − sum,
    // i.e. tokens burned padding every doc to its bracket's max.
    QDef("q145_length_buckets",
      (s, d) => docs(s, d)
        .select(TextFns.tokenCount(col("text")).as("t"))
        .groupBy((col("t") / 64).cast("long").as("bucket"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          min(col("t")).as("min_tokens"),
          max(col("t")).as("max_tokens"),
          (count(lit(1)) * max(col("t")) - sum(col("t"))).cast("long")
            .as("padding_waste"))
        .orderBy(col("bucket")),
      Some("""WITH t AS (SELECT CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS t
             |          FROM documents)
             |SELECT CAST(t // 64 AS BIGINT) AS bucket, count(*) AS n_docs,
             |  min(t) AS min_tokens, max(t) AS max_tokens,
             |  CAST(count(*) * max(t) - sum(t) AS BIGINT) AS padding_waste
             |FROM t GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // DSIR data selection: the doc_id%97==0 slice plays the target domain
    // (same convention as q79's benchmark); the 20 most target-like source
    // docs by unigram log importance weight. Ranking is on the ROUNDED
    // score (engine-portable), doc_id tie-break.
    QDef("q144_dsir_selection",
      (s, d) => graft.operators.DataSelection.dsirScores(
          docs(s, d), "doc_id", "text", col("doc_id") % 97 === 0)
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20),
      Some("""WITH tok AS (SELECT doc_id, doc_id % 97 = 0 AS t,
             |    unnest(regexp_extract_all(lower(text), '[a-z]{3,}')) AS w
             |  FROM documents),
             |st AS (SELECT w, count(*) FILTER (WHERE t) AS tf_t,
             |    count(*) FILTER (WHERE NOT t) AS tf_s FROM tok GROUP BY 1),
             |g AS (SELECT CAST(sum(tf_t) AS DOUBLE) AS nt,
             |    CAST(sum(tf_s) AS DOUBLE) AS ns,
             |    CAST(count(*) AS DOUBLE) AS v FROM st),
             |r AS (SELECT w, ln((tf_t + 1.0) / (nt + v))
             |    - ln((tf_s + 1.0) / (ns + v)) AS lr FROM st, g),
             |dt AS (SELECT doc_id, w, count(*) AS tf FROM tok
             |       WHERE NOT t GROUP BY 1, 2)
             |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
             |  round(sum(tf * lr), 6) AS score
             |FROM dt JOIN r USING (w) GROUP BY 1
             |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin)),

    // Data-mixing weights: per-source token mass vs a uniform target mix —
    // weight = (total/n_sources)/src_tokens as fixed-point ×10⁴.
    QDef("q81_mix_weights",
      (s, d) => {
        val w = Window.partitionBy()
        docs(s, d)
          .groupBy(col("source"))
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(TextFns.tokenCount(col("text"))).cast("long").as("src_tokens"))
          .withColumn("total_tokens", sum(col("src_tokens")).over(w))
          .withColumn("n_sources", count(lit(1)).over(w))
          .select(col("source"), col("n_docs"), col("src_tokens"),
            floor(col("total_tokens") * 10000.0 /
              (col("n_sources") * col("src_tokens")) + 0.5)
              .cast("long").as("weight_x1e4"))
          .orderBy(col("source"))
      },
      Some("""WITH s AS (SELECT source, count(*) AS n_docs,
             |  CAST(sum(len(regexp_extract_all(text, '[^ ]+'))) AS BIGINT) AS src_tokens
             |  FROM documents GROUP BY 1)
             |SELECT source, n_docs, src_tokens,
             |CAST(floor(CAST(sum(src_tokens) OVER () AS BIGINT) * 10000.0 /
             |     (count(*) OVER () * src_tokens) + 0.5) AS BIGINT) AS weight_x1e4
             |FROM s ORDER BY source""".stripMargin)),

    // Edit-distance near-match pairs over a small distinct domain
    // (levenshtein agrees across engines — classic unweighted DP).
    QDef("q92_fuzzy_types",
      (s, d) => {
        val types = Tables(s, d, "part").select(col("p_type")).distinct()
        types.select(col("p_type").as("type_a"))
          .join(types.select(col("p_type").as("type_b")),
            col("type_a") < col("type_b"))
          .withColumn("dist", levenshtein(col("type_a"), col("type_b")).cast("long"))
          .filter(col("dist") <= 8)
          .orderBy(col("type_a"), col("type_b"))
      },
      Some("""WITH t AS (SELECT DISTINCT p_type FROM part)
             |SELECT a.p_type AS type_a, b.p_type AS type_b,
             |CAST(levenshtein(a.p_type, b.p_type) AS BIGINT) AS dist
             |FROM t a JOIN t b ON a.p_type < b.p_type
             |WHERE levenshtein(a.p_type, b.p_type) <= 8
             |ORDER BY 1, 2""".stripMargin)),

    // Per-source token-distribution entropy (corpus diversity — low entropy
    // flags TEMPLATED/repetitive sources before they skew a training mix).
    QDef("q99_source_entropy",
      (s, d) => {
        val tok = docs(s, d).select(col("source"),
          explode(regexp_extract_all(lower(col("text")),
            lit("[a-z0-9]+"), lit(0))).as("w"))
        val c = tok.groupBy(col("source"), col("w"))
          .agg(count(lit(1)).as("c"))
        val t = c.withColumn("tot",
          sum("c").over(Window.partitionBy(col("source"))))
        t.groupBy(col("source"))
          .agg(max(col("tot")).cast("long").as("n_tokens"),
            count(lit(1)).cast("long").as("n_distinct"),
            floor(-sum((col("c") * 1.0 / col("tot")) *
              log(col("c") * 1.0 / col("tot"))) * 10000 + 0.5)
              .cast("long").as("entropy_x1e4"))
          .orderBy(col("source"))
      },
      Some("""WITH tok AS (SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w FROM documents),
             |c AS (SELECT source, w, count(*) AS c FROM tok GROUP BY 1, 2),
             |t AS (SELECT source, w, c, CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS tot FROM c)
             |SELECT source, CAST(max(tot) AS BIGINT) AS n_tokens,
             |CAST(count(*) AS BIGINT) AS n_distinct,
             |CAST(floor(-sum((c * 1.0 / tot) * ln(c * 1.0 / tot)) * 10000 + 0.5) AS BIGINT) AS entropy_x1e4
             |FROM t GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Exact frequent tokens via count-min-sketch candidate pruning: the
    // sketch pass is narrow (KBs of state, no shuffle); only tokens whose
    // CMS estimate clears the threshold reach the exact-count shuffle.
    // CMS never undercounts, so the output is exactly the true heavy
    // hitters — hence a plain GROUP BY/HAVING oracle.
    QDef("q103_heavy_hitters",
      (s, d) => graft.operators.HeavyHitters
        .frequentTokens(docs(s, d), "text", minCount = 200L)
        .orderBy(col("w")),
      Some("""WITH tok AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w FROM documents)
             |SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM tok
             |GROUP BY w HAVING count(*) >= 200 ORDER BY w""".stripMargin)),

    // Bigram language-model quality score (CCNet-style perplexity filter):
    // the corpus is its own training set; each doc scored by the add-k
    // smoothed average log-probability of its word bigrams. Low scores flag
    // gibberish/boilerplate before a training mix. Bigrams are built by a
    // narrow slice+zip (no window shuffle); the count tables partial-agg
    // map-side and join on their natural (w1[,w2]) keys; at 100 TB you'd
    // additionally prune the LM to a top-V vocabulary.
    QDef("q100_lm_score",
      (s, d) => {
        val tok = docs(s, d).select(col("doc_id"),
            regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))
              .as("ts"))
          .where(size(col("ts")) >= 2)
        val pairs = tok.select(col("doc_id"),
            slice(col("ts"), lit(1), size(col("ts")) - 1).as("a"),
            slice(col("ts"), lit(2), size(col("ts")) - 1).as("b"))
          .select(col("doc_id"), explode(arrays_zip(col("a"), col("b"))).as("p"))
          .select(col("doc_id"), col("p.a").as("w1"), col("p.b").as("w2"))
          .persist()
        val bc = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
        val cc = pairs.groupBy("w1").agg(count(lit(1)).as("cu"))
        val vs = tok.select(explode(col("ts")).as("w"))
          .agg(countDistinct(col("w")).as("vs"))
        val scored = pairs.join(bc, Seq("w1", "w2")).join(cc, Seq("w1"))
          .crossJoin(broadcast(vs))
          .groupBy("doc_id")
          .agg(count(lit(1)).cast("long").as("n_bigrams"),
            floor(avg(log((col("cb") + 0.5) / (col("cu") + col("vs") * 0.5)))
              * 10000 + 0.5).cast("long").as("logprob_x1e4"))
        // release the corpus-sized cached pair table once the doc-sized
        // aggregate is materialized (same leak shape as q209)
        graft.operators.DedupOps.materializeAndRelease(scored, pairs)
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts FROM documents),
             |t AS (SELECT doc_id, unnest(ts) AS w, generate_subscripts(ts, 1) AS i FROM tok WHERE len(ts) >= 2),
             |pairs AS (SELECT a.doc_id, a.w AS w1, b.w AS w2 FROM t a JOIN t b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
             |bc AS (SELECT w1, w2, count(*) AS cb FROM pairs GROUP BY 1, 2),
             |cc AS (SELECT w1, count(*) AS cu FROM pairs GROUP BY 1),
             |v AS (SELECT count(DISTINCT w) AS vs FROM t)
             |SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             |CAST(floor(avg(ln((bc.cb + 0.5) / (cc.cu + 0.5 * v.vs))) * 10000 + 0.5) AS BIGINT) AS logprob_x1e4
             |FROM pairs p JOIN bc ON p.w1 = bc.w1 AND p.w2 = bc.w2 JOIN cc ON p.w1 = cc.w1 CROSS JOIN v
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Pairwise Jensen-Shannon divergence between source token
    // distributions — the symmetric, bounded ([0, ln 2]) mixing
    // diagnostic next to q99's per-source entropy and q155's set
    // overlap: which sources say the same words at DIFFERENT rates.
    // Decomposed so only the SHARED vocabulary joins (q155's S²-per-word
    // bound): JS = ½·Σ_shared[p·ln(2p/(p+q)) + q·ln(2q/(p+q))]
    // + ½·ln2·(exclusive mass a + exclusive mass b), with the exclusive
    // masses derived as 1 − shared mass — no vocabulary-scale outer join;
    // zero-overlap pairs (JS = ln 2 exactly) are restored from an
    // aggregate-sized source-pair spine so consumers never misread
    // absence as "not computed".
    QDef("q214_js_divergence",
      (s, d) => {
        val tok = docs(s, d).select(col("source"),
          explode(regexp_extract_all(lower(col("text")),
            lit("[a-z0-9]+"), lit(0))).as("w"))
        val c = tok.groupBy(col("source"), col("w"))
          .agg(count(lit(1)).as("c"))
        val t = c.withColumn("tot",
          sum("c").over(Window.partitionBy(col("source"))))
        val ta = t.select(col("source").as("source_a"), col("w"),
          (col("c") * lit(1.0) / col("tot")).as("pa"))
        val tb = t.select(col("source").as("source_b"), col("w"),
          (col("c") * lit(1.0) / col("tot")).as("pb"))
        val shared = ta.join(tb, Seq("w"))
          .filter(col("source_a") < col("source_b"))
          .groupBy(col("source_a"), col("source_b"))
          .agg(count(lit(1)).cast("long").as("n_shared_words"),
            sum(col("pa")).as("sh_a"), sum(col("pb")).as("sh_b"),
            sum(col("pa") * log(lit(2.0) * col("pa") / (col("pa") + col("pb")))
              + col("pb") * log(lit(2.0) * col("pb") / (col("pa") + col("pb"))))
              .as("core"))
        // source-pair spine: a pair with ZERO shared vocabulary is the
        // maximally-divergent case (JS = ln 2), and absence would read as
        // "not computed" — emit it explicitly. The spine is
        // |sources|²-sized (aggregate-bounded, broadcast).
        val srcs = docs(s, d).select(col("source")).distinct()
        val spine = srcs.select(col("source").as("source_a"))
          .crossJoin(srcs.select(col("source").as("source_b")))
          .filter(col("source_a") < col("source_b"))
        spine.join(shared, Seq("source_a", "source_b"), "left")
          .select(col("source_a"), col("source_b"),
            coalesce(col("n_shared_words"), lit(0L)).as("n_shared_words"),
            coalesce(
              floor((lit(0.5) * col("core") + lit(0.5) * log(lit(2.0))
                * ((lit(1.0) - col("sh_a")) + (lit(1.0) - col("sh_b"))))
                * 10000 + 0.5).cast("long"),
              lit(6931L)).as("js_x1e4"))
          .orderBy(col("source_a"), col("source_b"))
      },
      Some("""WITH tok AS (SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w FROM documents),
             |c AS (SELECT source, w, count(*) AS c FROM tok GROUP BY 1, 2),
             |t AS (SELECT source, w, c, sum(c) OVER (PARTITION BY source) AS tot FROM c),
             |j AS (SELECT a.source AS source_a, b.source AS source_b,
             |        a.c * 1.0 / a.tot AS pa, b.c * 1.0 / b.tot AS pb
             |      FROM t a JOIN t b ON a.w = b.w AND a.source < b.source),
             |g AS (SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_shared_words,
             |        sum(pa) AS sh_a, sum(pb) AS sh_b,
             |        sum(pa * ln(2.0 * pa / (pa + pb)) + pb * ln(2.0 * pb / (pa + pb))) AS core
             |      FROM j GROUP BY 1, 2),
             |srcs AS (SELECT DISTINCT source FROM documents),
             |spine AS (SELECT a.source AS source_a, b.source AS source_b
             |          FROM srcs a JOIN srcs b ON a.source < b.source)
             |SELECT s.source_a, s.source_b,
             |  COALESCE(n_shared_words, 0) AS n_shared_words,
             |  COALESCE(CAST(floor((0.5 * core + 0.5 * ln(2.0) * ((1.0 - sh_a) + (1.0 - sh_b)))
             |    * 10000 + 0.5) AS BIGINT), 6931) AS js_x1e4
             |FROM spine s LEFT JOIN g ON s.source_a = g.source_a AND s.source_b = g.source_b
             |ORDER BY s.source_a, s.source_b""".stripMargin)),

    // Encoding-health audit (the ftfy-class diagnostic): deterministic
    // mojibake / zero-width / replacement-char / control-char markers are
    // spliced into a doc slice (q75's PII-seeding precedent), then the
    // DETECTORS — explicit-codepoint regex classes, identical in Java
    // regex and RE2 — report per-source counts. One narrow scan.
    QDef("q210_encoding_health",
      (s, d) => {
        val seeded = docs(s, d).withColumn("t2", concat(col("text"),
          when(col("doc_id") % 6 === 0, lit(" caf\u00c3\u00a9"))
            .otherwise(lit("")),
          when(col("doc_id") % 7 === 0, lit(" zero\u200bwidth"))
            .otherwise(lit("")),
          when(col("doc_id") % 11 === 0, lit(" bad\ufffdchar"))
            .otherwise(lit("")),
          when(col("doc_id") % 13 === 0, lit(" ctl\u0007"))
            .otherwise(lit(""))))
        seeded.groupBy(col("source"))
          .agg(count(lit(1)).cast("long").as("n_docs"),
            count(when(col("t2")
              .rlike("[\\x{00C2}\\x{00C3}][\\x{0080}-\\x{00FF}]"), 1))
              .cast("long").as("n_mojibake"),
            count(when(col("t2")
              .rlike("[\\x{200B}\\x{200C}\\x{200D}\\x{FEFF}]"), 1))
              .cast("long").as("n_zero_width"),
            count(when(col("t2").contains("\ufffd"), 1))
              .cast("long").as("n_replacement"),
            count(when(col("t2")
              .rlike("[\\x{0000}-\\x{0008}\\x{000B}\\x{000C}\\x{000E}-\\x{001F}]"), 1))
              .cast("long").as("n_control"))
          .orderBy(col("source"))
      },
      Some("""WITH s2 AS (SELECT source, text
             |  || CASE WHEN doc_id % 6 = 0 THEN ' caf' || chr(195) || chr(169) ELSE '' END
             |  || CASE WHEN doc_id % 7 = 0 THEN ' zero' || chr(8203) || 'width' ELSE '' END
             |  || CASE WHEN doc_id % 11 = 0 THEN ' bad' || chr(65533) || 'char' ELSE '' END
             |  || CASE WHEN doc_id % 13 = 0 THEN ' ctl' || chr(7) ELSE '' END AS t2
             |  FROM documents)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(count(*) FILTER (WHERE regexp_matches(t2,
             |    '[\x{00C2}\x{00C3}][\x{0080}-\x{00FF}]')) AS BIGINT) AS n_mojibake,
             |  CAST(count(*) FILTER (WHERE regexp_matches(t2,
             |    '[\x{200B}\x{200C}\x{200D}\x{FEFF}]')) AS BIGINT) AS n_zero_width,
             |  CAST(count(*) FILTER (WHERE contains(t2, chr(65533))) AS BIGINT)
             |    AS n_replacement,
             |  CAST(count(*) FILTER (WHERE regexp_matches(t2,
             |    '[\x{0000}-\x{0008}\x{000B}\x{000C}\x{000E}-\x{001F}]')) AS BIGINT)
             |    AS n_control
             |FROM s2 GROUP BY 1 ORDER BY source""".stripMargin)),

    // Zipf-law fit audit: ln(freq) ~ ln(rank) regression slope over the
    // top-1000 vocabulary — natural text sits near −1; generated/spam
    // corpora bend away. The rank window runs over the VOCABULARY-sized
    // count table (never the corpus); regr_slope parity is q123's.
    QDef("q211_zipf_fit",
      (s, d) => {
        val counts = docs(s, d)
          .select(explode(regexp_extract_all(lower(col("text")),
            lit("[a-z0-9]+"), lit(0))).as("w"))
          .groupBy(col("w")).agg(count(lit(1)).as("n"))
        counts
          .withColumn("rank", row_number().over(
            Window.orderBy(col("n").desc, col("w"))))
          .filter(col("rank") <= 1000)
          .select(log(col("rank").cast("double")).as("x"),
            log(col("n").cast("double")).as("y"))
          .agg(count(lit(1)).cast("long").as("n_terms"),
            round(expr("regr_slope(y, x)"), 6).as("slope"),
            round(expr("regr_intercept(y, x)"), 6).as("intercept"))
      },
      Some("""WITH c AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
             |          FROM documents),
             |n AS (SELECT w, count(*) AS n FROM c GROUP BY 1),
             |r AS (SELECT n, row_number() OVER (ORDER BY n DESC, w) AS rank FROM n),
             |xy AS (SELECT ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(n AS DOUBLE)) AS y
             |       FROM r WHERE rank <= 1000)
             |SELECT CAST(count(*) AS BIGINT) AS n_terms,
             |  round(regr_slope(y, x), 6) AS slope,
             |  round(regr_intercept(y, x), 6) AS intercept
             |FROM xy""".stripMargin)),

    // Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995, absolute
    // discount D=0.75): P(w|v) = (max(c(vw)−D,0) + D·N1+(v·)·Pcont(w))/c(v)
    // with Pcont(w) = N1+(·w)/|bigram types| — the KenLM-style fluency
    // filter upgrade over q100's add-k (continuation probability separates
    // versatile words from frequent-but-rigid ones). Scoring corpus docs
    // with the corpus-trained model keeps every term > 0. Same scale
    // shape as q100: one pair materialization, vocabulary-sized count
    // tables joined back onto it.
    QDef("q209_kneser_ney",
      (s, d) => {
        val tok = docs(s, d).select(col("doc_id"),
            regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))
              .as("ts"))
          .where(size(col("ts")) >= 2)
        val pairs = tok.select(col("doc_id"),
            slice(col("ts"), lit(1), size(col("ts")) - 1).as("a"),
            slice(col("ts"), lit(2), size(col("ts")) - 1).as("b"))
          .select(col("doc_id"), explode(arrays_zip(col("a"), col("b"))).as("p"))
          .select(col("doc_id"), col("p.a").as("w1"), col("p.b").as("w2"))
          .persist()
        val bc = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
          .persist()
        val cc = pairs.groupBy("w1").agg(count(lit(1)).as("cu"))
        val n1r = bc.groupBy("w1").agg(count(lit(1)).as("n1r"))
        val n1l = bc.groupBy("w2").agg(count(lit(1)).as("n1l"))
        val tt = bc.agg(count(lit(1)).as("tt"))
        val scored = pairs.join(bc, Seq("w1", "w2")).join(cc, Seq("w1"))
          .join(n1r, Seq("w1")).join(n1l, Seq("w2"))
          .crossJoin(broadcast(tt))
          .groupBy("doc_id")
          .agg(count(lit(1)).cast("long").as("n_bigrams"),
            floor(avg(log((greatest(col("cb") - lit(0.75), lit(0.0))
                + lit(0.75) * col("n1r") * col("n1l") / col("tt"))
              / col("cu"))) * 10000 + 0.5).cast("long").as("kn_logprob_x1e4"))
        // the cached pair/bigram tables are corpus-sized — release them once
        // the doc-sized aggregate is materialized (session-lifetime leak
        // otherwise in a long bench/REPL run)
        graft.operators.DedupOps.materializeAndRelease(scored, pairs, bc)
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts FROM documents),
             |t AS (SELECT doc_id, unnest(ts) AS w, generate_subscripts(ts, 1) AS i FROM tok WHERE len(ts) >= 2),
             |pairs AS (SELECT a.doc_id, a.w AS w1, b.w AS w2 FROM t a JOIN t b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
             |bc AS (SELECT w1, w2, count(*) AS cb FROM pairs GROUP BY 1, 2),
             |cc AS (SELECT w1, count(*) AS cu FROM pairs GROUP BY 1),
             |n1r AS (SELECT w1, count(*) AS n1r FROM bc GROUP BY 1),
             |n1l AS (SELECT w2, count(*) AS n1l FROM bc GROUP BY 1),
             |v AS (SELECT count(*) AS tt FROM bc)
             |SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             |CAST(floor(avg(ln((greatest(bc.cb - 0.75, 0.0) + 0.75 * n1r.n1r * n1l.n1l / v.tt)
             |  / cc.cu)) * 10000 + 0.5) AS BIGINT) AS kn_logprob_x1e4
             |FROM pairs p JOIN bc ON p.w1 = bc.w1 AND p.w2 = bc.w2
             |JOIN cc ON p.w1 = cc.w1 JOIN n1r ON p.w1 = n1r.w1
             |JOIN n1l ON p.w2 = n1l.w2 CROSS JOIN v
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Distributed BPE tokenizer training: learned merge rules in training
    // order. Iterative argmax isn't SQL-expressible, so the oracle is a
    // golden fixture from an INDEPENDENT single-process BPE implementation
    // (tools/make_bpe_fixture.py) run over the same corpus — same
    // tokenizer, tie-break and stop rule, none of the same code.
    QDef("q98_bpe_merges",
      (s, d) => {
        val model = graft.operators.Bpe.train(docs(s, d), "text", nMerges = 10)
        import s.implicits._
        model.merges.zipWithIndex
          .map { case ((a, b), i) => (i.toLong + 1, a, b, a + b) }
          .toDF("rank", "left", "right", "merged")
          .orderBy(col("rank"))
      },
      Some(s"""SELECT "rank", "left", "right", merged
             |FROM read_parquet('${graft.Fixtures.goldenSf("bpe_merges")}')
             |ORDER BY "rank"""".stripMargin)),

    // Tokenizer APPLICATION at corpus scale: train the 10-merge table
    // (fixture-identical, q98), then encode every document — a pure map
    // stage with a per-executor word→encoding memo. Golden oracle: the
    // fixture tool's independent encoder over the same corpus + merges.
    QDef("q143_bpe_encode",
      (s, d) => {
        val model = graft.operators.Bpe.train(docs(s, d), "text", nMerges = 10)
        graft.operators.Bpe.encode(docs(s, d), "doc_id", "text", model)
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id, n_bpe_tokens, tokens_md5
             |FROM read_parquet('${graft.Fixtures.goldenSf("bpe_encode")}')
             |ORDER BY doc_id""".stripMargin)),

    // CCNet-style boilerplate scrub re-expressed over token windows (the
    // corpus has no newlines, so fixed 10-token windows stand in for
    // lines): a window whose exact content appears in ≥2 distinct docs is
    // corpus boilerplate and is dropped; the doc is reassembled from the
    // surviving windows in order. The boilerplate set is O(dups) — at
    // 100 TB it broadcasts; the doc text itself is never shuffled twice
    // (one groupBy(gram) over hashes, one groupBy(doc) to reassemble).
    QDef("q113_boilerplate_scrub",
      (s, d) => DedupOps.boilerplateScrub(docs(s, d), "doc_id", "text",
          winTokens = 10, minDocs = 2)
        .orderBy(col("doc_id")),
      Some("""WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts FROM documents),
             |wins AS (SELECT doc_id, j, array_to_string(list_slice(ts, j*10+1, j*10+10), ' ') AS g
             |         FROM toks, UNNEST(range(0, CAST(ceil(len(ts)/10.0) AS INT))) u(j)),
             |bp AS (SELECT g FROM wins GROUP BY g HAVING count(DISTINCT doc_id) >= 2)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows,
             |CAST(sum(CASE WHEN is_bp THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
             |md5(coalesce(string_agg(CASE WHEN NOT is_bp THEN g END, ' ' ORDER BY j), '')) AS clean_md5
             |FROM (SELECT w.*, g IN (SELECT g FROM bp) AS is_bp FROM wins w)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Deterministic weighted sampling (Efraimidis–Spirakis A-ES): per-source
    // top-5 by key u^(1/w) with u a md5-derived uniform and w = n_chars —
    // char-heavy docs are proportionally likelier to be drawn, yet the
    // sample is reproducible across engines, reshardings and reruns (no
    // RNG state). Ranked via ln(u)/w (monotone in the key); one window
    // pass, no global sort.
    QDef("q117_weighted_sample",
      (s, d) => {
        val keyed = docs(s, d).withColumn("u",
            conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
              .cast("long"))
          .withColumn("k",
            log((col("u") + 0.5) / 16777216.0) / col("n_chars"))
        keyed.withColumn("rank", row_number().over(
            Window.partitionBy(col("source"))
              .orderBy(col("k").desc, col("doc_id"))))
          .filter(col("rank") <= 5)
          .select(col("source"), col("rank").cast("long").as("rank"),
            col("doc_id"), col("n_chars"))
          .orderBy(col("source"), col("rank"))
      },
      Some("""WITH keyed AS (SELECT source, doc_id, n_chars,
             |  ln((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) + 0.5)
             |     / 16777216.0) / n_chars AS k
             |  FROM documents),
             |ranked AS (SELECT *, row_number() OVER (PARTITION BY source ORDER BY k DESC, doc_id) AS rank
             |           FROM keyed)
             |SELECT source, rank, doc_id, n_chars FROM ranked
             |WHERE rank <= 5 ORDER BY source, rank""".stripMargin)),

    // P8 chunker: stateful per-row expansion — no SQL oracle (rows-only
    // driver check); invariants covered in ChunkingSpec.
    // P8 chunker, golden-parity checked (SURVEY §7.5 risk 2): the oracle is
    // a fixture parquet produced by RUNNING the reference chunker.py itself
    // over the sf0.01 corpus (tools/make_chunk_fixtures.py) — a hash match
    // here means the Scala port is bit-exact on every real document,
    // including the start_char bookkeeping and max(1, len//4) estimates.
    QDef("q19_chunks",
      (s, d) => Chunking.chunkDocumentsGen(docs(s, d), "doc_id", "text")
        .select(col("doc_id"), col("chunk_id"), col("position"),
          col("token_count"), col("start_char"), col("end_char"),
          md5(col("chunk_text")).as("chunk_md5"))
        .orderBy(col("doc_id"), col("position")),
      Some(s"""SELECT doc_id, chunk_id, position, token_count, start_char,
             |  end_char, chunk_md5
             |FROM read_parquet('${graft.Fixtures.goldenSf("chunks")}')
             |ORDER BY doc_id, position""".stripMargin)),

    // Substring-level dedup decision (Lee et al. 2021 §4): which byte
    // ranges a char-level purge would cut, keeping each repeated span's
    // globally-first occurrence. The oracle recomputes every window hash,
    // the keep-first rank, and the span merge in SQL.
    QDef("q151_substring_dedup",
      (s, d) => DedupOps.substringDedupSpans(docs(s, d), "doc_id", "text", k = 30)
        .orderBy(col("doc_id")),
      Some("""WITH pos AS (SELECT doc_id, text, unnest(range(1, length(text) - 28)) AS i
             |            FROM documents),
             |w AS (SELECT doc_id, i - 1 AS off, md5(substr(text, i, 30)) AS h FROM pos),
             |m AS (SELECT doc_id, off,
             |        row_number() OVER (PARTITION BY h ORDER BY doc_id, off) AS rn,
             |        count(*) OVER (PARTITION BY h) AS cnt FROM w),
             |d AS (SELECT doc_id, off FROM m WHERE cnt >= 2 AND rn > 1),
             |i1 AS (SELECT doc_id, off,
             |        max(off + 30) OVER (PARTITION BY doc_id ORDER BY off
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe FROM d),
             |i2 AS (SELECT doc_id, off,
             |        sum(CASE WHEN pe IS NULL OR off >= pe THEN 1 ELSE 0 END)
             |          OVER (PARTITION BY doc_id ORDER BY off) AS island FROM i1),
             |sp AS (SELECT doc_id, island, max(off) + 30 - min(off) AS len,
             |        count(*) AS nw FROM i2 GROUP BY 1, 2),
             |per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
             |        CAST(sum(len) AS BIGINT) AS chars_removed,
             |        CAST(sum(nw) AS BIGINT) AS n_dup_windows FROM sp GROUP BY 1)
             |SELECT doc.doc_id,
             |  CAST(greatest(length(doc.text) - 29, 0) AS BIGINT) AS n_windows,
             |  COALESCE(per.n_dup_windows, 0) AS n_dup_windows,
             |  COALESCE(per.n_spans, 0) AS n_spans,
             |  COALESCE(per.chars_removed, 0) AS chars_removed,
             |  CASE WHEN length(doc.text) = 0 THEN 0.0
             |       ELSE round(COALESCE(per.chars_removed, 0)
             |              / CAST(length(doc.text) AS DOUBLE), 6) END AS dup_char_frac
             |FROM documents doc LEFT JOIN per USING (doc_id)
             |ORDER BY doc.doc_id""".stripMargin)),

    // Hashed-feature linear classifier inference (the fastText-style
    // quality-filter shape): md5-low-64 token buckets, integer-exact
    // weight accumulation, sigmoid applied once per doc — the oracle
    // recomputes every bucket and the exact same closed-form score.
    QDef("q154_quality_classifier",
      (s, d) => graft.operators.QualityClassifier.score(docs(s, d), "doc_id", "text")
        .orderBy(col("doc_id")),
      Some("""WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
             |             FROM documents),
             |s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             |        CAST(sum(md5_number_lower(t) % 2001) AS BIGINT) AS w_sum
             |      FROM tok GROUP BY 1),
             |sc AS (SELECT d.doc_id,
             |         COALESCE(s.n_tokens, 0) AS n_tokens,
             |         COALESCE(s.w_sum, 0) AS w_sum,
             |         CASE WHEN COALESCE(s.n_tokens, 0) = 0 THEN 0.5
             |              ELSE round(1.0 / (1.0 + exp(-((s.w_sum - 1000 * s.n_tokens)
             |                     / (250.0 * s.n_tokens)))), 6) END AS score
             |       FROM documents d LEFT JOIN s USING (doc_id))
             |SELECT doc_id, n_tokens, w_sum, score,
             |  CAST(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END AS INT) AS keep
             |FROM sc ORDER BY doc_id""".stripMargin)),

    // Quality-weighted deterministic sampling: q117's Efraimidis-Spirakis
    // A-ES machinery with the q154 classifier score as the weight — keep
    // 5 docs per source, sampled ∝ quality. The score rides the narrow
    // classifier map (carry column), so weighting adds NO corpus join;
    // md5-derived uniforms keep the sample engine-portable.
    QDef("q207_quality_weighted_sample",
      (s, d) => {
        val scored = graft.operators.QualityClassifier
          .score(docs(s, d), "doc_id", "text", carry = Seq("source"))
        scored
          .withColumn("u",
            conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
              .cast("long"))
          .withColumn("k", log((col("u") + 0.5) / 16777216.0) / col("score"))
          .withColumn("rank", row_number().over(
            Window.partitionBy(col("source"))
              .orderBy(col("k").desc, col("doc_id"))))
          .filter(col("rank") <= 5)
          .select(col("source"), col("rank").cast("long").as("rank"),
            col("doc_id"),
            floor(col("score") * lit(1000000.0) + lit(0.5)).cast("long")
              .as("score_x1e6"))
          .orderBy(col("source"), col("rank"))
      },
      Some("""WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
             |             FROM documents),
             |s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             |        CAST(sum(md5_number_lower(t) % 2001) AS BIGINT) AS w_sum
             |      FROM tok GROUP BY 1),
             |sc AS (SELECT d.doc_id, d.source,
             |         CASE WHEN COALESCE(s.n_tokens, 0) = 0 THEN 0.5
             |              ELSE round(1.0 / (1.0 + exp(-((s.w_sum - 1000 * s.n_tokens)
             |                     / (250.0 * s.n_tokens)))), 6) END AS score
             |       FROM documents d LEFT JOIN s USING (doc_id)),
             |keyed AS (SELECT source, doc_id, score,
             |  ln((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) + 0.5)
             |     / 16777216.0) / score AS k
             |  FROM sc),
             |ranked AS (SELECT *, row_number() OVER (PARTITION BY source ORDER BY k DESC, doc_id) AS rank
             |           FROM keyed)
             |SELECT source, CAST(rank AS BIGINT) AS rank, doc_id,
             |  CAST(floor(score * 1000000.0 + 0.5) AS BIGINT) AS score_x1e6
             |FROM ranked WHERE rank <= 5 ORDER BY source, rank""".stripMargin)),

    // Temperature-scaled source mixing (the UNIMAX/PaLM α-sampling family):
    // per-source token share s_i is flattened to w_i = s_i^α / Σ s_j^α
    // (α = 0.7), and epochs_x1e4 = w_i / s_i is the implied number of
    // passes over each source at those weights — the knob that keeps
    // low-resource sources from vanishing under proportional sampling.
    // One map-side-combinable groupBy; the window runs over the
    // source-count-sized aggregate (tens of rows), never the corpus.
    QDef("q157_temperature_mix",
      (s, d) => {
        val w = Window.partitionBy()
        docs(s, d)
          .groupBy(col("source"))
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(TextFns.tokenCount(col("text"))).cast("long").as("src_tokens"))
          .withColumn("share",
            col("src_tokens").cast("double") / sum(col("src_tokens")).over(w))
          .withColumn("w_raw", pow(col("share"), 0.7))
          .withColumn("weight", col("w_raw") / sum(col("w_raw")).over(w))
          .select(col("source"), col("n_docs"), col("src_tokens"),
            floor(col("weight") * 10000.0 + 0.5).cast("long").as("weight_x1e4"),
            floor(col("weight") / col("share") * 10000.0 + 0.5).cast("long")
              .as("epochs_x1e4"))
          .orderBy(col("source"))
      },
      Some("""WITH src AS (
             |  SELECT source, count(*) AS n_docs,
             |    CAST(sum(len(regexp_extract_all(text, '[^ ]+'))) AS BIGINT)
             |      AS src_tokens
             |  FROM documents GROUP BY 1),
             |sh AS (SELECT *,
             |         src_tokens / CAST(sum(src_tokens) OVER () AS DOUBLE) AS share
             |       FROM src),
             |p AS (SELECT *, pow(share, 0.7) AS w_raw FROM sh)
             |SELECT source, n_docs, src_tokens,
             |  CAST(floor(w_raw / sum(w_raw) OVER () * 10000.0 + 0.5) AS BIGINT)
             |    AS weight_x1e4,
             |  CAST(floor(w_raw / sum(w_raw) OVER () / share * 10000.0 + 0.5)
             |    AS BIGINT) AS epochs_x1e4
             |FROM p ORDER BY source""".stripMargin)),

    // Heaps-law vocabulary growth: cumulative distinct-vocabulary size at
    // 8 equal-width checkpoints over the doc_id order, next to the
    // cumulative token count — the curve a tokenizer-budget decision
    // (vocab size vs corpus size) reads off. Each token's contribution is
    // its FIRST containing doc (one groupBy over the exploded vocab),
    // bucketed with integer arithmetic (b = first_doc·8 DIV (max+1) + 1,
    // exact in both engines); the cumulative sums run over the 8-row
    // bucket spine, never the corpus.
    QDef("q158_vocab_growth",
      (s, d) => {
        val ds = docs(s, d)
        val m = ds.agg(max(col("doc_id")).as("mx"))
        val firstDoc = ds
          .select(col("doc_id"), explode(array_distinct(
            regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))))
            .as("tok"))
          .groupBy(col("tok")).agg(min(col("doc_id")).as("first_doc"))
        val vocabB = firstDoc.crossJoin(broadcast(m))
          .select(expr("first_doc * 8 DIV (mx + 1) + 1").as("b"))
          .groupBy(col("b")).agg(count(lit(1)).cast("long").as("new_vocab"))
        val tokB = ds.crossJoin(broadcast(m))
          .select(expr("doc_id * 8 DIV (mx + 1) + 1").as("b"),
            TextFns.tokenCount(col("text")).as("occ"))
          .groupBy(col("b"))
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(col("occ")).cast("long").as("n_tokens"))
        val cum = Window.partitionBy().orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        m.select(explode(sequence(lit(1), lit(8))).as("b"))
          .join(tokB, Seq("b"), "left").join(vocabB, Seq("b"), "left")
          .select(col("b").cast("long").as("checkpoint"),
            sum(coalesce(col("n_docs"), lit(0L))).over(cum).as("cum_docs"),
            sum(coalesce(col("n_tokens"), lit(0L))).over(cum).as("cum_tokens"),
            sum(coalesce(col("new_vocab"), lit(0L))).over(cum).as("cum_vocab"))
          .orderBy(col("checkpoint"))
      },
      Some("""WITH m AS (SELECT max(doc_id) AS mx FROM documents),
             |fd AS (
             |  SELECT tok, min(doc_id) AS first_doc FROM (
             |    SELECT doc_id, unnest(list_distinct(
             |      regexp_extract_all(lower(text), '[a-z0-9]+'))) AS tok
             |    FROM documents) GROUP BY 1),
             |vb AS (SELECT first_doc * 8 // (mx + 1) + 1 AS b,
             |         CAST(count(*) AS BIGINT) AS new_vocab
             |       FROM fd, m GROUP BY 1),
             |tb AS (SELECT doc_id * 8 // (mx + 1) + 1 AS b,
             |         CAST(count(*) AS BIGINT) AS n_docs,
             |         CAST(sum(len(regexp_extract_all(text, '[^ ]+'))) AS BIGINT)
             |           AS n_tokens
             |       FROM documents, m GROUP BY 1),
             |spine AS (SELECT unnest(range(1, 9)) AS b)
             |SELECT CAST(spine.b AS BIGINT) AS checkpoint,
             |  CAST(sum(coalesce(tb.n_docs, 0)) OVER w AS BIGINT) AS cum_docs,
             |  CAST(sum(coalesce(tb.n_tokens, 0)) OVER w AS BIGINT) AS cum_tokens,
             |  CAST(sum(coalesce(vb.new_vocab, 0)) OVER w AS BIGINT) AS cum_vocab
             |FROM spine LEFT JOIN tb ON spine.b = tb.b
             |           LEFT JOIN vb ON spine.b = vb.b
             |WINDOW w AS (ORDER BY spine.b ROWS BETWEEN UNBOUNDED PRECEDING
             |             AND CURRENT ROW)
             |ORDER BY checkpoint""".stripMargin)),

    // Greedy token-budget fill: each source downsampled to 60% of its
    // tokens (integer budget = src_tokens·3 DIV 5) in deterministic
    // md5-shuffle order — the selection step that turns mixture weights
    // (q81/q157) into an actual doc subset. Per-source window, no global
    // sort; budgets broadcast.
    QDef("q161_token_budget_fill",
      (s, d) => DataSelection.budgetFill(docs(s, d), "doc_id", "text",
          "source", num = 3, den = 5)
        .orderBy(col("source")),
      Some("""WITH tok AS (SELECT source, doc_id,
             |    CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS n_tok,
             |    md5(source || '#' || CAST(doc_id AS VARCHAR)) AS ord
             |  FROM documents),
             |bud AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS src_tokens,
             |    CAST(sum(n_tok) AS BIGINT) * 3 // 5 AS budget_tokens
             |  FROM tok GROUP BY 1),
             |cum AS (SELECT source, doc_id, n_tok,
             |    sum(n_tok) OVER (PARTITION BY source ORDER BY ord, doc_id
             |      ROWS UNBOUNDED PRECEDING) AS cum
             |  FROM tok),
             |sel AS (SELECT cum.source, CAST(count(*) AS BIGINT) AS n_docs_sel,
             |    CAST(sum(cum.n_tok) AS BIGINT) AS sel_tokens
             |  FROM cum JOIN bud USING (source)
             |  WHERE cum.cum <= bud.budget_tokens GROUP BY 1)
             |SELECT bud.source, bud.src_tokens, bud.budget_tokens,
             |  COALESCE(sel.n_docs_sel, 0) AS n_docs_sel,
             |  COALESCE(sel.sel_tokens, 0) AS sel_tokens,
             |  CASE WHEN bud.budget_tokens > 0 THEN CAST(floor(
             |    COALESCE(sel.sel_tokens, 0) * 10000.0 / bud.budget_tokens
             |    + 0.5) AS BIGINT) ELSE 0 END AS fill_x1e4
             |FROM bud LEFT JOIN sel USING (source)
             |ORDER BY source""".stripMargin)),

    // Hybrid retrieval: BM25 top-30 and dense-cosine top-30 over the SAME
    // candidate set (docs that have embeddings; dense query s_i = vector
    // i-1), fused by reciprocal-rank fusion, top-10 per query. Both rank
    // lists are (queries·30)-sized, so fusion never touches the corpus;
    // BM25 keeps its broadcast inverted-index shape and the dense side its
    // broadcast-query codegen dot product.
    QDef("q162_rrf_fusion",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        val ds = docs(s, d)
        val cand = ds.join(emb.select(col("vec_id")),
          col("doc_id") === col("vec_id"), "left_semi")
        val lex = Bm25.topK(cand, "doc_id", "text", bm25Queries, k = 30)
          .select(col("query_id"), col("doc_id"), col("rank"))
        val qv = emb.filter(col("vec_id") < 3)
          .select(concat(lit("s"), (col("vec_id") + 1).cast("string"))
            .as("query_id"), col("embedding"))
        val corp = emb.join(ds.select(col("doc_id")),
          col("vec_id") === col("doc_id"), "left_semi")
        val den = Similarity.rankJoin(qv, corp, "vec_id", "embedding", k = 30)
        Similarity.rrfFuse(lex, den, k = 10)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH q(query_id, term) AS (VALUES $bm25TermValues),
             |cand AS (SELECT d.doc_id, d.text FROM documents d
             |         JOIN embeddings e ON d.doc_id = e.vec_id),
             |tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]{3,}')) AS term
             |        FROM cand),
             |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n,
             |    avg(len(regexp_extract_all(lower(text), '[a-z]{3,}'))) AS avgdl
             |  FROM cand),
             |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS doc_len FROM tok GROUP BY 1),
             |tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM tok
             |       WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY 1, 2),
             |idf AS (SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df FROM tf GROUP BY 1),
             |scored AS (SELECT q.query_id, tf.doc_id,
             |    round(sum(ln(1.0 + (stats.n - idf.df + 0.5) / (idf.df + 0.5))
             |      * (tf.tf * (1.2 + 1.0)
             |         / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.doc_len / stats.avgdl)))), 6) AS score
             |  FROM tf JOIN idf USING (term) JOIN q USING (term)
             |    JOIN dl USING (doc_id), stats
             |  GROUP BY 1, 2),
             |lex AS (SELECT query_id, doc_id, r FROM (
             |    SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id
             |      ORDER BY score DESC, doc_id) AS r FROM scored) WHERE r <= 30),
             |qv AS (SELECT 's' || CAST(vec_id + 1 AS VARCHAR) AS query_id,
             |         CAST(embedding AS DOUBLE[]) v
             |       FROM embeddings WHERE vec_id < 3),
             |ce AS (SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) v
             |       FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id),
             |den AS (SELECT query_id, doc_id, r FROM (
             |    SELECT qv.query_id, ce.vec_id AS doc_id,
             |      row_number() OVER (PARTITION BY qv.query_id ORDER BY
             |        list_dot_product(ce.v, qv.v)
             |          / (sqrt(list_dot_product(ce.v, ce.v))
             |             * sqrt(list_dot_product(qv.v, qv.v))) DESC,
             |        ce.vec_id) AS r
             |    FROM ce, qv) WHERE r <= 30),
             |fused AS (SELECT COALESCE(l.query_id, dn.query_id) AS query_id,
             |    COALESCE(l.doc_id, dn.doc_id) AS doc_id,
             |    round(COALESCE(1.0 / (60 + l.r), 0)
             |        + COALESCE(1.0 / (60 + dn.r), 0), 6) AS rrf
             |  FROM lex l FULL OUTER JOIN den dn
             |    ON l.query_id = dn.query_id AND l.doc_id = dn.doc_id)
             |SELECT query_id, rank, doc_id, rrf FROM (
             |  SELECT *, row_number() OVER (PARTITION BY query_id
             |    ORDER BY rrf DESC, doc_id) AS rank FROM fused)
             |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin)),

    // q162's fusion as the SERVING query a production RAG stack runs —
    // over the two PERSISTED layouts instead of in-memory scans: BM25
    // from the term-sharded inverted index (built on 90%, the rest
    // folded in with appendToIndex), dense from the BQ code table (90%
    // base + one streaming segment), a delete batch tombstoned out of
    // BOTH indexes, all read under Hybrid.searchIndexed's two-index
    // pinned snapshot with the cross-index delete-set union.
    // shortlist = |live| makes the dense leg exact (the q240
    // degradation), so the WHOLE lifecycle hash-checks against a
    // live-rows-only oracle: q162's BM25 CTEs over live docs, q240's
    // integer-L2² rank over live quantized vectors, q162's RRF fusion.
    QDef("q242_hybrid_indexed",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        val ds = docs(s, d)
        // cand feeds FOUR imperative index actions (BM25 build, append,
        // both delete derivations) and corp SIX (BQ build/segment, the
        // query vectors, the live count, the rerank) — cache both inside
        // the timed region so the docs⋈embeddings semi-join and the
        // quantization run once, not per action (guide §5: reuse +
        // expensive recompute). Unpersisted after the search materializes
        // (searchIndexed collects under its pins).
        val cand = ds.join(emb.select(col("vec_id")),
          col("doc_id") === col("vec_id"), "left_semi").cache()
        val delIds = cand.filter(col("doc_id") % 97 === 13)
          .select(col("doc_id"))
        val bmDir = graft.Scratch.dir("q242_bm25")
        Bm25.writeIndex(cand.filter(col("doc_id") % 10 =!= 0),
          "doc_id", "text", bmDir)
        Bm25.appendToIndex(cand.filter(col("doc_id") % 10 === 0),
          "doc_id", "text", bmDir)
        Bm25.removeFromIndex(delIds, "doc_id", bmDir)
        val corp = emb.join(ds.select(col("doc_id")),
            col("vec_id") === col("doc_id"), "left_semi")
          .select(col("vec_id"), PortableAnn.quant(col("embedding")).as("qv"))
          .cache()
        val bqDir = graft.Scratch.dir("q242_bq")
        BqIndex.writeIndex(corp.filter(col("vec_id") % 10 =!= 0),
          "vec_id", "qv", bqDir)
        BqIndex.writeSegment(corp.filter(col("vec_id") % 10 === 0),
          "vec_id", "qv", bqDir, batchId = 0L)
        BqIndex.removeFromIndex(delIds.select(col("doc_id").as("vec_id")),
          "vec_id", bqDir)
        // dense queries: s1..s3 = the quantized vectors of vec 0..2
        // (live — the delete predicate spares them), the q162 naming
        val qv = corp.filter(col("vec_id") < 3)
          .select(concat(lit("s"), (col("vec_id") + 1).cast("string"))
            .as("vec_id"), col("qv"))
        val nLive = corp.join(delIds, col("vec_id") === col("doc_id"),
          "left_anti").count().toInt
        val fused =
          try Hybrid.searchIndexed(s, bmDir, bqDir, corp, qv, bm25Queries,
            "doc_id", "vec_id", "qv", kPerSide = 30, k = 10,
            shortlist = nLive)
          finally { corp.unpersist(); cand.unpersist() }
        fused.orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH q(query_id, term) AS (VALUES $bm25TermValues),
             |cand AS (SELECT d.doc_id, d.text FROM documents d
             |         JOIN embeddings e ON d.doc_id = e.vec_id
             |         WHERE d.doc_id % 97 <> 13),
             |tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]{3,}')) AS term
             |        FROM cand),
             |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n,
             |    avg(len(regexp_extract_all(lower(text), '[a-z]{3,}'))) AS avgdl
             |  FROM cand),
             |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS doc_len FROM tok GROUP BY 1),
             |tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM tok
             |       WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY 1, 2),
             |idf AS (SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df FROM tf GROUP BY 1),
             |scored AS (SELECT q.query_id, tf.doc_id,
             |    round(sum(ln(1.0 + (stats.n - idf.df + 0.5) / (idf.df + 0.5))
             |      * (tf.tf * (1.2 + 1.0)
             |         / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.doc_len / stats.avgdl)))), 6) AS score
             |  FROM tf JOIN idf USING (term) JOIN q USING (term)
             |    JOIN dl USING (doc_id), stats
             |  GROUP BY 1, 2),
             |lex AS (SELECT query_id, doc_id, r FROM (
             |    SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id
             |      ORDER BY score DESC, doc_id) AS r FROM scored) WHERE r <= 30),
             |v AS (SELECT e.vec_id, [CAST(floor(x*1024.0 + 0.5) AS BIGINT)
             |         for x in CAST(e.embedding AS DOUBLE[])] AS qv
             |      FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
             |      WHERE e.vec_id % 97 <> 13),
             |qvq AS (SELECT 's' || CAST(vec_id + 1 AS VARCHAR) AS query_id,
             |          qv AS q FROM v WHERE vec_id < 3),
             |den AS (SELECT query_id, doc_id, r FROM (
             |    SELECT qvq.query_id, v.vec_id AS doc_id,
             |      row_number() OVER (PARTITION BY qvq.query_id ORDER BY
             |        list_sum([(v.qv[i]-qvq.q[i])*(v.qv[i]-qvq.q[i])
             |          for i in range(1, len(v.qv)+1)]),
             |        v.vec_id) AS r
             |    FROM v, qvq) WHERE r <= 30),
             |fused AS (SELECT COALESCE(l.query_id, dn.query_id) AS query_id,
             |    COALESCE(l.doc_id, dn.doc_id) AS doc_id,
             |    round(COALESCE(1.0 / (60 + l.r), 0)
             |        + COALESCE(1.0 / (60 + dn.r), 0), 6) AS rrf
             |  FROM lex l FULL OUTER JOIN den dn
             |    ON l.query_id = dn.query_id AND l.doc_id = dn.doc_id)
             |SELECT query_id, rank, doc_id, rrf FROM (
             |  SELECT *, row_number() OVER (PARTITION BY query_id
             |    ORDER BY rrf DESC, doc_id) AS rank FROM fused)
             |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin)),

    // Quality-filter attrition funnel: 5 ordered rules, per-rule drop
    // counts (the C4/Gopher "where did the corpus go" audit). Every
    // predicate is integer/string arithmetic (the distinct-ratio compare
    // is cross-multiplied) so both engines agree exactly; one corpus scan.
    QDef("q164_filter_funnel",
      (s, d) => {
        val toks = regexp_extract_all(lower(col("text")),
          lit("[a-z0-9]+"), lit(0))
        val withCounts = docs(s, d).select(col("n_chars"), col("lang"),
          size(toks).cast("long").as("n_tok"),
          size(array_distinct(toks)).cast("long").as("n_uniq"))
        Profiling.filterFunnel(withCounts, Seq(
          "min_chars" -> (col("n_chars") >= 200),
          "lang_known" -> (col("lang") =!= "zh"),
          "min_tokens" -> (col("n_tok") >= 40),
          "distinct_ratio" -> (col("n_uniq") * 100 >= col("n_tok") * 35),
          "max_chars" -> (col("n_chars") <= 500)))
      },
      Some("""WITH t AS (SELECT n_chars, lang,
             |    len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tok,
             |    len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS n_uniq
             |  FROM documents),
             |f AS (SELECT
             |    n_chars >= 200 AS p1,
             |    n_chars >= 200 AND lang <> 'zh' AS p2,
             |    n_chars >= 200 AND lang <> 'zh' AND n_tok >= 40 AS p3,
             |    n_chars >= 200 AND lang <> 'zh' AND n_tok >= 40
             |      AND n_uniq * 100 >= n_tok * 35 AS p4,
             |    n_chars >= 200 AND lang <> 'zh' AND n_tok >= 40
             |      AND n_uniq * 100 >= n_tok * 35 AND n_chars <= 500 AS p5
             |  FROM t),
             |a AS (SELECT CAST(count(*) AS BIGINT) AS n0,
             |    CAST(sum(CASE WHEN p1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             |    CAST(sum(CASE WHEN p2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             |    CAST(sum(CASE WHEN p3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
             |    CAST(sum(CASE WHEN p4 THEN 1 ELSE 0 END) AS BIGINT) AS n4,
             |    CAST(sum(CASE WHEN p5 THEN 1 ELSE 0 END) AS BIGINT) AS n5
             |  FROM f)
             |SELECT * FROM (
             |  SELECT CAST(1 AS BIGINT) AS step, 'min_chars' AS rule,
             |    n0 AS n_in, n0 - n1 AS n_drop, n1 AS n_out FROM a
             |  UNION ALL SELECT CAST(2 AS BIGINT), 'lang_known', n1, n1 - n2, n2 FROM a
             |  UNION ALL SELECT CAST(3 AS BIGINT), 'min_tokens', n2, n2 - n3, n3 FROM a
             |  UNION ALL SELECT CAST(4 AS BIGINT), 'distinct_ratio', n3, n3 - n4, n4 FROM a
             |  UNION ALL SELECT CAST(5 AS BIGINT), 'max_chars', n4, n4 - n5, n5 FROM a)
             |ORDER BY step""".stripMargin)),

    // Classifier calibration curve: q154's hashed-linear scores bucketed
    // into 10 fixed-width bins vs a deterministic proxy label — the
    // reliability diagram a quality-filter threshold decision reads off.
    // Scores are 6dp-rounded BEFORE binning (portable floor), the
    // positive rate is fixed-point x1e4; bins ride a 10-row spine so
    // empty deciles still emit.
    QDef("q165_calibration_curve",
      (s, d) => {
        val scored = graft.operators.QualityClassifier
          .score(docs(s, d), "doc_id", "text")
          .select(col("doc_id"), col("score"))
        val lab = docs(s, d).select(col("doc_id"),
          (col("n_chars") >= 300).cast("int").as("label"))
        val binned = scored.join(lab, Seq("doc_id"))
          .select(least(floor(col("score") * 10), lit(9)).cast("long")
            .as("bin"), col("score"), col("label"))
          .groupBy(col("bin"))
          .agg(count(lit(1)).cast("long").as("n"),
            round(avg(col("score")), 6).as("ms"),
            sum(col("label")).cast("long").as("np"))
        s.range(0, 10).toDF("bin").join(binned, Seq("bin"), "left")
          .select(col("bin"),
            coalesce(col("n"), lit(0L)).as("n_docs"),
            coalesce(col("ms"), lit(0.0)).as("mean_score"),
            when(coalesce(col("n"), lit(0L)) === 0, lit(0L))
              .otherwise(floor(col("np") * 10000.0 / col("n") + 0.5)
                .cast("long")).as("pos_x1e4"))
          .orderBy(col("bin"))
      },
      Some("""WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
             |             FROM documents),
             |s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             |        CAST(sum(md5_number_lower(t) % 2001) AS BIGINT) AS w_sum
             |      FROM tok GROUP BY 1),
             |sc AS (SELECT d.doc_id,
             |         CASE WHEN COALESCE(s.n_tokens, 0) = 0 THEN 0.5
             |              ELSE round(1.0 / (1.0 + exp(-((s.w_sum - 1000 * s.n_tokens)
             |                     / (250.0 * s.n_tokens)))), 6) END AS score,
             |         CASE WHEN d.n_chars >= 300 THEN 1 ELSE 0 END AS label
             |       FROM documents d LEFT JOIN s USING (doc_id)),
             |b AS (SELECT CAST(least(floor(score * 10), 9) AS BIGINT) AS bin,
             |        CAST(count(*) AS BIGINT) AS n, round(avg(score), 6) AS ms,
             |        CAST(sum(label) AS BIGINT) AS np
             |      FROM sc GROUP BY 1),
             |spine AS (SELECT unnest(range(0, 10)) AS bin)
             |SELECT CAST(spine.bin AS BIGINT) AS bin,
             |  COALESCE(b.n, 0) AS n_docs,
             |  COALESCE(b.ms, 0.0) AS mean_score,
             |  CASE WHEN COALESCE(b.n, 0) = 0 THEN 0
             |       ELSE CAST(floor(b.np * 10000.0 / b.n + 0.5) AS BIGINT)
             |  END AS pos_x1e4
             |FROM spine LEFT JOIN b ON spine.bin = b.bin
             |ORDER BY bin""".stripMargin)),

    // PMI collocation mining (Church & Hanks 1990): adjacent-pair
    // association over the corpus token stream. Everything after the two
    // count aggregations is vocabulary-sized; the scalar totals ride
    // one-row broadcast cross joins (PlanShapeSpec allowlists them).
    QDef("q175_pmi_collocations",
      (s, d) => TextMining.pmiCollocations(docs(s, d), "text", minCount = 5L)
        .orderBy(col("w1"), col("w2")),
      Some("""WITH t AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS ts FROM documents),
             |uni AS (SELECT w, count(*) AS cw
             |        FROM (SELECT unnest(ts) AS w FROM t) GROUP BY 1),
             |bi AS (SELECT split_part(g, ' ', 1) AS w1, split_part(g, ' ', 2) AS w2,
             |              count(*) AS c
             |       FROM (SELECT unnest([ts[i] || ' ' || ts[i+1]
             |                            for i in range(1, len(ts))]) AS g
             |             FROM t WHERE len(ts) >= 2)
             |       GROUP BY 1, 2),
             |tot AS (SELECT (SELECT sum(cw)::DOUBLE FROM uni) AS n,
             |               (SELECT sum(c)::DOUBLE FROM bi) AS m)
             |SELECT w1, w2, CAST(c AS BIGINT) AS pair_count,
             |       round(ln(c::DOUBLE * n * n / (m * u1.cw::DOUBLE * u2.cw::DOUBLE)), 6) AS pmi
             |FROM bi CROSS JOIN tot
             |JOIN uni u1 ON u1.w = bi.w1
             |JOIN uni u2 ON u2.w = bi.w2
             |WHERE c >= 5
             |ORDER BY w1, w2""".stripMargin)),

    // Exact phrase search: adjacent-token runs equal to the query phrase,
    // overlaps counted. The gram stream is broadcast-filtered to phrase
    // matches BEFORE the only shuffle; one narrow pass per phrase length.
    QDef("q176_phrase_search",
      (s, d) => TextMining.phraseOccurrences(docs(s, d), "doc_id", "text",
          Seq("hash join", "sort merge", "sort merge join", "the fast table"))
        .orderBy(col("phrase"), col("doc_id")),
      Some("""WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts FROM documents),
             |g2 AS (SELECT doc_id, unnest([ts[i] || ' ' || ts[i+1]
             |                              for i in range(1, len(ts))]) AS g
             |       FROM t WHERE len(ts) >= 2),
             |g3 AS (SELECT doc_id, unnest([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
             |                              for i in range(1, len(ts) - 1)]) AS g
             |       FROM t WHERE len(ts) >= 3),
             |ph(phrase, g) AS (VALUES ('hash join', 'hash join'),
             |                         ('sort merge', 'sort merge'),
             |                         ('sort merge join', 'sort merge join'),
             |                         ('the fast table', 'the fast table')),
             |u AS (SELECT * FROM g2 UNION ALL SELECT * FROM g3)
             |SELECT doc_id, phrase, CAST(count(*) AS BIGINT) AS occurrences
             |FROM u JOIN ph USING (g)
             |GROUP BY 1, 2 ORDER BY phrase, doc_id""".stripMargin)),

    // Per-document novelty in corpus order: the fraction of each doc's
    // distinct 3-gram shingles first introduced BY that doc — the
    // dedup-aware selection signal; q158's Heaps curve is its integral.
    QDef("q177_novelty_profile",
      (s, d) => TextMining.noveltyProfile(docs(s, d), "doc_id", "text", n = 3)
        .orderBy(col("doc_id")),
      Some("""WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts FROM documents),
             |sh AS (SELECT doc_id, unnest(list_distinct(
             |         [ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
             |          for i in range(1, greatest(len(ts) - 1, 1))])) AS s
             |       FROM t),
             |f AS (SELECT s, min(doc_id) AS first_doc FROM sh GROUP BY 1)
             |SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
             |       CAST(sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
             |       round(sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END)::DOUBLE
             |             / count(*)::DOUBLE, 6) AS novelty
             |FROM sh JOIN f USING (s)
             |GROUP BY 1 ORDER BY doc_id""".stripMargin)),

    // Greedy no-split sequence packing into 96-token context windows over
    // 8 md5 shards: per-shard window count, oversize docs, packed tokens,
    // padding burn and fill rate — the packing-efficiency audit between
    // selection and tensorization. Packing is sequential per shard (the
    // honest dependency), distributed across shards; the oracle replays
    // the same greedy rule one doc per step in a recursive CTE.
    QDef("q184_sequence_packing",
      (s, d) => DataSelection.packingStats(docs(s, d), "doc_id", "text",
          budget = 96L, nShards = 8)
        .orderBy(col("shard")),
      Some(packOracle96)),

    // The SAME packing semantics through the custom Catalyst operator
    // (plans/Packing.scala: PackPlan → PackStrategy → PackExec, whose
    // required child distribution/ordering make EnsureRequirements plan
    // the shuffle+sort) — q184's oracle verbatim, so the driver gate
    // proves the custom node agrees with both the mapPartitions twin and
    // DuckDB. Self-installs the strategy on the session.
    QDef("q192_packing_exec",
      (s, d) => {
        graft.GraftExtensions.install(s)
        DataSelection.packStats(
            graft.plans.Packing.packSequences(docs(s, d), "doc_id", "text",
              budget = 96L, nShards = 8),
            budget = 96L)
          .orderBy(col("shard"))
      },
      Some(packOracle96)),

    // Contamination-aware packing: excise benchmark spans FIRST (q201's
    // applied path — the cleaned token counts come out of the real
    // excision operator), then greedily pack the cleaned stream with
    // q184's rule. The oracle derives each doc's kept count as
    // n_tokens − tokens_removed from the span stats (proven equal to the
    // excision output by the stats-telescoping spec) and replays the
    // same recursive greedy walk.
    QDef("q208_clean_pack_spine",
      (s, d) => {
        val cleaned = DedupOps.exciseContamination(docs(s, d), "doc_id",
          "text", 4, col("doc_id") % 97 === 0)
        val h = md5(col("doc_id").cast("string"))
        val tok = cleaned.select(
          (conv(substring(h, 1, 4), 16, 10).cast("int") % 8)
            .cast("long").as("shard"),
          h.as("ord"), col("doc_id").cast("long").as("id"),
          col("n_tokens_kept").as("nTok"))
        DataSelection.packStats(DataSelection.packScan(tok, 96L), 96L)
          .orderBy(col("shard"))
      },
      Some("""WITH RECURSIVE toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
             |pg AS (SELECT doc_id, i AS pos, array_to_string(list_slice(t, i, i + 3), ' ') AS g
             |       FROM toks, UNNEST(range(1, len(t) - 2)) AS u(i)),
             |bench AS (SELECT DISTINCT g FROM pg WHERE doc_id % 97 = 0),
             |mk AS (SELECT pg.doc_id, pg.pos FROM pg JOIN bench USING (g) WHERE pg.doc_id % 97 <> 0),
             |isl AS (SELECT doc_id, pos, CASE WHEN pe IS NULL OR pos >= pe THEN 1 ELSE 0 END AS ni
             |        FROM (SELECT doc_id, pos, max(pos + 4) OVER (PARTITION BY doc_id ORDER BY pos
             |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe FROM mk)),
             |g2 AS (SELECT doc_id, pos, sum(ni) OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM isl),
             |sp AS (SELECT doc_id, island, max(pos) + 4 - min(pos) AS len FROM g2 GROUP BY 1, 2),
             |ag AS (SELECT doc_id, CAST(sum(len) AS BIGINT) AS removed FROM sp GROUP BY 1),
             |t2 AS (SELECT d.doc_id, md5(CAST(d.doc_id AS VARCHAR)) AS h,
             |         CAST(len(d.t) - coalesce(a.removed, 0) AS BIGINT) AS n_tok
             |       FROM toks d LEFT JOIN ag a USING (doc_id)
             |       WHERE d.doc_id % 97 <> 0),
             |s AS (SELECT doc_id, n_tok,
             |    CAST(CAST(('0x' || substr(h, 1, 4)) AS INTEGER) % 8 AS BIGINT) AS shard,
             |    CAST(row_number() OVER (
             |      PARTITION BY CAST(('0x' || substr(h, 1, 4)) AS INTEGER) % 8
             |      ORDER BY h, doc_id) AS BIGINT) AS rn
             |  FROM t2),
             |walk(shard, rn, bin, fill, n_tok, over) AS (
             |  SELECT DISTINCT shard, CAST(0 AS BIGINT), CAST(-1 AS BIGINT),
             |      CAST(0 AS BIGINT), CAST(0 AS BIGINT), FALSE
             |    FROM s
             |  UNION ALL
             |  SELECT s.shard, s.rn,
             |    CASE WHEN s.n_tok > 96 THEN w.bin
             |         WHEN w.bin < 0 OR w.fill + s.n_tok > 96 THEN w.bin + 1
             |         ELSE w.bin END,
             |    CASE WHEN s.n_tok > 96 THEN w.fill
             |         WHEN w.bin < 0 OR w.fill + s.n_tok > 96 THEN s.n_tok
             |         ELSE w.fill + s.n_tok END,
             |    s.n_tok, s.n_tok > 96
             |  FROM walk w JOIN s ON s.shard = w.shard AND s.rn = w.rn + 1)
             |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(count(*) FILTER (WHERE over) AS BIGINT) AS n_oversize,
             |  CAST(greatest(max(bin), -1) + 1 AS BIGINT) AS n_bins,
             |  CAST(COALESCE(sum(n_tok) FILTER (WHERE NOT over), 0) AS BIGINT)
             |    AS packed_tokens,
             |  CAST((greatest(max(bin), -1) + 1) * 96
             |    - COALESCE(sum(n_tok) FILTER (WHERE NOT over), 0) AS BIGINT)
             |    AS padding_tokens,
             |  CASE WHEN max(bin) >= 0 THEN CAST(floor(
             |      COALESCE(sum(n_tok) FILTER (WHERE NOT over), 0) * 10000.0
             |      / ((max(bin) + 1) * 96) + 0.5) AS BIGINT)
             |    ELSE 0 END AS fill_x1e4
             |FROM walk WHERE rn >= 1
             |GROUP BY shard ORDER BY shard""".stripMargin)),

    // Filter-threshold operating curve: q154's classifier swept across 9
    // keep thresholds against the q165 proxy label — confusion counts +
    // precision/recall (fixed-point ×10⁴), the third standard view next
    // to the calibration curve (q165) and threshold-free AUC (q187).
    // ONE scoring pass; the 9-row threshold spine broadcasts onto it and
    // the confusion matrix is one grouped aggregate.
    QDef("q193_threshold_sweep",
      (s, d) => {
        val sc = graft.operators.QualityClassifier
          .score(docs(s, d), "doc_id", "text")
          .join(docs(s, d).select(col("doc_id"),
            (col("n_chars") >= 300).cast("long").as("label")), Seq("doc_id"))
        val spine = s.range(1, 10).toDF("t10")
        sc.crossJoin(broadcast(spine))
          .withColumn("pred",
            (col("score") >= col("t10").cast("double") / 10.0).cast("long"))
          .groupBy(col("t10"))
          .agg(sum(when(col("pred") === 1L && col("label") === 1L, 1L)
              .otherwise(0L)).cast("long").as("tp"),
            sum(when(col("pred") === 1L && col("label") === 0L, 1L)
              .otherwise(0L)).cast("long").as("fp"),
            sum(when(col("pred") === 0L && col("label") === 1L, 1L)
              .otherwise(0L)).cast("long").as("fn"),
            sum(col("pred")).cast("long").as("n_kept"))
          .withColumn("precision_x1e4",
            when(col("tp") + col("fp") > 0L,
              floor(col("tp") * lit(10000.0) / (col("tp") + col("fp"))
                + lit(0.5)).cast("long")).otherwise(lit(0L)))
          .withColumn("recall_x1e4",
            when(col("tp") + col("fn") > 0L,
              floor(col("tp") * lit(10000.0) / (col("tp") + col("fn"))
                + lit(0.5)).cast("long")).otherwise(lit(0L)))
          .orderBy(col("t10"))
      },
      Some("""WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
             |             FROM documents),
             |s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             |        CAST(sum(md5_number_lower(t) % 2001) AS BIGINT) AS w_sum
             |      FROM tok GROUP BY 1),
             |sc AS (SELECT d.doc_id,
             |         CASE WHEN COALESCE(s.n_tokens, 0) = 0 THEN 0.5
             |              ELSE round(1.0 / (1.0 + exp(-((s.w_sum - 1000 * s.n_tokens)
             |                     / (250.0 * s.n_tokens)))), 6) END AS score,
             |         CASE WHEN d.n_chars >= 300 THEN 1 ELSE 0 END AS label
             |       FROM documents d LEFT JOIN s USING (doc_id)),
             |g AS (SELECT t.t10,
             |        CAST(sum(CASE WHEN score >= t.t10 / 10.0 AND label = 1
             |                 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             |        CAST(sum(CASE WHEN score >= t.t10 / 10.0 AND label = 0
             |                 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             |        CAST(sum(CASE WHEN score < t.t10 / 10.0 AND label = 1
             |                 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
             |        CAST(sum(CASE WHEN score >= t.t10 / 10.0
             |                 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
             |      FROM sc, (SELECT unnest(range(1, 10)) AS t10) t
             |      GROUP BY 1)
             |SELECT CAST(t10 AS BIGINT) AS t10, tp, fp, fn, n_kept,
             |  CASE WHEN tp + fp > 0 THEN CAST(floor(
             |      tp * 10000.0 / (tp + fp) + 0.5) AS BIGINT) ELSE 0 END
             |    AS precision_x1e4,
             |  CASE WHEN tp + fn > 0 THEN CAST(floor(
             |      tp * 10000.0 / (tp + fn) + 0.5) AS BIGINT) ELSE 0 END
             |    AS recall_x1e4
             |FROM g ORDER BY t10""".stripMargin)),

    // Exact average precision (PR-AUC, step form): every positive
    // contributes the precision at its own score level — the
    // imbalance-robust complement of q187's ROC-AUC, from the SAME
    // distinct-score histogram machinery (descending two-pass prefix
    // sums, no corpus sort).
    QDef("q195_average_precision",
      (s, d) => {
        val sc = graft.operators.QualityClassifier
          .score(docs(s, d), "doc_id", "text")
        val lab = docs(s, d).select(col("doc_id"),
          (col("n_chars") >= 300).cast("int").as("label"))
        graft.operators.QualityClassifier
          .averagePrecision(sc, "doc_id", lab, "label")
      },
      Some("""WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
             |             FROM documents),
             |s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             |        CAST(sum(md5_number_lower(t) % 2001) AS BIGINT) AS w_sum
             |      FROM tok GROUP BY 1),
             |sc AS (SELECT d.doc_id,
             |         CASE WHEN COALESCE(s.n_tokens, 0) = 0 THEN 0.5
             |              ELSE round(1.0 / (1.0 + exp(-((s.w_sum - 1000 * s.n_tokens)
             |                     / (250.0 * s.n_tokens)))), 6) END AS score,
             |         CASE WHEN d.n_chars >= 300 THEN 1 ELSE 0 END AS label
             |       FROM documents d LEFT JOIN s USING (doc_id)),
             |g AS (SELECT CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS sk,
             |        CAST(sum(label) AS BIGINT) AS np,
             |        CAST(count(*) - sum(label) AS BIGINT) AS nn
             |      FROM sc GROUP BY 1),
             |c AS (SELECT sk, np, nn,
             |        sum(np) OVER w AS cum_np,
             |        sum(np + nn) OVER w AS cum_all
             |      FROM g
             |      WINDOW w AS (ORDER BY sk DESC ROWS UNBOUNDED PRECEDING))
             |SELECT CAST(sum(np) AS BIGINT) AS n_pos,
             |  CAST(sum(nn) AS BIGINT) AS n_neg,
             |  CASE WHEN sum(np) > 0
             |    THEN round(sum(np * (cum_np / CAST(cum_all AS DOUBLE)))
             |           / sum(np), 6)
             |    ELSE 0.0 END AS ap
             |FROM c""".stripMargin)),

    // The modern pretraining-prep spine in ONE query: keep the best 25%
    // by classifier score (q188's exact order statistic), stride-interleave
    // the survivors into a uniform training order (q189), and greedily
    // pack that ORDER into 96-token windows per interleave shard (q184's
    // scan, with the virtual time as the order key). Per-shard packing
    // stats out. Every stage is the proven operator — the composition is
    // what a real tensorization-prep job runs nightly.
    QDef("q196_pretrain_spine",
      (s, d) => {
        val ds = docs(s, d)
        val sc = graft.operators.QualityClassifier
          .score(ds, "doc_id", "text")
        val sel = DataSelection.topFractionByScore(sc, "doc_id", 1, 4)
        val selDocs = ds.join(sel.select(col("doc_id")), Seq("doc_id"),
          "left_semi")
        val ord = DataSelection.stratifiedInterleave(selDocs, "doc_id",
          "source", nShards = 8)
        val tok = ord
          .join(ds.select(col("doc_id"),
            TextFns.tokenCount(col("text")).as("nTok")), Seq("doc_id"))
          .select(col("shard"),
            lpad(floor(col("vt") * lit(1000000000000.0)).cast("long")
              .cast("string"), 13, "0").as("ord"),
            col("doc_id").as("id"), col("nTok"))
        DataSelection.packStats(DataSelection.packScan(tok, 96L), 96L)
          .orderBy(col("shard"))
      },
      Some("""WITH RECURSIVE tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
             |             FROM documents),
             |st AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             |        CAST(sum(md5_number_lower(t) % 2001) AS BIGINT) AS w_sum
             |      FROM tok GROUP BY 1),
             |sc AS (SELECT d.doc_id, d.source,
             |         CAST(len(regexp_extract_all(d.text, '[^ ]+')) AS BIGINT) AS n_tok,
             |         CASE WHEN COALESCE(st.n_tokens, 0) = 0 THEN 0.5
             |              ELSE round(1.0 / (1.0 + exp(-((st.w_sum - 1000 * st.n_tokens)
             |                     / (250.0 * st.n_tokens)))), 6) END AS score
             |       FROM documents d LEFT JOIN st USING (doc_id)),
             |f AS (SELECT doc_id, source, n_tok,
             |        CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS skv
             |      FROM sc),
             |r AS (SELECT *, row_number() OVER (ORDER BY skv DESC,
             |        md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk FROM f),
             |sel AS (SELECT doc_id, source, n_tok FROM r
             |        WHERE rnk <= (SELECT count(*) FROM f) // 4),
             |n AS (SELECT source, count(*) AS ns FROM sel GROUP BY 1),
             |rk AS (SELECT doc_id, sel.source, n_tok, row_number() OVER (
             |        PARTITION BY sel.source
             |        ORDER BY md5('1#' || CAST(doc_id AS VARCHAR)), doc_id) AS rkk
             |      FROM sel),
             |t2 AS (SELECT doc_id, n_tok, rkk / CAST(ns AS DOUBLE) AS vt
             |       FROM rk JOIN n USING (source)),
             |s2 AS (SELECT doc_id, n_tok,
             |        CAST(least(floor(vt * 8), 7) AS BIGINT) AS shard,
             |        lpad(CAST(CAST(floor(vt * 1000000000000) AS BIGINT)
             |          AS VARCHAR), 13, '0') AS ord
             |      FROM t2),
             |s3 AS (SELECT doc_id, n_tok, shard,
             |        CAST(row_number() OVER (PARTITION BY shard
             |          ORDER BY ord, doc_id) AS BIGINT) AS rn
             |      FROM s2),
             |walk(shard, rn, bin, fill, n_tok, over) AS (
             |  SELECT DISTINCT shard, CAST(0 AS BIGINT), CAST(-1 AS BIGINT),
             |      CAST(0 AS BIGINT), CAST(0 AS BIGINT), FALSE
             |    FROM s3
             |  UNION ALL
             |  SELECT s3.shard, s3.rn,
             |    CASE WHEN s3.n_tok > 96 THEN w.bin
             |         WHEN w.bin < 0 OR w.fill + s3.n_tok > 96 THEN w.bin + 1
             |         ELSE w.bin END,
             |    CASE WHEN s3.n_tok > 96 THEN w.fill
             |         WHEN w.bin < 0 OR w.fill + s3.n_tok > 96 THEN s3.n_tok
             |         ELSE w.fill + s3.n_tok END,
             |    s3.n_tok, s3.n_tok > 96
             |  FROM walk w JOIN s3 ON s3.shard = w.shard AND s3.rn = w.rn + 1)
             |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(count(*) FILTER (WHERE over) AS BIGINT) AS n_oversize,
             |  CAST(greatest(max(bin), -1) + 1 AS BIGINT) AS n_bins,
             |  CAST(COALESCE(sum(n_tok) FILTER (WHERE NOT over), 0) AS BIGINT)
             |    AS packed_tokens,
             |  CAST((greatest(max(bin), -1) + 1) * 96
             |    - COALESCE(sum(n_tok) FILTER (WHERE NOT over), 0) AS BIGINT)
             |    AS padding_tokens,
             |  CASE WHEN max(bin) >= 0 THEN CAST(floor(
             |      COALESCE(sum(n_tok) FILTER (WHERE NOT over), 0) * 10000.0
             |      / ((max(bin) + 1) * 96) + 0.5) AS BIGINT)
             |    ELSE 0 END AS fill_x1e4
             |FROM walk WHERE rn >= 1
             |GROUP BY shard ORDER BY shard""".stripMargin))
  ) ++ defsTail

  private lazy val packOracle96: String =
    """WITH RECURSIVE t AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
             |    CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS n_tok
             |  FROM documents),
             |s AS (SELECT doc_id, n_tok,
             |    CAST(CAST(('0x' || substr(h, 1, 4)) AS INTEGER) % 8 AS BIGINT) AS shard,
             |    CAST(row_number() OVER (
             |      PARTITION BY CAST(('0x' || substr(h, 1, 4)) AS INTEGER) % 8
             |      ORDER BY h, doc_id) AS BIGINT) AS rn
             |  FROM t),
             |walk(shard, rn, bin, fill, n_tok, over) AS (
             |  SELECT DISTINCT shard, CAST(0 AS BIGINT), CAST(-1 AS BIGINT),
             |      CAST(0 AS BIGINT), CAST(0 AS BIGINT), FALSE
             |    FROM s
             |  UNION ALL
             |  SELECT s.shard, s.rn,
             |    CASE WHEN s.n_tok > 96 THEN w.bin
             |         WHEN w.bin < 0 OR w.fill + s.n_tok > 96 THEN w.bin + 1
             |         ELSE w.bin END,
             |    CASE WHEN s.n_tok > 96 THEN w.fill
             |         WHEN w.bin < 0 OR w.fill + s.n_tok > 96 THEN s.n_tok
             |         ELSE w.fill + s.n_tok END,
             |    s.n_tok, s.n_tok > 96
             |  FROM walk w JOIN s ON s.shard = w.shard AND s.rn = w.rn + 1)
             |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(count(*) FILTER (WHERE over) AS BIGINT) AS n_oversize,
             |  CAST(greatest(max(bin), -1) + 1 AS BIGINT) AS n_bins,
             |  CAST(COALESCE(sum(n_tok) FILTER (WHERE NOT over), 0) AS BIGINT)
             |    AS packed_tokens,
             |  CAST((greatest(max(bin), -1) + 1) * 96
             |    - COALESCE(sum(n_tok) FILTER (WHERE NOT over), 0) AS BIGINT)
             |    AS padding_tokens,
             |  CASE WHEN max(bin) >= 0 THEN CAST(floor(
             |      COALESCE(sum(n_tok) FILTER (WHERE NOT over), 0) * 10000.0
             |      / ((max(bin) + 1) * 96) + 0.5) AS BIGINT)
             |    ELSE 0 END AS fill_x1e4
             |FROM walk WHERE rn >= 1
             |GROUP BY shard ORDER BY shard""".stripMargin

  private lazy val defsTail: Seq[QDef] = Seq(

    // Concat-and-cut packing audit (q184's counterpart discipline): docs
    // concatenated in shard order, windows cut every 96 tokens — zero
    // padding except the shard tail, but boundary-straddling docs need
    // cross-doc attention masking. The window id IS the running sum div
    // budget, so this is pure window math: one keyed shuffle, no
    // sequential scan anywhere.
    QDef("q186_concat_packing",
      (s, d) => DataSelection.concatPackStats(docs(s, d), "doc_id", "text",
          budget = 96L, nShards = 8)
        .orderBy(col("shard")),
      Some("""WITH t AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
             |    CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS n_tok
             |  FROM documents),
             |s AS (SELECT doc_id, n_tok, h,
             |    CAST(CAST(('0x' || substr(h, 1, 4)) AS INTEGER) % 8 AS BIGINT) AS shard
             |  FROM t),
             |c AS (SELECT shard, n_tok,
             |    sum(n_tok) OVER (PARTITION BY shard ORDER BY h, doc_id
             |      ROWS UNBOUNDED PRECEDING) AS cum
             |  FROM s),
             |a AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(sum(n_tok) AS BIGINT) AS total_tokens,
             |    CAST(count(*) FILTER (WHERE n_tok > 0
             |      AND (cum - n_tok) // 96 <> (cum - 1) // 96) AS BIGINT)
             |      AS n_boundary_docs
             |  FROM c GROUP BY 1)
             |SELECT shard, n_docs, total_tokens, n_boundary_docs,
             |  (total_tokens + 95) // 96 AS n_bins,
             |  (total_tokens + 95) // 96 * 96 - total_tokens AS tail_padding
             |FROM a ORDER BY shard""".stripMargin)),

    // Exact ROC-AUC of the q154 hashed-linear classifier against the q165
    // proxy label — tie-corrected Mann–Whitney rank-sum. One corpus
    // groupBy(distinct fixed-point score); the cumulative runs over the
    // distinct-score table through the two-pass prefix sum (q67's shape),
    // so no corpus-wide sort or SinglePartition window exists.
    QDef("q187_classifier_auc",
      (s, d) => {
        val sc = graft.operators.QualityClassifier
          .score(docs(s, d), "doc_id", "text")
        val lab = docs(s, d).select(col("doc_id"),
          (col("n_chars") >= 300).cast("int").as("label"))
        graft.operators.QualityClassifier.auc(sc, "doc_id", lab, "label")
      },
      Some("""WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
             |             FROM documents),
             |s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             |        CAST(sum(md5_number_lower(t) % 2001) AS BIGINT) AS w_sum
             |      FROM tok GROUP BY 1),
             |sc AS (SELECT d.doc_id,
             |         CASE WHEN COALESCE(s.n_tokens, 0) = 0 THEN 0.5
             |              ELSE round(1.0 / (1.0 + exp(-((s.w_sum - 1000 * s.n_tokens)
             |                     / (250.0 * s.n_tokens)))), 6) END AS score,
             |         CASE WHEN d.n_chars >= 300 THEN 1 ELSE 0 END AS label
             |       FROM documents d LEFT JOIN s USING (doc_id)),
             |g AS (SELECT CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS sk,
             |        CAST(sum(label) AS BIGINT) AS np,
             |        CAST(count(*) - sum(label) AS BIGINT) AS nn
             |      FROM sc GROUP BY 1),
             |c AS (SELECT sk, np, nn,
             |        sum(nn) OVER (ORDER BY sk ROWS UNBOUNDED PRECEDING) AS cum
             |      FROM g)
             |SELECT CAST(sum(np) AS BIGINT) AS n_pos,
             |  CAST(sum(nn) AS BIGINT) AS n_neg,
             |  CAST(COALESCE(sum(np * (2 * (cum - nn) + nn)), 0) AS BIGINT) AS u2,
             |  CASE WHEN sum(np) > 0 AND sum(nn) > 0
             |    THEN round(CAST(sum(np * (2 * (cum - nn) + nn)) AS DOUBLE)
             |           / (2.0 * sum(np) * sum(nn)), 6)
             |    ELSE 0.0 END AS auc
             |FROM c""".stripMargin)),

    // Exact "keep the best 25% by quality score" — global order statistic
    // without a global sort: fixed-point score histogram + descending
    // prefix sum give the exact threshold; boundary ties break by md5(id)
    // so the selected SET is engine-portable. Only the tie group passes
    // through a rank window. Oracle: the O(N log N) global row_number
    // form this operator refuses to plan.
    QDef("q188_top_fraction",
      (s, d) => {
        val sc = graft.operators.QualityClassifier
          .score(docs(s, d), "doc_id", "text")
        val sel = DataSelection.topFractionByScore(sc, "doc_id", 1, 4)
        sel.join(docs(s, d).select(col("doc_id"), col("source")),
            Seq("doc_id"))
          .groupBy(col("source"))
          .agg(count(lit(1)).cast("long").as("n_sel"),
            min(floor(col("score") * 1000000.0 + 0.5).cast("long"))
              .as("min_score_x1e6"))
          .orderBy(col("source"))
      },
      Some("""WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
             |             FROM documents),
             |s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             |        CAST(sum(md5_number_lower(t) % 2001) AS BIGINT) AS w_sum
             |      FROM tok GROUP BY 1),
             |sc AS (SELECT d.doc_id, d.source,
             |         CASE WHEN COALESCE(s.n_tokens, 0) = 0 THEN 0.5
             |              ELSE round(1.0 / (1.0 + exp(-((s.w_sum - 1000 * s.n_tokens)
             |                     / (250.0 * s.n_tokens)))), 6) END AS score
             |       FROM documents d LEFT JOIN s USING (doc_id)),
             |f AS (SELECT doc_id, source,
             |        CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS sk
             |      FROM sc),
             |r AS (SELECT *, row_number() OVER (ORDER BY sk DESC,
             |        md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn FROM f),
             |sel AS (SELECT * FROM r
             |        WHERE rn <= (SELECT count(*) FROM f) * 1 // 4)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_sel,
             |  CAST(min(sk) AS BIGINT) AS min_score_x1e6
             |FROM sel GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Stride-scheduled source interleave: the final ordering step of the
    // mixture family — every source spread uniformly through the training
    // order (virtual time r/N_src), shards = virtual-time slices. Per
    // (shard, source) doc counts pin the uniformity (each within 1 of
    // N_src/8 by the stride property). One source-keyed window; the order
    // is a computed column, never a global sort.
    QDef("q189_interleaved_order",
      (s, d) => DataSelection
        .stratifiedInterleave(docs(s, d), "doc_id", "source", nShards = 8)
        .groupBy(col("shard"), col("source"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          round(min(col("vt")), 6).as("first_vt"))
        .orderBy(col("shard"), col("source")),
      Some("""WITH n AS (SELECT source, count(*) AS ns FROM documents GROUP BY 1),
             |r AS (SELECT doc_id, source, row_number() OVER (PARTITION BY source
             |        ORDER BY md5('1#' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
             |      FROM documents),
             |t AS (SELECT doc_id, r.source, rk / CAST(ns AS DOUBLE) AS vt
             |      FROM r JOIN n USING (source))
             |SELECT CAST(least(floor(vt * 8), 7) AS BIGINT) AS shard, source,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  round(min(vt), 6) AS first_vt
             |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Chunk-then-pack (q184 completed): docs over the 64-token budget are
    // split into deterministic token-window pieces first, so NOTHING is
    // left oversize; pieces keep their doc's shuffle position and pack as
    // consecutive runs. Same greedy scan, same recursive-CTE oracle shape
    // with a piece-explosion front.
    QDef("q190_chunked_packing",
      (s, d) => DataSelection.packWithChunking(docs(s, d), "doc_id", "text",
          budget = 64L, nShards = 8)
        .orderBy(col("shard")),
      Some("""WITH RECURSIVE t AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
             |    CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS n_tok
             |  FROM documents),
             |p AS (SELECT doc_id, h, CAST(u.i AS BIGINT) AS piece,
             |    greatest(least(64, n_tok - 64 * u.i), 0) AS piece_tok
             |  FROM t, UNNEST(range(0, (greatest(n_tok, 1) - 1) // 64 + 1)) AS u(i)),
             |s AS (SELECT doc_id, piece, piece_tok AS n_tok,
             |    CAST(CAST(('0x' || substr(h, 1, 4)) AS INTEGER) % 8 AS BIGINT) AS shard,
             |    h || '#' || lpad(CAST(piece AS VARCHAR), 4, '0') AS ord
             |  FROM p),
             |s2 AS (SELECT *, CAST(row_number() OVER (
             |    PARTITION BY shard ORDER BY ord) AS BIGINT) AS rn FROM s),
             |walk(shard, rn, bin, fill, n_tok, piece, doc_id) AS (
             |  SELECT DISTINCT shard, CAST(0 AS BIGINT), CAST(-1 AS BIGINT),
             |      CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
             |      CAST(NULL AS BIGINT)
             |    FROM s2
             |  UNION ALL
             |  SELECT s2.shard, s2.rn,
             |    CASE WHEN w.bin < 0 OR w.fill + s2.n_tok > 64
             |         THEN w.bin + 1 ELSE w.bin END,
             |    CASE WHEN w.bin < 0 OR w.fill + s2.n_tok > 64
             |         THEN s2.n_tok ELSE w.fill + s2.n_tok END,
             |    s2.n_tok, s2.piece, s2.doc_id
             |  FROM walk w JOIN s2 ON s2.shard = w.shard AND s2.rn = w.rn + 1)
             |SELECT shard, CAST(count(*) AS BIGINT) AS n_pieces,
             |  CAST(count(DISTINCT doc_id) FILTER (WHERE piece > 0) AS BIGINT)
             |    AS n_split_docs,
             |  CAST(greatest(max(bin), -1) + 1 AS BIGINT) AS n_bins,
             |  CAST(COALESCE(sum(n_tok), 0) AS BIGINT) AS packed_tokens,
             |  CAST((greatest(max(bin), -1) + 1) * 64 - COALESCE(sum(n_tok), 0)
             |    AS BIGINT) AS padding_tokens,
             |  CASE WHEN max(bin) >= 0 THEN CAST(floor(
             |      COALESCE(sum(n_tok), 0) * 10000.0 / ((max(bin) + 1) * 64)
             |      + 0.5) AS BIGINT)
             |    ELSE 0 END AS fill_x1e4
             |FROM walk WHERE rn >= 1
             |GROUP BY shard ORDER BY shard""".stripMargin)),

    // Packing-budget tuning curve: the q184 greedy rule at four candidate
    // context budgets in ONE corpus scan (per-budget state advances in
    // lockstep down the same shard order) — padding burn vs context
    // length, the evidence for choosing a training sequence length.
    QDef("q191_packing_sweep",
      (s, d) => DataSelection.packingSweep(docs(s, d), "doc_id", "text",
          budgets = Seq(32L, 64L, 96L, 128L), nShards = 8)
        .orderBy(col("budget")),
      Some(packSweepOracleSql(Seq(32L, 64L, 96L, 128L))))
  )

  /** The q184 recursive greedy walk carrying one (bin, fill) state pair
    * per swept budget — the oracle for q191. Mechanical expansion of the
    * single-budget form.
    */
  private def packSweepOracleSql(budgets: Seq[Long]): String = {
    val bs = budgets.distinct.sorted
    val stateCols = bs.map(b => s"b$b, f$b").mkString(", ")
    val baseState = bs.map(_ =>
      "CAST(-1 AS BIGINT), CAST(0 AS BIGINT)").mkString(", ")
    val stepState = bs.map { b =>
      s"""    CASE WHEN s.n_tok > $b THEN w.b$b
         |         WHEN w.b$b < 0 OR w.f$b + s.n_tok > $b THEN w.b$b + 1
         |         ELSE w.b$b END,
         |    CASE WHEN s.n_tok > $b THEN w.f$b
         |         WHEN w.b$b < 0 OR w.f$b + s.n_tok > $b THEN s.n_tok
         |         ELSE w.f$b + s.n_tok END""".stripMargin
    }.mkString(",\n")
    val perCols = bs.map { b =>
      s"""    greatest(max(b$b), -1) + 1 AS bins$b,
         |    COALESCE(sum(n_tok) FILTER (WHERE n_tok <= $b), 0) AS packed$b,
         |    count(*) FILTER (WHERE n_tok > $b) AS over$b""".stripMargin
    }.mkString(",\n")
    val unions = bs.map { b =>
      s"""  SELECT CAST($b AS BIGINT) AS budget,
         |    CAST(sum(bins$b) AS BIGINT) AS n_bins,
         |    CAST(sum(over$b) AS BIGINT) AS n_oversize,
         |    CAST(sum(packed$b) AS BIGINT) AS packed_tokens,
         |    CAST(sum(bins$b) * $b - sum(packed$b) AS BIGINT) AS padding_tokens,
         |    CASE WHEN sum(bins$b) > 0 THEN CAST(floor(
         |        sum(packed$b) * 10000.0 / (sum(bins$b) * $b) + 0.5) AS BIGINT)
         |      ELSE 0 END AS fill_x1e4
         |  FROM per""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH RECURSIVE t AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
       |    CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS n_tok
       |  FROM documents),
       |s AS (SELECT doc_id, n_tok,
       |    CAST(CAST(('0x' || substr(h, 1, 4)) AS INTEGER) % 8 AS BIGINT) AS shard,
       |    CAST(row_number() OVER (
       |      PARTITION BY CAST(('0x' || substr(h, 1, 4)) AS INTEGER) % 8
       |      ORDER BY h, doc_id) AS BIGINT) AS rn
       |  FROM t),
       |walk(shard, rn, n_tok, $stateCols) AS (
       |  SELECT DISTINCT shard, CAST(0 AS BIGINT), CAST(0 AS BIGINT), $baseState
       |    FROM s
       |  UNION ALL
       |  SELECT s.shard, s.rn, s.n_tok,
       |$stepState
       |  FROM walk w JOIN s ON s.shard = w.shard AND s.rn = w.rn + 1),
       |per AS (SELECT shard,
       |$perCols
       |  FROM walk WHERE rn >= 1 GROUP BY shard)
       |SELECT * FROM (
       |$unions
       |) ORDER BY budget""".stripMargin
  }
}
