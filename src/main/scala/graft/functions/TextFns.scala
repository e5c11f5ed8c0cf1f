package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Row-wise text functions (SURVEY.md §2.3 P7/P9 + the training-pipeline
  * text-analysis surface: language-ID, quality scoring, token counting,
  * fingerprinting).
  *
  * Everything here is pure `org.apache.spark.sql.functions` composition —
  * whole-stage-codegen friendly, no UDFs — so the same logic is expressible
  * as the DuckDB oracle SQL verbatim. Patterns stay inside the common
  * Java-regex ∩ RE2 dialect (no lookbehind, no \p{} shorthands that differ).
  *
  * Reference behaviors re-expressed:
  *  - text cleaning chain: `preprocessing/text_cleaner.py:17-99`
  *  - keyword tokenize + stoplist: `preprocessing/metadata_enricher.py:62-89`
  */
object TextFns {

  /** Python `str.strip()` parity: Python strips Py_UNICODE_ISSPACE chars —
    * the Unicode White_Space set plus the \x1c-\x1f separators — while Java
    * `String.strip` (Character.isWhitespace) misses U+00A0/U+2007/U+202F
    * (non-breaking spaces) and U+0085. Ports of Python `.strip()` must use
    * this, or an NBSP-edged fragment diverges from the reference.
    */
  private val pyEdgeWs = java.util.regex.Pattern.compile(
    "^[\\s\\x1c-\\x1f]+|[\\s\\x1c-\\x1f]+$",
    java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)

  def pyStrip(s: String): String =
    if (s == null) null else pyEdgeWs.matcher(s).replaceAll("")

  /** Stoplist: the reference's 40-word English stoplist family
    * (`metadata_enricher.py:66-74`), trimmed to the words that can occur in
    * the synthetic corpus.
    */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "by", "at", "from", "that", "this", "it",
    "be", "has", "have", "not", "but", "they", "their", "we", "our")

  private val stopAlt = stopwords.mkString("(", "|", ")")

  /** Cleaning chain (P7): strip URLs, emails, bracketed numeric citations,
    * parenthetical et-al citations, non-text characters; collapse
    * whitespace; trim. Order matters and is fixed — mirror it verbatim in
    * any oracle.
    */
  def cleanText(c: Column): Column = {
    val noUrl = regexp_replace(c, lit("https?://[^ \\t\\n\\r\\f\\x0B]+"), lit(" "))
    val noMail = regexp_replace(noUrl,
      lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"), lit(" "))
    val noCite = regexp_replace(noMail, lit("\\[[0-9, ]+\\]"), lit(" "))
    val noEtAl = regexp_replace(noCite,
      lit("\\([A-Za-z]+ et al[.,][^)]*\\)"), lit(" "))
    val noJunk = regexp_replace(noEtAl,
      lit("[^a-zA-Z0-9 .,;:!?()'-]"), lit(" "))
    val oneSpace = regexp_replace(noJunk, lit("  *"), lit(" "))
    trim(oneSpace)
  }

  /** PII redaction for training corpora: emails, URLs, then long digit runs
    * (phone/SSN-ish) replaced with typed placeholder tokens — replacement
    * (not deletion) preserves token positions for downstream chunk
    * alignment. Patterns stay in the Java∩RE2 dialect so the oracle's
    * regexp_replace(..., 'g') is character-identical.
    */
  def redactPii(c: Column): Column = {
    val noMail = regexp_replace(c,
      lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"), lit("<EMAIL>"))
    val noUrl = regexp_replace(noMail, lit("https?://[^ \\t\\n\\r\\f\\x0B]+"), lit("<URL>"))
    regexp_replace(noUrl, lit("[0-9][0-9() .-]{6,}[0-9]"), lit("<NUMBER>"))
  }

  /** Whitespace token count (cast long for oracle parity). */
  def tokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[^ ]+"), lit(0))).cast("long")

  /** Alphabetic word count ≥3 chars, lowercased — the keyword tokenizer
    * (P9 `[a-zA-Z]{3,}`).
    */
  def words(c: Column): Column =
    regexp_extract_all(lower(c), lit("[a-z]{3,}"), lit(0))

  /** BPE-ish subword count: letter runs, digit runs, single punctuation —
    * the regex family a tokenizer-budget estimator uses.
    */
  def subwordCount(c: Column): Column =
    size(regexp_extract_all(c,
      lit("[a-zA-Z]+|[0-9]|[^a-zA-Z0-9 ]"), lit(0))).cast("long")

  /** Stopword occurrences (word-bounded). */
  def stopwordCount(c: Column): Column =
    size(regexp_extract_all(lower(c),
      lit("\\b" + stopAlt + "\\b"), lit(0))).cast("long")

  /** N-gram-heuristic language ID: count per-language marker stopwords and
    * pick the argmax with a fixed priority order on ties. Cheap, one scan,
    * pure expressions — the 100 TB path is exactly this (no model call).
    */
  def languageId(c: Column): Column = {
    def score(markers: Seq[String]): Column =
      size(regexp_extract_all(lower(c),
        lit("\\b(" + markers.mkString("|") + ")\\b"), lit(0))).cast("long")
    val en = score(Seq("the", "and", "of", "to", "is", "a"))
    val es = score(Seq("el", "la", "los", "que", "de", "y"))
    val de = score(Seq("der", "die", "und", "das", "nicht", "ist"))
    val fr = score(Seq("le", "les", "des", "et", "une", "est"))
    val best = greatest(en, es, de, fr)
    when(best === 0, lit("unknown"))
      .when(en === best, lit("en"))
      .when(es === best, lit("es"))
      .when(de === best, lit("de"))
      .otherwise(lit("fr"))
  }

  /** Composite document quality score, fixed-point ×10000 in [0,1000000]:
    * length saturation, alphabetic-character ratio, stopword-rate saturation
    * (reference quality family: length/punct/stopword ratios).
    *
    * Fixed-point via floor(x·10⁴+0.5) rather than round(): Spark rounds via
    * exact BigDecimal HALF_UP while DuckDB rounds in float — they disagree on
    * exact-half values, and this small-rational formula hits them. The floor
    * form is the same float algorithm on both engines.
    */
  def qualityScore(c: Column): Column = {
    val nChars = length(c).cast("double")
    val alpha = size(regexp_extract_all(c, lit("[a-zA-Z]"), lit(0))).cast("double")
    val toks = tokenCount(c).cast("double")
    val stops = stopwordCount(c).cast("double")
    val lenScore = least(lit(1.0), nChars / 500.0)
    val alphaRatio = when(nChars > 0, alpha / nChars).otherwise(lit(0.0))
    val stopScore = least(lit(1.0),
      when(toks > 0, stops / toks).otherwise(lit(0.0)) * 3.0)
    floor((lenScore * 0.4 + alphaRatio * 0.3 + stopScore * 0.3) * 100 * 10000 + 0.5)
      .cast("long")
  }

  /** Content fingerprint: md5 of the whitespace-normalized, lowercased text —
    * the exact-dedup key (reference dedup family; SQL-expressible so the
    * oracle can recompute it).
    */
  def fingerprint(c: Column): Column =
    md5(regexp_replace(lower(c), lit("[^a-z0-9]+"), lit(" ")))

  /** Unicode NFC normalization (canonical composition) — the cleanup pass
    * a multilingual corpus needs before fingerprint/dedup, since the same
    * visible string arrives both precomposed (é) and decomposed (e+U+0301)
    * from different sources and would otherwise hash apart. Java's
    * Normalizer implements the same Unicode algorithm as the oracle's
    * `nfc_normalize`.
    */
  private val nfcUdf = udf { s: String =>
    if (s == null) null
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
  }
  def nfcNormalize(c: Column): Column = nfcUdf(c)
}
