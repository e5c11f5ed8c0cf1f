package graft

import graft.operators.TextMining
import org.apache.spark.sql.functions._

/** Hand-computed cases for the corpus-mining operators (q175-q177). */
class TextMiningSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("pmiCollocations matches hand-computed PMI and honors minCount") {
    // tokens: d1 = a b a b, d2 = b a c → N = 7
    // unigrams: a=3 b=3 c=1; bigrams: (a,b)=2 (b,a)=2 (a,c)=1 → M = 5
    val df = docs(1L -> "a b a b", 2L -> "b a c")
    val got = TextMining.pmiCollocations(df, "text", minCount = 1L)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    def pmi(c: Long, cx: Long, cy: Long): Double =
      BigDecimal(math.log(c.toDouble * 7 * 7 / (5.0 * cx * cy)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.keySet === Set("a" -> "b", "b" -> "a", "a" -> "c"))
    assert(got("a" -> "b") === (2L, pmi(2, 3, 3)))
    assert(got("b" -> "a") === (2L, pmi(2, 3, 3)))
    assert(got("a" -> "c") === (1L, pmi(1, 3, 1)))
    // minCount drops the singleton pair but its occurrences still count
    // toward the bigram total M (totals are pre-filter by construction)
    val filtered = TextMining.pmiCollocations(df, "text", minCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(filtered === Set("a" -> "b", "b" -> "a"))
  }

  test("phraseOccurrences counts overlapping runs across phrase lengths") {
    val df = docs(1L -> "a a a b", 2L -> "b c", 3L -> "x")
    val got = TextMining.phraseOccurrences(df, "doc_id", "text",
        Seq("a a", "a b", "a a a", "c", "q z"))
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    assert(got === Map(
      (1L, "a a") -> 2L,   // overlapping positions 0 and 1 both count
      (1L, "a b") -> 1L,
      (1L, "a a a") -> 1L,
      (2L, "c") -> 1L))    // 1-token phrase; no row for unmatched "q z"
  }

  test("phraseOccurrences normalizes phrase tokens like the corpus") {
    // "Hash-Join!" tokenizes to [hash, join] under the alnum-run rule;
    // the ORIGINAL phrase string is what the output row carries
    val df = docs(1L -> "fast hash join")
    val got = TextMining.phraseOccurrences(df, "doc_id", "text", Seq("Hash-Join!"))
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(got === Seq("Hash-Join!" -> 1L))
  }

  test("noveltyProfile credits first-introducing docs in id order") {
    // n=2: d1 {x y, y z} all first → 1.0; d2 {x y, y q} → 1/2 novel;
    // d3 has one token → no shingles → no row
    val df = docs(1L -> "x y z", 2L -> "x y q", 3L -> "x")
    val got = TextMining.noveltyProfile(df, "doc_id", "text", n = 2)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got === Map(
      1L -> ((2L, 2L, 1.0)),
      2L -> ((2L, 1L, 0.5))))
  }

  test("AhoCorasick counts all matches, fail links included (ushers)") {
    // the textbook automaton: "ushers" hits she@3, he@3 (via the she→he
    // suffix output), hers@5 — his never fires
    val ac = TextMining.AhoCorasick.build(Seq("he", "she", "his", "hers"))
    assert(ac.countAll("ushers").toSeq === Seq(1L, 1L, 0L, 1L))
    // independent restart mid-word: "shis" → his via the sh→h fail link
    assert(ac.countAll("shis").toSeq === Seq(0L, 0L, 1L, 0L))
  }

  test("AhoCorasick counts self-overlapping occurrences of bordered terms") {
    val ac = TextMining.AhoCorasick.build(Seq("aba"))
    // "ababa" contains aba at 0 and 2 — overlapping, both reported
    assert(ac.countAll("ababa")(0) == 2L)
    assert(TextMining.AhoCorasick.borders("aba") === Seq("a"))
    assert(TextMining.AhoCorasick.borders("abab") === Seq("ab"))
  }

  test("q198's blocklist terms are border-free (oracle-count parity)") {
    // the DuckDB oracle counts non-overlapping occurrences via replace();
    // that equals the automaton's all-occurrence count ONLY for terms that
    // cannot self-overlap, i.e. have no proper border
    graft.queries.TextQueries.blocklistTerms.foreach { t =>
      assert(TextMining.AhoCorasick.borders(t).isEmpty, s"term '$t' has a border")
    }
  }

  test("blocklistHits: per-term totals, zero terms present, null text safe") {
    val df = Seq(
      (1L, "spam and SPAM again"),            // case-insensitive, 2 hits
      (2L, "clean text"),
      (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = TextMining.blocklistHits(df, "text", Seq("spam", "absent"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(
      "spam" -> ((1L, 2L)),   // one doc, two occurrences
      "absent" -> ((0L, 0L)))) // zero-hit term still reported
  }

  test("blocklistHits: uppercase TERMS match the lowercased scan") {
    // the scan lowercases text, so patterns must be lowercased on build —
    // an uppercase term silently reporting 0 hits was an ADVICE.md find
    val df = Seq((1L, "spam and SPAM again")).toDF("doc_id", "text")
    val got = TextMining.blocklistHits(df, "text", Seq("SPAM"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map("SPAM" -> ((1L, 2L))))
  }
}
