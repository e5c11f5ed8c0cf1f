package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus mining over the token stream: collocation discovery, exact
  * phrase search, and per-document novelty — the text-analysis layer a
  * curation pipeline runs AFTER cleaning but BEFORE selection (collocations
  * feed tokenizer/vocab decisions, phrase hits feed targeted filtering,
  * novelty feeds dedup-aware sampling).
  *
  * All three share the [[DedupOps.tokens]] tokenizer (lowercase alnum
  * runs), so their SQL oracles restate them over the same
  * `regexp_extract_all` token lists.
  */
object TextMining {

  /** Pointwise-mutual-information collocations (Church & Hanks 1990) over
    * adjacent token pairs: PMI = ln(P(xy) / (P(x)·P(y))) with P from raw
    * corpus counts — computed as ln(c_xy·N² / (M·c_x·c_y)) where N is the
    * token total and M the bigram total. Pairs below `minCount` are noise
    * (PMI's known low-frequency bias) and are dropped before scoring.
    *
    * Scale shape: two narrow scans of the corpus (unigram and bigram
    * explode — re-running the tokenizer beats caching corpus-sized token
    * arrays) feeding two map-side-combinable groupBys; everything after
    * aggregation is VOCABULARY-sized (|V| unigram rows, ≤|V|² observed
    * bigram rows), so the count joins broadcast and the scalar totals ride
    * one-row broadcast cross joins — no corpus-scale shuffle beyond the
    * two count aggregations, no driver-side state.
    *
    * Bigrams come from zipping the materialized token array with its own
    * tail — the array is materialized ONCE in a prior projection, so the
    * tokenizer regexp is not re-evaluated per element (the
    * [[DedupOps.shingles]] lambda trap).
    */
  def pmiCollocations(df: DataFrame, textCol: String,
                      minCount: Long): DataFrame = {
    val ts = df.select(DedupOps.tokens(col(textCol)).as("__ts"))
    val uni = ts.select(explode(col("__ts")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cw"))
      // vocabulary-sized; referenced by the total and both count joins
      .cache()
    val bi = ts.filter(size(col("__ts")) >= 2)
      .select(explode(arrays_zip(
        slice(col("__ts"), lit(1), size(col("__ts")) - 1),
        slice(col("__ts"), lit(2), size(col("__ts")) - 1))).as("z"))
      .select(col("z.0").as("w1"), col("z.1").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
      // observed-bigram-vocabulary-sized; referenced by the total + output
      .cache()
    val nTok = uni.agg(sum(col("cw")).cast("double").as("__n"))
    val mBig = bi.agg(sum(col("c")).cast("double").as("__m"))
    val out = bi.filter(col("c") >= minCount)
      .join(broadcast(uni.select(col("w").as("w1"), col("cw").as("__c1"))), Seq("w1"))
      .join(broadcast(uni.select(col("w").as("w2"), col("cw").as("__c2"))), Seq("w2"))
      .crossJoin(broadcast(nTok)).crossJoin(broadcast(mBig))
      // identical association order to the oracle: (c·N·N) / (M·c1·c2),
      // all-double, so the 6dp round sees the same IEEE value
      .withColumn("pmi", round(log(col("c").cast("double") * col("__n") * col("__n") /
        (col("__m") * col("__c1").cast("double") * col("__c2").cast("double"))), 6))
      .select(col("w1"), col("w2"), col("c").as("pair_count"), col("pmi"))
    DedupOps.materializeAndRelease(out, uni, bi)
  }

  /** Exact phrase search: occurrences of each query phrase in each
    * document, where an occurrence is a run of adjacent tokens equal to
    * the phrase's token sequence (overlapping runs all count). Output:
    * (id, phrase, occurrences) for occurrences ≥ 1.
    *
    * Scale shape: the corpus side is a narrow positional-gram pass per
    * DISTINCT phrase length (the token array materializes once per pass;
    * grams slice it, never re-tokenize); the tiny phrase table broadcasts,
    * so grams are filtered to phrase matches BEFORE the only shuffle — the
    * (id, phrase) count aggregation sees hit rows only. This is the
    * scan-shaped plan; a pre-built positional inverted index would trade
    * write amplification for repeated-query speed, but for one-shot
    * curation filters the filtered scan is the right side of that trade.
    */
  def phraseOccurrences(df: DataFrame, idCol: String, textCol: String,
                        phrases: Seq[String]): DataFrame = {
    require(phrases.nonEmpty, "phraseOccurrences needs at least one phrase")
    val spark = df.sparkSession
    import spark.implicits._
    val parsed = phrases.map { p =>
      val toks = "[a-z0-9]+".r.findAllIn(p.toLowerCase(java.util.Locale.ROOT)).toSeq
      require(toks.nonEmpty, s"phrase '$p' has no tokens")
      (p, toks.mkString(" "), toks.length)
    }
    val ts = df.select(col(idCol), DedupOps.tokens(col(textCol)).as("__ts"))
    parsed.groupBy(_._3).toSeq.sortBy(_._1).map { case (len, ps) =>
      val phraseDf = ps.map { case (orig, g, _) => (orig, g) }.toDF("phrase", "__g")
      ts.filter(size(col("__ts")) >= len)
        .select(col(idCol),
          explode(expr(s"transform(sequence(0, size(__ts) - $len), " +
            s"j -> array_join(slice(__ts, j + 1, $len), ' '))")).as("__g"))
        .join(broadcast(phraseDf), Seq("__g"))
        .groupBy(col(idCol), col("phrase"))
        .agg(count(lit(1)).as("occurrences"))
    }.reduce(_.unionByName(_))
  }

  /** Per-document novelty profile in corpus order: of each doc's distinct
    * word n-gram shingles, the fraction whose global FIRST occurrence
    * (minimum id over the corpus) is this doc — 1.0 for fully novel text,
    * → 0 for text whose shingles all appeared earlier. The per-doc novelty
    * fraction is the dedup-aware selection signal (prioritize docs that
    * add n-grams the corpus hasn't seen); q158's Heaps-law curve is the
    * corpus-level integral of the same quantity.
    *
    * Scale shape: one shingle-keyed count aggregation (min id per
    * shingle), one shingle-keyed posting join back (co-partitioned with
    * the aggregation — AQE reuses the exchange), one id-keyed count. No
    * global window, no driver state; candidates never materialize as
    * pairs at all (unlike the dedup family this profiles FOR).
    */
  def noveltyProfile(df: DataFrame, idCol: String, textCol: String,
                     n: Int): DataFrame = {
    val sh = DedupOps.shingles(df, idCol, textCol, n)
    val first = sh.groupBy(col("shingle")).agg(min(col(idCol)).as("__first"))
    sh.join(first, Seq("shingle"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("__first") === col(idCol), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty",
        round(col("n_novel").cast("double") / col("n_shingles").cast("double"), 6))
  }

  /** Aho–Corasick multi-pattern automaton (Aho & Corasick 1975): goto
    * trie + BFS failure links, with each node's output set pre-resolved
    * through its failure chain so matching never walks suffix links at
    * scan time. `countAll` reports EVERY occurrence of every pattern
    * (overlapping matches included — for a pattern with no proper border,
    * i.e. no non-empty proper prefix that is also a suffix, occurrences
    * cannot self-overlap, so this equals the greedy non-overlapping
    * count). Built once on the driver (O(Σ|patterns|) nodes) and shipped
    * in the task closure — dictionary size never multiplies the scan
    * count.
    */
  final class AhoCorasick private (
      val patterns: Array[String],
      gotoMaps: Array[Map[Char, Int]],
      fail: Array[Int],
      out: Array[Array[Int]]) extends Serializable {

    /** Per-pattern total occurrence counts in one left-to-right pass. */
    def countAll(text: String): Array[Long] = {
      val counts = new Array[Long](patterns.length)
      var state = 0
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        // follow failure links until a goto transition exists (root loops)
        while (state != 0 && !gotoMaps(state).contains(c)) state = fail(state)
        state = gotoMaps(state).getOrElse(c, 0)
        val hits = out(state)
        var j = 0
        while (j < hits.length) { counts(hits(j)) += 1L; j += 1 }
        i += 1
      }
      counts
    }
  }

  object AhoCorasick {
    def build(patterns: Seq[String]): AhoCorasick = {
      require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
        "patterns must be non-empty")
      val pats = patterns.toArray
      val gotoMaps = scala.collection.mutable.ArrayBuffer(Map.empty[Char, Int])
      val ends = scala.collection.mutable.ArrayBuffer(List.empty[Int])
      pats.zipWithIndex.foreach { case (p, pi) =>
        var node = 0
        p.foreach { c =>
          gotoMaps(node).get(c) match {
            case Some(nxt) => node = nxt
            case None =>
              gotoMaps += Map.empty[Char, Int]
              ends += Nil
              gotoMaps(node) = gotoMaps(node) + (c -> (gotoMaps.length - 1))
              node = gotoMaps.length - 1
          }
        }
        ends(node) = pi :: ends(node)
      }
      val n = gotoMaps.length
      val fail = new Array[Int](n)
      val out = Array.fill(n)(Array.empty[Int])
      val queue = scala.collection.mutable.Queue.empty[Int]
      gotoMaps(0).values.foreach { v => fail(v) = 0; queue += v }
      out(0) = ends(0).toArray
      while (queue.nonEmpty) {
        val u = queue.dequeue()
        // resolve outputs through the (already-finalized) failure target
        out(u) = (ends(u) ++ out(fail(u)).toList).toArray
        gotoMaps(u).foreach { case (c, v) =>
          var f = fail(u)
          while (f != 0 && !gotoMaps(f).contains(c)) f = fail(f)
          // the fallback is strictly shallower than v, so this is never v
          fail(v) = gotoMaps(f).getOrElse(c, 0)
          queue += v
        }
      }
      new AhoCorasick(pats, gotoMaps.toArray, fail, out)
    }

    /** Proper borders (non-empty proper prefix = suffix) of a pattern —
      * the self-overlap witness; empty for patterns where all-occurrence
      * and non-overlapping counts coincide.
      */
    def borders(p: String): Seq[String] =
      (1 until p.length).collect {
        case k if p.startsWith(p.substring(p.length - k)) =>
          p.substring(p.length - k)
      }
  }

  /** Blocklist audit (the C4 badword-filter shape): per blocklist term,
    * how many documents contain it as a SUBSTRING of the lowercased text
    * and how many times in total. Substring (not token) semantics is the
    * point — obfuscated concatenations match — and one Aho–Corasick pass
    * scans the corpus ONCE regardless of dictionary size, where the
    * per-term `LIKE`/regex form costs K full scans.
    *
    * Scale shape: the automaton (O(Σ term lengths), MBs for a 100k-term
    * blocklist) ships in the task closure to each executor; the scan is a
    * narrow map emitting one fixed-width count vector per document, and
    * the only shuffle is the final K-row per-term aggregation (map-side
    * combined). Every term appears in the output even at zero hits —
    * each document emits the full vector.
    */
  def blocklistHits(df: DataFrame, textCol: String,
                    terms: Seq[String]): DataFrame = {
    // the scan lowercases the text, so the patterns must be lowercased too
    // — an uppercase term would otherwise silently never match
    val ac = AhoCorasick.build(terms.map(_.toLowerCase(java.util.Locale.ROOT)))
    val counts = udf { text: String =>
      if (text == null) new Array[Long](terms.size)
      else ac.countAll(text.toLowerCase(java.util.Locale.ROOT))
    }
    df.select(posexplode(counts(col(textCol))).as(Seq("__i", "__n")))
      .groupBy(col("__i"))
      .agg(count(when(col("__n") > 0, lit(1))).cast("long").as("n_docs"),
        sum(col("__n")).cast("long").as("n_hits"))
      .select(element_at(typedLit(terms), col("__i") + 1).as("term"),
        col("n_docs"), col("n_hits"))
  }
}
