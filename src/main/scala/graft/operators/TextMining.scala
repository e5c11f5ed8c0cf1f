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
}
