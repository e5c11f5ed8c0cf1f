package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair encoding) tokenizer training — the step a
  * training-data pipeline runs BEFORE token counting means anything.
  *
  * Classic word-frequency formulation: the corpus collapses once to a
  * (word, freq) table (one shuffle; distinct words ≪ corpus), each word
  * becomes a symbol sequence (chars + an end-of-word marker), and every
  * merge round counts adjacent symbol pairs weighted by word frequency,
  * picks the global argmax, and rewrites the symbol sequences. All heavy
  * state (the word table) stays distributed; the driver holds only the
  * learned merge rules (one string pair per round) — at 100 TB the word
  * table is the aggregation of the corpus, not the corpus.
  *
  * Deterministic: pair ties break lexicographically; no RNG.
  */
object Bpe {

  final case class Model(merges: Seq[(String, String)]) {
    /** Apply the learned merges to one word (greedy, in training order). */
    def encodeWord(word: String): Seq[String] = {
      var syms: Seq[String] = word.map(_.toString) :+ Model.EndOfWord
      merges.foreach { case (a, b) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += a + b
            i += 2
          } else {
            out += syms(i)
            i += 1
          }
        }
        syms = out.toSeq
      }
      syms
    }
  }

  object Model {
    val EndOfWord = "</w>"
  }

  private val tokenRe = java.util.regex.Pattern.compile("[a-z0-9]+")

  /** Corpus → (word, freq) — the only pass over the full data. */
  def wordFrequencies(df: DataFrame, textCol: String): DataFrame = {
    val words = udf { text: String =>
      if (text == null) Array.empty[String]
      else {
        val m = tokenRe.matcher(text.toLowerCase(java.util.Locale.ROOT))
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        while (m.find()) out += m.group()
        out.toArray
      }
    }
    df.select(explode(words(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
  }

  /** Learn `nMerges` merge rules from the corpus — hybrid execution.
    *
    * The corpus always collapses to (word, freq) distributed (the one pass
    * over the full data). The merge loop itself runs on VOCABULARY-sized
    * state, so when the distinct-word count is under `maxLocalVocab` the
    * table is collected and the loop runs driver-local: 2 Spark jobs per
    * merge round × a real tokenizer's 32k merges = 64k jobs, where the
    * local loop does the identical argmax/rewrite in-process in seconds
    * (spec'd merge-identical to the independent fixture tool). Past the
    * threshold — a 100 TB corpus can exceed driver memory in distinct
    * words — the original distributed loop runs instead, bit-identical
    * semantics (same weighting, `(count desc, "a b" asc)` tie-break,
    * stop-below-2 rule; equality spec'd in BpeSpec).
    */
  def train(df: DataFrame, textCol: String, nMerges: Int,
            maxLocalVocab: Long = 1000000L): Model = {
    val wf = wordFrequencies(df, textCol).persist()
    val nWords = wf.count()
    val model =
      if (nWords <= maxLocalVocab) {
        val collected = wf.collect().map { r =>
          (r.getString(0).map(_.toString).toArray :+ Model.EndOfWord,
            r.getLong(1))
        }
        Model(trainLocal(collected, nMerges))
      } else Model(trainDistributed(wf, nMerges))
    wf.unpersist()
    model
  }

  /** Encode a corpus with a trained model: one narrow pass, zero shuffle.
    * A per-executor word → encoding memo (vocabulary-bound, concurrent)
    * amortizes merge application across repeated words — the corpus is
    * encoded by LOOKUP, not by re-running the merge loop per occurrence,
    * which is what makes applying a 32k-merge tokenizer to 100 TB a pure
    * map stage. Sequential application in training order is exact for
    * tables produced by [[train]]: a merge's input symbols can only be
    * created by EARLIER merges, so best-rank-first iteration and
    * sequential replay segment identically.
    *
    * Returns (idCol, n_bpe_tokens, tokens_md5) — the md5 of the
    * space-joined token stream, the portable form the golden fixture pins.
    */
  def encode(df: DataFrame, idCol: String, textCol: String, model: Model): DataFrame = {
    val m = model
    val f = new (String => Array[String]) with Serializable {
      @transient private lazy val memo =
        new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
      def apply(text: String): Array[String] = {
        if (text == null) Array.empty[String]
        else {
          val mt = tokenRe.matcher(text.toLowerCase(java.util.Locale.ROOT))
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          while (mt.find()) {
            val w = mt.group()
            out ++= memo.computeIfAbsent(w, w2 => m.encodeWord(w2).toArray)
          }
          out.toArray
        }
      }
    }
    val enc = udf(f)
    df.select(col(idCol), enc(col(textCol)).as("__toks"))
      .select(col(idCol), size(col("__toks")).cast("long").as("n_bpe_tokens"),
        md5(concat_ws(" ", col("__toks"))).as("tokens_md5"))
  }

  /** Driver-local merge loop over the collected (syms, freq) table. */
  private def trainLocal(words0: Array[(Array[String], Long)],
                         nMerges: Int): Seq[(String, String)] = {
    var words = words0
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    var round = 0
    while (round < nMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      // argmax by (count desc, "a b" asc) — ASCII symbols, so Java string
      // order ≡ the distributed loop's UTF8 binary sort on the pair key
      var best: (String, String) = null
      var bestN = Long.MinValue
      counts.foreach { case (k, n) =>
        if (n > bestN || (n == bestN &&
            (k._1 + " " + k._2).compareTo(best._1 + " " + best._2) < 0)) {
          best = k
          bestN = n
        }
      }
      if (best == null || bestN < 2) done = true
      else {
        merges += best
        val (a, b) = best
        words = words.map { case (syms, f) =>
          if (!syms.indices.init.exists(i => syms(i) == a && syms(i + 1) == b))
            (syms, f)
          else {
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                out += a + b
                i += 2
              } else {
                out += syms(i)
                i += 1
              }
            }
            (out.toArray, f)
          }
        }
      }
      round += 1
    }
    merges.toSeq
  }

  /** Distributed merge loop: each round is one explode + groupBy + limit-1
    * collect over the (word, freq) table. The scale path — vocabulary-
    * distributed, driver holds only the merge rules.
    */
  private def trainDistributed(wordFreq: DataFrame,
                               nMerges: Int): Seq[(String, String)] = {
    val spark = wordFreq.sparkSession
    import spark.implicits._
    val toSyms = udf { word: String =>
      word.map(_.toString) :+ Model.EndOfWord
    }
    // lazy checkpoints throughout the merge loop: the per-round argmax
    // collect is a full groupBy read of every partition, so it
    // materializes the round's table as a side effect — one driver job
    // per merge round instead of two (the GraphOps pattern)
    var words = wordFreq
      .select(toSyms(col("word")).as("syms"), col("freq"))
      .localCheckpoint(eager = false)
    val pairs = udf { syms: Seq[String] =>
      if (syms.length < 2) Array.empty[String]
      else (0 until syms.length - 1)
        .map(i => syms(i) + " " + syms(i + 1)).toArray
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    var round = 0
    while (round < nMerges && !done) {
      val top = words
        .select(explode(pairs(col("syms"))).as("pair"), col("freq"))
        .groupBy("pair").agg(sum("freq").as("n"))
        .orderBy(col("n").desc, col("pair"))
        .limit(1).as[(String, Long)].collect()
      if (top.isEmpty || top(0)._2 < 2) done = true
      else {
        val Array(a, b) = top(0)._1.split(" ", 2)
        merges += ((a, b))
        val applyMerge = udf { syms: Seq[String] =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              out += a + b
              i += 2
            } else {
              out += syms(i)
              i += 1
            }
          }
          out.toSeq
        }
        words = words.select(applyMerge(col("syms")).as("syms"), col("freq"))
          .localCheckpoint(eager = false)
      }
      round += 1
    }
    merges.toSeq
  }

  /** Tokenize a text column with a trained model (narrow map). */
  def encode(df: DataFrame, textCol: String, model: Model): DataFrame = {
    val enc = udf { text: String =>
      if (text == null) Array.empty[String]
      else {
        val m = tokenRe.matcher(text.toLowerCase(java.util.Locale.ROOT))
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        while (m.find()) out ++= model.encodeWord(m.group())
        out.toArray
      }
    }
    df.withColumn("bpe_tokens", enc(col(textCol)))
  }
}
