package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("BPE learns the dominant pair first and merges deterministically") {
    // 'aaab' x10, 'aab' x5: pair (a,a) dominates, then (aa,a) etc.
    val df = (Seq.fill(10)("aaab") ++ Seq.fill(5)("aab")).toDF("text")
    val model = Bpe.train(df, "text", nMerges = 3)
    assert(model.merges.nonEmpty)
    assert(model.merges.head == (("a", "a")), model.merges.toString)
    val again = Bpe.train(df, "text", nMerges = 3)
    assert(model.merges == again.merges)
  }

  test("encoding with merges shortens sequences and round-trips content") {
    val df = (Seq.fill(10)("hello world") ++ Seq.fill(3)("hell broke loose"))
      .toDF("text")
    val model = Bpe.train(df, "text", nMerges = 10)
    val word = "hello"
    val encoded = model.encodeWord(word)
    assert(encoded.length < word.length + 1, encoded.toString) // merged something
    assert(encoded.mkString.replace(Bpe.Model.EndOfWord, "") == word) // lossless
  }

  test("corpus encode agrees with per-word encodeWord and is lossless") {
    val df = (Seq.fill(10)("hello world") ++ Seq.fill(3)("hell broke loose"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val model = Bpe.train(df, "text", nMerges = 10)
    val out = Bpe.encode(df, "doc_id", "text", model)
      .orderBy("doc_id").collect()
    assert(out.length == 13)
    // doc 0 = "hello world": token stream must equal the concatenation of
    // the per-word encodings, and its md5 must match that reconstruction
    val expected = (model.encodeWord("hello") ++ model.encodeWord("world"))
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(expected.mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out(0).getLong(1) == expected.length)
    assert(out(0).getString(2) == md)
  }

  test("local fast path reproduces the independent fixture tool to exhaustion") {
    // tools/make_bpe_fixture.py (from-scratch Python BPE) run with
    // n_merges=300 over sf0.01: the corpus vocabulary runs dry at 106
    // merges, so this compares the ENTIRE merge table through the
    // stop-below-2 rule, not just a prefix
    val docs = Tables(spark, "/root/testdata/sf0.01", "documents")
    val model = Bpe.train(docs, "text", nMerges = 300)
    val expected = spark.read
      .parquet(Fixtures.golden("bpe_merges_sf001_300.parquet"))
      .orderBy(col("rank")).collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toSeq
    assert(expected.length == 106)
    assert(model.merges == expected)
  }

  test("local and distributed merge loops learn identical rules") {
    val docs = Tables(spark, sf, "documents").limit(100)
    val local = Bpe.train(docs, "text", nMerges = 15)
    val dist = Bpe.train(docs, "text", nMerges = 15, maxLocalVocab = 0L)
    assert(local.merges.length == 15)
    assert(local.merges == dist.merges)
  }

  test("deep training: hundreds of merges complete in seconds on a wide vocab") {
    // the job-count-bound distributed loop makes 32k-merge tokenizers
    // infeasible (2 jobs/round); the local loop must handle deep merge
    // tables routinely — 250 rounds over a 2000-word vocabulary
    val words = (0 until 2000).map { i =>
      val sb = new StringBuilder
      var v = i * 31 + 7
      (0 until 6).foreach { _ => sb.append(('a' + v % 26).toChar); v /= 26 }
      (sb.toString, i % 7 + 2)
    }
    val corpus = words.flatMap { case (w, n) => Seq.fill(n)(w) }
      .grouped(50).map(_.mkString(" ")).toSeq.toDF("text")
    val t0 = System.nanoTime()
    val model = Bpe.train(corpus, "text", nMerges = 250)
    val dt = (System.nanoTime() - t0) / 1e9
    assert(model.merges.length == 250, model.merges.length.toString)
    assert(dt < 120.0, s"took ${dt}s")
    // deterministic: same corpus, same table
    assert(Bpe.train(corpus, "text", nMerges = 250).merges == model.merges)
  }

  test("training on the documents corpus reduces mean tokens per doc") {
    val docs = Tables(spark, sf, "documents").limit(100)
    val model = Bpe.train(docs, "text", nMerges = 20)
    assert(model.merges.size == 20, model.merges.size.toString)
    val enc = Bpe.encode(docs, "text", model)
      .select(size(col("bpe_tokens")).cast("long").as("n"))
      .agg(sum("n")).head().getLong(0)
    // char-level baseline: letters+digits + one end-marker per word
    val chars = docs.select(
        length(regexp_replace(lower(col("text")), "[^a-z0-9]", "")).cast("long")
          .as("c"),
        size(split(trim(col("text")), " +")).cast("long").as("w"))
      .agg(sum(col("c") + col("w"))).head().getLong(0)
    // 20 merges on the ~30-word synthetic vocab: ~31% shorter than
    // char-level (full-word tokens need ~vocab-size merges)
    assert(enc < chars * 3 / 4, s"bpe=$enc chars=$chars")
  }
}
