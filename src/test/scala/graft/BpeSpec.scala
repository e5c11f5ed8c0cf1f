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

  test("training on the documents corpus reduces mean tokens per doc") {
    val docs = Tables(spark, sf, "documents").limit(100)
    val model = Bpe.train(docs, "text", nMerges = 20)
    assert(model.merges.size == 20, model.merges.size.toString)
    val enc = Bpe.encode(docs, "text", model)
      .select(size(col("bpe_tokens")).cast("long").as("n"))
      .agg(sum("n")).head.getLong(0)
    // char-level baseline: letters+digits + one end-marker per word
    val chars = docs.select(
        length(regexp_replace(lower(col("text")), "[^a-z0-9]", "")).cast("long")
          .as("c"),
        size(split(trim(col("text")), " +")).cast("long").as("w"))
      .agg(sum(col("c") + col("w"))).head.getLong(0)
    // 20 merges on the ~30-word synthetic vocab: ~31% shorter than
    // char-level (full-word tokens need ~vocab-size merges)
    assert(enc < chars * 3 / 4, s"bpe=$enc chars=$chars")
  }
}
