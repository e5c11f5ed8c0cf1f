package graft

import graft.operators.Chunking
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

class ChunkingSpec extends AnyFunSuite {

  /** scalatestplus bridge isn't on the classpath; drive scalacheck Gens
    * directly with fixed seeds for reproducibility.
    */
  private def forAll[A](gen: Gen[A], n: Int = 100)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private val maxChars = Chunking.maxTokens * 4
  private val overlapChars = Chunking.overlapTokens * 4

  test("empty and null text produce no chunks") {
    assert(Chunking.chunk("d", "").isEmpty)
    assert(Chunking.chunk("d", null).isEmpty)
  }

  test("short text yields a single full-coverage chunk") {
    val text = "word " * 30 // 150 chars > minChars
    val cs = Chunking.chunk("d", text.trim)
    assert(cs.length == 1)
    assert(cs.head.text == text.trim)
    assert(cs.head.chunk_id == "d_chunk_0")
  }

  test("sub-minimum text is dropped") {
    assert(Chunking.chunk("d", "tiny text.").isEmpty)
  }

  val textGen: Gen[String] = for {
    n <- Gen.choose(0, 8000)
    cs <- Gen.listOfN(n, Gen.frequency(
      (20, Gen.alphaLowerChar), (4, Gen.const(' ')),
      (1, Gen.const('.')), (1, Gen.const('!'))))
  } yield cs.mkString

  test("invariants: budget respected, positions ordered, ids sequential") {
    forAll(textGen) { text =>
      val cs = Chunking.chunk("d", text)
      cs.foreach { c =>
        // budget: chunk ≤ maxChars plus the carried overlap prefix + joiner
        assert(c.text.length <= maxChars + overlapChars + 1,
          s"chunk too long: ${c.text.length}")
        assert(c.text.length >= Chunking.minChars)
        assert(c.token_count == c.text.length / 4)
        // offsets are true document offsets
        assert(c.start_char >= 0 && c.start_char <= text.length)
        assert(c.end_char >= c.start_char && c.end_char <= text.length,
          s"end_char ${c.end_char} beyond doc ${text.length}")
      }
      assert(cs.map(_.position) == cs.indices.map(identity))
      // chunk ranges advance monotonically through the document
      cs.sliding(2).foreach {
        case Seq(a, b) => assert(b.start_char >= a.start_char)
        case _ =>
      }
      cs.zipWithIndex.foreach { case (c, i) =>
        assert(c.chunk_id == s"d_chunk_$i")
      }
    }
  }

  test("long unpunctuated text is hard-split and tail content is retained") {
    val text = ("x" * 10) + ("abcdefgh " * 1000) // ~9010 chars, no sentence ends
    val cs = Chunking.chunk("d", text.trim)
    assert(cs.length > 1)
    // every consecutive pair overlaps: next chunk starts with prev tail
    cs.sliding(2).foreach {
      case Seq(a, b) =>
        assert(b.text.startsWith(a.text.takeRight(overlapChars)))
      case _ =>
    }
  }

  test("Generator form produces identical rows to the UDF+explode form") {
    val spark = SparkSpec.session
    val df = Tables(spark, "/root/testdata/sf0.001", "documents")
    val viaUdf = Chunking.chunkDocuments(df, "doc_id", "text")
    val viaGen = Chunking.chunkDocumentsGen(df, "doc_id", "text")
    assert(viaGen.columns.toSeq == viaUdf.columns.toSeq)
    assert(viaGen.exceptAll(viaUdf).count() == 0)
    assert(viaUdf.exceptAll(viaGen).count() == 0)
  }

  test("cleaner is idempotent and keyword tokenizer is stable (SURVEY §5.2)") {
    val spark = SparkSpec.session
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.TextFns
    val texts = (0 until 100).flatMap { i =>
      textGen.apply(org.scalacheck.Gen.Parameters.default,
        org.scalacheck.rng.Seed(i.toLong))
    } ++ Seq("http://x.y z@w.org [1, 2] (Foo et al., 2020) a  bé!")
    val df = texts.toDF("t")
      .withColumn("c1", TextFns.cleanText(col("t")))
      .withColumn("c2", TextFns.cleanText(TextFns.cleanText(col("t"))))
    assert(df.filter(col("c1") =!= col("c2")).count() == 0,
      "cleanText is not idempotent")
    val tok = df
      .withColumn("w1", TextFns.words(col("c1")))
      .withColumn("w2", TextFns.words(col("c2")))
    assert(tok.filter(to_json(col("w1")) =!= to_json(col("w2"))).count() == 0)
  }

  test("DataFrame operator explodes one row per chunk") {
    val spark = SparkSpec.session
    val df = Tables(spark, "/root/testdata/sf0.001", "documents")
    val chunks = Chunking.chunkDocuments(df, "doc_id", "text")
    val expected = df.collect()
      .map(r => Chunking.chunk(r.getAs[Long]("doc_id").toString,
        r.getAs[String]("text")).length)
      .sum
    assert(chunks.count() == expected)
    assert(chunks.columns.contains("chunk_id"))
  }
}
