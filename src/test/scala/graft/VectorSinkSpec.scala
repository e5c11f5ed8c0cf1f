package graft

import graft.embed.Embedder
import graft.sinks.VectorSink
import graft.sources.HttpSource
import graft.sources.HttpSource.HttpResponse
import org.apache.spark.sql.functions._

object VectorSinkSpec {
  // JVM-static capture (clients are constructed per partition)
  val inserted = new java.util.concurrent.ConcurrentLinkedQueue[VectorSink.VectorRecord]()
  val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Integer]()

  class FakeClient extends VectorSink.VectorClient {
    def insertBatch(records: Seq[VectorSink.VectorRecord]): Int = {
      records.foreach(inserted.add)
      batchSizes.add(records.size)
      records.size
    }
  }
}

class VectorSinkSpec extends SparkSpec {
  import VectorSinkSpec._

  test("vector sink batches records with metadata through the client") {
    inserted.clear(); batchSizes.clear()
    val vecs = Tables(spark, sf, "embeddings")
      .withColumn("label_s", col("label").cast("string"))
      .limit(250)
    val stats = VectorSink.write(vecs, "vec_id", "embedding", Seq("label_s"),
      () => new FakeClient, batchSize = 100)
    assert(stats.attempted == 250)
    assert(stats.accepted == 250)
    assert(inserted.size == 250)
    val rec = inserted.peek()
    assert(rec.vector.length == 64)
    assert(rec.meta.contains("label_s"))
    assert(batchSizes.toArray(Array.empty[Integer]).forall(_ <= 100))
  }

  test("embed stage output flows into the vector sink end-to-end") {
    inserted.clear(); batchSizes.clear()
    val docs = Tables(spark, sf, "documents").limit(20)
    val chunks = graft.operators.Chunking.chunkDocumentsGen(docs, "doc_id", "text")
    val vecs = Embedder.embedChunks(chunks, "chunk_id", "chunk_text",
      new Embedder.HashingProvider(16))
    val stats = VectorSink.write(vecs, "chunk_id", "embedding", Seq(),
      () => new FakeClient)
    assert(stats.attempted == vecs.count())
    assert(stats.accepted == stats.attempted)
  }

  test("fetchPapersByIds uses the retry ladder and parses records") {
    val body = """{"paperId":"pX","title":"T","abstract":null,"year":2019,
                 |"citationCount":1,"influentialCitationCount":0,
                 |"externalIds":{},"authors":[],"references":[],
                 |"fieldsOfStudy":[],"publicationTypes":[],
                 |"tldr":null,"openAccessPdf":null}""".stripMargin
    val tr = new HttpSourceSpec.ScriptedTransport(Seq(
      HttpResponse(429, ""), HttpResponse(200, body)))
    val df = HttpSource.fetchPapersByIds(spark, Seq("pX"),
      HttpSource.SourceConfig(minIntervalMs = 0, sleeper = HttpSourceSpec.noSleep), tr)
    val row = df.collect()(0)
    assert(row.getAs[String]("paperId") == "pX")
    assert(row.getAs[Int]("year") == 2019)
  }
}
