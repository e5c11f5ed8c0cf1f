package graft

import graft.sources.HttpSource
import graft.sources.HttpSource._
import org.apache.spark.sql.functions._

/** Mirrors the reference's mocked client suite
  * (`tests/unit/test_semantic_scholar_client.py`): URL/field construction,
  * 429 backoff, 400 limit renegotiation, 5xx retry, pagination, key use —
  * all against canned transports, no network.
  */
object HttpSourceSpec {
  val noSleep: Long => Unit = _ => ()

  /** URL log shared via JVM static state: the transport instance itself is
    * serialized per task, so instance fields mutate a copy — in local mode
    * a static queue sees every executor-thread call.
    */
  val recordedUrls = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  class ScriptedTransport(script: Seq[HttpResponse]) extends HttpTransport {
    private val i = new java.util.concurrent.atomic.AtomicInteger(0)
    def get(url: String, headers: Map[String, String]): HttpResponse = {
      recordedUrls.add(url)
      script(math.min(i.getAndIncrement(), script.size - 1))
    }
  }
}

class HttpSourceSpec extends SparkSpec {
  import HttpSourceSpec._

  private def cfg = SourceConfig(minIntervalMs = 0, sleeper = noSleep)

  private def paperJson(id: String, term: String = "x") =
    s"""{"paperId":"$id","title":"T $id","abstract":"A","year":2020,
       |"citationCount":3,"influentialCitationCount":1,
       |"externalIds":{"DOI":"10.1/$id"},
       |"authors":[{"authorId":"a1","name":"Ada"},{"authorId":"a2","name":"Bob"}],
       |"references":[{"paperId":"r1"},{"paperId":null}],
       |"fieldsOfStudy":["Computer Science"],"publicationTypes":["JournalArticle"],
       |"tldr":{"text":"tl"},"openAccessPdf":{"url":"http://pdf/$id"}}""".stripMargin

  test("search URL carries field projection and limit pushdown") {
    val url = HttpSource.searchUrl(cfg, "deep learning", 77)
    assert(url.contains("limit=77"))
    assert(url.contains("query=deep+learning"))
    cfg.fields.foreach(f => assert(url.contains(f), s"missing field $f"))
  }

  test("search parses nested payload into the raw schema") {
    val body = s"""{"total":1,"data":[${paperJson("p1")}]}"""
    val tr = new ScriptedTransport(Seq(HttpResponse(200, body)))
    val df = HttpSource.searchPapers(spark, Seq("ml"), cfg, tr)
    val row = df.collect()(0)
    assert(row.getAs[String]("paperId") == "p1")
    assert(row.getAs[Map[String, String]]("externalIds")("DOI") == "10.1/p1")
    assert(row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("authors")
      .map(_.getString(1)).toSeq == Seq("Ada", "Bob"))
    assert(row.getAs[String]("search_term") == "ml")
  }

  test("429 backs off and retries until success") {
    val ok = s"""{"data":[${paperJson("p2")}]}"""
    val tr = new ScriptedTransport(Seq(
      HttpResponse(429, ""), HttpResponse(429, ""), HttpResponse(200, ok)))
    recordedUrls.clear()
    val df = HttpSource.searchPapers(spark, Seq("q"), cfg, tr)
    assert(df.count() == 1)
    assert(recordedUrls.size == 3)
  }

  test("400 renegotiates the limit downward from the error body") {
    val ok = s"""{"data":[${paperJson("p3")}]}"""
    val tr = new ScriptedTransport(Seq(
      HttpResponse(400, """{"error":"limit must be <= 25"}"""),
      HttpResponse(200, ok)))
    recordedUrls.clear()
    val df = HttpSource.searchPapers(spark, Seq("q"),
      cfg.copy(limit = 100), tr)
    assert(df.count() == 1)
    val urls = recordedUrls.toArray(Array.empty[String])
    assert(urls(0).contains("limit=100"))
    assert(urls(1).contains("limit=25"))
  }

  test("5xx retries then gives up empty after maxRetries") {
    recordedUrls.clear()
    val tr = new ScriptedTransport(Seq(HttpResponse(503, "")))
    val df = HttpSource.searchPapers(spark, Seq("q"),
      cfg.copy(maxRetries = 2), tr)
    assert(df.count() == 0)
    assert(recordedUrls.size == 3) // initial + 2 retries
  }

  test("references fetch follows cursor pagination and caps per paper") {
    val page1 = """{"data":[{"citedPaper":{"paperId":"r1"}},{"citedPaper":{"paperId":"r2"}}],"next":2}"""
    val page2 = """{"data":[{"citedPaper":{"paperId":"r3"}},{"citedPaper":{"paperId":null}}]}"""
    recordedUrls.clear()
    val tr = new ScriptedTransport(Seq(
      HttpResponse(200, page1), HttpResponse(200, page2)))
    val df = HttpSource.fetchReferences(spark, Seq("pX"), cfg, tr)
    val refs = df.collect()(0).getAs[scala.collection.Seq[String]]("reference_ids")
    assert(refs.toSeq == Seq("r1", "r2", "r3"))
    val urls = recordedUrls.toArray(Array.empty[String])
    assert(urls(0).contains("offset=0"))
    assert(urls(1).contains("offset=2"))

    val capped = HttpSource.fetchReferences(spark, Seq("pX"),
      cfg.copy(maxRefsPerPaper = 2),
      new ScriptedTransport(Seq(HttpResponse(200, page1), HttpResponse(200, page2))))
    assert(capped.collect()(0).getAs[scala.collection.Seq[String]]("reference_ids")
      .toSeq == Seq("r1", "r2"))
  }
}
