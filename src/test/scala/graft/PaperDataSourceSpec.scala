package graft

import graft.sources.HttpSource.HttpResponse
import graft.sources.v2.PaperDataSource
import org.apache.spark.sql.functions._

/** DSv2 source: schema, partition-per-term, and — the point — Catalyst
  * driving projection + limit pushdown into the HTTP request URL.
  */
class PaperDataSourceSpec extends SparkSpec {
  import HttpSourceSpec.ScriptedTransport

  private def paper(id: String) =
    s"""{"paperId":"$id","title":"T $id","abstract":"A","year":2020,
       |"citationCount":3,"influentialCitationCount":1,
       |"externalIds":{"DOI":"10.1/$id"},
       |"authors":[{"authorId":"a1","name":"Ada"}],
       |"references":[{"paperId":"r1"}],
       |"fieldsOfStudy":["CS"],"publicationTypes":["J"],
       |"tldr":{"text":"tl"},"openAccessPdf":{"url":"u"}}""".stripMargin

  private def reader(tid: String) = {
    spark.read.format("graft.sources.v2.PaperDataSource")
      .option("terms", "ml,ai")
      .option("transport", tid)
  }

  test("reads one partition per term with the full nested schema") {
    PaperDataSource.registerTransport("t1",
      new ScriptedTransport(Seq(HttpResponse(200, s"""{"data":[${paper("p1")},${paper("p2")}]}"""))))
    val df = reader("t1").load()
    assert(df.schema.fieldNames.contains("externalIds"))
    assert(df.rdd.getNumPartitions == 2)
    assert(df.count() == 4) // 2 papers per term x 2 terms
    assert(df.select("search_term").distinct().count() == 2)
  }

  test("column pruning shrinks the fields= list in the request URL") {
    HttpSourceSpec.recordedUrls.clear()
    PaperDataSource.registerTransport("t2",
      new ScriptedTransport(Seq(HttpResponse(200, s"""{"data":[${paper("p1")}]}"""))))
    val out = reader("t2").load().select("paperId", "title").collect()
    assert(out.nonEmpty)
    val url = HttpSourceSpec.recordedUrls.peek()
    assert(url.contains("fields=paperId,title"), s"unpruned url: $url")
    assert(!url.contains("abstract"))
  }

  test("limit pushdown rides as the request limit= param") {
    HttpSourceSpec.recordedUrls.clear()
    PaperDataSource.registerTransport("t3",
      new ScriptedTransport(Seq(HttpResponse(200, s"""{"data":[${paper("p1")}]}"""))))
    val out = reader("t3").load().select("paperId").limit(7).collect()
    assert(out.length >= 1)
    val url = HttpSourceSpec.recordedUrls.peek()
    assert(url.contains("limit=7"), s"limit not pushed: $url")
  }
}
