package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Rate-limited HTTP paper source — the Spark-first re-expression of the
  * reference's Semantic Scholar client (SURVEY.md §2.1 S1-S6;
  * `Ingestion/semantic_scholar_client.py`). Behavior re-implemented from
  * observed semantics, not ported:
  *
  *  - projection pushdown: the requested field list rides in the request
  *    (`fields=` query param) — the source-side analog of column pruning
  *    (`semantic_scholar_client.py:23-29,44`);
  *  - limit pushdown + renegotiation: `limit=` in the URL; on a 400 whose
  *    body names a smaller acceptable limit, retry with it
  *    (`semantic_scholar_client.py:53-66`);
  *  - 429 exponential backoff `min(base·2^attempt, cap)`
  *    (`semantic_scholar_client.py:141-144`), 5xx retry;
  *  - cursor pagination for references (S5, `semantic_scholar_client.py:334-438`);
  *  - per-partition rate limiting + API-key rotation — the distributed
  *    replacement for the reference's global semaphores: cap the number of
  *    partitions to cap global request concurrency, one limiter per
  *    partition (SURVEY.md §7.5 risk 7).
  *
  * All I/O goes through [[HttpTransport]], so the engine's correctness path
  * never depends on a live service (tests inject canned responses — same
  * strategy as the reference's mocked unit suite).
  */
object HttpSource {

  final case class HttpResponse(status: Int, body: String)

  /** Pluggable transport; implementations must be Serializable (shipped to
    * executors inside mapPartitions).
    */
  trait HttpTransport extends Serializable {
    def get(url: String, headers: Map[String, String]): HttpResponse
  }

  /** Blocking token-interval limiter (one per partition). `sleeper` is
    * injectable so tests don't wait.
    */
  final class RateLimiter(minIntervalMs: Long, sleeper: Long => Unit = Thread.sleep)
      extends Serializable {
    private var last = 0L
    def acquire(): Unit = {
      val now = System.nanoTime() / 1000000
      val wait = last + minIntervalMs - now
      if (wait > 0) sleeper(wait)
      last = math.max(now, last + minIntervalMs)
    }
  }

  final case class SourceConfig(
      baseUrl: String = "https://api.semanticscholar.org/graph/v1",
      fields: Seq[String] = Seq("paperId", "title", "abstract", "year",
        "citationCount", "influentialCitationCount", "externalIds", "authors",
        "references", "fieldsOfStudy", "publicationTypes", "tldr",
        "openAccessPdf"),
      limit: Int = 100,
      apiKeys: Seq[String] = Nil,
      maxRetries: Int = 5,
      backoffBaseMs: Long = 10000,
      backoffCapMs: Long = 60000,
      minIntervalMs: Long = 1000,
      maxRefsPerPaper: Int = 50,
      pageSize: Int = 100,
      maxParallelPartitions: Int = 4,
      sleeper: Long => Unit = Thread.sleep)

  /** Raw-paper schema as returned by the search endpoint (nested — the flat
    * projection is `MetadataProjection`'s job).
    */
  val rawPaperSchema: StructType = new StructType()
    .add("paperId", StringType)
    .add("title", StringType)
    .add("abstract", StringType)
    .add("year", IntegerType)
    .add("citationCount", IntegerType)
    .add("influentialCitationCount", IntegerType)
    .add("externalIds", MapType(StringType, StringType))
    .add("authors", ArrayType(new StructType()
      .add("authorId", StringType).add("name", StringType)))
    .add("references", ArrayType(new StructType()
      .add("paperId", StringType)))
    .add("fieldsOfStudy", ArrayType(StringType))
    .add("publicationTypes", ArrayType(StringType))
    .add("tldr", new StructType().add("text", StringType))
    .add("openAccessPdf", new StructType().add("url", StringType))
    .add("search_term", StringType)

  def searchUrl(cfg: SourceConfig, term: String, limit: Int): String = {
    val enc = java.net.URLEncoder.encode(term, "UTF-8")
    s"${cfg.baseUrl}/paper/search?query=$enc&limit=$limit&fields=${cfg.fields.mkString(",")}"
  }

  private val limitRe = "(?i)limit[^0-9]*([0-9]+)".r

  /** One GET with the reference's retry ladder. Returns the body, or None
    * after exhausting retries.
    */
  private[sources] def getWithRetry(transport: HttpTransport, cfg: SourceConfig,
      limiter: RateLimiter, key: Option[String], mkUrl: Int => String,
      limit0: Int): Option[String] = {
    var attempt = 0
    var limit = limit0
    val headers = key.map(k => Map("x-api-key" -> k)).getOrElse(Map.empty)
    while (attempt <= cfg.maxRetries) {
      limiter.acquire()
      val resp = transport.get(mkUrl(limit), headers)
      resp.status match {
        case 200 => return Some(resp.body)
        case 429 =>
          cfg.sleeper(math.min(cfg.backoffBaseMs * (1L << attempt), cfg.backoffCapMs))
        case 400 =>
          // limit renegotiation: server names an acceptable smaller limit
          limitRe.findFirstMatchIn(resp.body) match {
            case Some(m) if m.group(1).toInt < limit => limit = m.group(1).toInt
            case _ => return None
          }
        case s if s >= 500 =>
          // transient: back off like the 429 path (the reference client
          // sleeps before every retry, keyed or not)
          cfg.sleeper(math.min(cfg.backoffBaseMs * (1L << attempt), cfg.backoffCapMs))
        case _ => return None
      }
      attempt += 1
    }
    None
  }

  private def parsePapers(mapper: ObjectMapper, body: String): Seq[JsonNode] = {
    val root = mapper.readTree(body)
    val data = root.path("data")
    if (data.isArray) data.elements().asScala.toSeq else Seq.empty
  }

  private def jsonToRow(n: JsonNode, term: String): Row = {
    def str(f: String): String = { val v = n.path(f); if (v.isMissingNode || v.isNull) null else v.asText }
    def int(f: String): Integer = { val v = n.path(f); if (v.isMissingNode || v.isNull) null else Integer.valueOf(v.asInt) }
    def strArr(f: String): Seq[String] = {
      val v = n.path(f)
      if (v.isArray) v.elements().asScala.map(e => if (e.isNull) null else e.asText).toSeq else null
    }
    val ext = { val v = n.path("externalIds")
      if (v.isObject) v.properties().asScala.map(e => e.getKey -> e.getValue.asText).toMap else null }
    val authors = { val v = n.path("authors")
      if (v.isArray) v.elements().asScala.map(a =>
        Row(a.path("authorId").asText(null), a.path("name").asText(null))).toSeq else null }
    val refs = { val v = n.path("references")
      if (v.isArray) v.elements().asScala.map(r =>
        Row(r.path("paperId").asText(null))).toSeq else null }
    val tldr = { val v = n.path("tldr")
      if (v.isObject) Row(v.path("text").asText(null)) else null }
    val pdf = { val v = n.path("openAccessPdf")
      if (v.isObject) Row(v.path("url").asText(null)) else null }
    Row(str("paperId"), str("title"), str("abstract"), int("year"),
      int("citationCount"), int("influentialCitationCount"), ext, authors,
      refs, strArr("fieldsOfStudy"), strArr("publicationTypes"), tldr, pdf, term)
  }

  /** Fetch + parse one term's search results (shared by the mapPartitions
    * source and the DataSource V2 reader).
    */
  def searchTermRows(transport: HttpTransport, cfg: SourceConfig,
                     term: String): Seq[Row] = {
    val mapper = new ObjectMapper()
    val limiter = new RateLimiter(cfg.minIntervalMs, cfg.sleeper)
    val key = cfg.apiKeys.headOption
    getWithRetry(transport, cfg, limiter, key,
      l => searchUrl(cfg, term, l), cfg.limit)
      .map(parsePapers(mapper, _)).getOrElse(Seq.empty)
      .map(jsonToRow(_, term))
  }

  /** S1/S2: search — one request per term, distributed over at most
    * `maxParallelPartitions` partitions (global rate = partitions ×
    * 1/minInterval, mirroring the reference's adaptive concurrency).
    */
  def searchPapers(spark: SparkSession, terms: Seq[String], cfg: SourceConfig,
                   transport: HttpTransport): DataFrame = {
    import spark.implicits._
    val nPart = math.max(1, math.min(cfg.maxParallelPartitions, terms.size))
    val termDs = spark.createDataset(terms).repartition(nPart)
    val keys = cfg.apiKeys
    termDs.mapPartitions { it =>
      val mapper = new ObjectMapper()
      val limiter = new RateLimiter(cfg.minIntervalMs, cfg.sleeper)
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val key = if (keys.nonEmpty) Some(keys(pid % keys.size)) else None
      it.flatMap { term =>
        getWithRetry(transport, cfg, limiter, key,
          l => searchUrl(cfg, term, l), cfg.limit)
          .map(parsePapers(mapper, _)).getOrElse(Seq.empty)
          .map(jsonToRow(_, term))
      }
    }(Encoders.row(rawPaperSchema)).toDF()
  }

  /** S3/S4: fetch full records for an id set — one GET per id, batched per
    * partition with the shared retry ladder, key rotation and rate limit
    * (the reference's semaphore-bounded fan-out, re-expressed as partition
    * parallelism).
    */
  def fetchPapersByIds(spark: SparkSession, paperIds: Seq[String],
                       cfg: SourceConfig, transport: HttpTransport): DataFrame = {
    import spark.implicits._
    val nPart = math.max(1, math.min(cfg.maxParallelPartitions, paperIds.size))
    val keys = cfg.apiKeys
    val ids = spark.createDataset(paperIds).repartition(nPart)
    ids.mapPartitions { it =>
      val mapper = new ObjectMapper()
      val limiter = new RateLimiter(cfg.minIntervalMs, cfg.sleeper)
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val key = if (keys.nonEmpty) Some(keys(pid % keys.size)) else None
      it.flatMap { id =>
        val url = s"${cfg.baseUrl}/paper/$id?fields=${cfg.fields.mkString(",")}"
        getWithRetry(transport, cfg, limiter, key, _ => url, cfg.limit)
          .map(body => jsonToRow(mapper.readTree(body), null))
      }
    }(Encoders.row(rawPaperSchema)).toDF()
  }

  /** S5/S6: paginated references per paper id →
    * Dataset[(paperId, Array[refId])], cursor-paged with a per-paper cap.
    */
  def fetchReferences(spark: SparkSession, paperIds: Seq[String],
                      cfg: SourceConfig, transport: HttpTransport): DataFrame = {
    import spark.implicits._
    val nPart = math.max(1, math.min(cfg.maxParallelPartitions, paperIds.size))
    val keys = cfg.apiKeys
    val ids = spark.createDataset(paperIds).repartition(nPart)
    ids.mapPartitions { it =>
      val mapper = new ObjectMapper()
      val limiter = new RateLimiter(cfg.minIntervalMs, cfg.sleeper)
      val pid0 = org.apache.spark.TaskContext.getPartitionId()
      val key = if (keys.nonEmpty) Some(keys(pid0 % keys.size)) else None
      it.map { id =>
        val refs = scala.collection.mutable.ArrayBuffer.empty[String]
        var offset: Option[Int] = Some(0)
        while (offset.isDefined && refs.size < cfg.maxRefsPerPaper) {
          val cur = offset.get
          val url = s"${cfg.baseUrl}/paper/$id/references?offset=$cur&limit=${cfg.pageSize}"
          getWithRetry(transport, cfg, limiter, key, _ => url, cfg.pageSize) match {
            case Some(body) =>
              val root = mapper.readTree(body)
              root.path("data").elements().asScala.foreach { e =>
                val pid = e.path("citedPaper").path("paperId")
                if (!pid.isMissingNode && !pid.isNull) refs += pid.asText
              }
              val next = root.path("next")
              // progress guard: a non-advancing cursor would loop forever
              offset =
                if (next.isMissingNode || next.isNull || next.asInt <= cur) None
                else Some(next.asInt)
            case None => offset = None
          }
        }
        (id, refs.distinct.take(cfg.maxRefsPerPaper).toSeq)
      }
    }.toDF("paperId", "reference_ids")
  }
}
