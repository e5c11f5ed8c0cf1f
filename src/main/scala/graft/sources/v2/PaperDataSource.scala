package graft.sources.v2

import graft.sources.HttpSource
import graft.sources.HttpSource.{HttpTransport, SourceConfig}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util
import scala.jdk.CollectionConverters._

/** DataSource V2 front-end for the paper search source (SURVEY.md §4.3(a)):
  * `spark.read.format("graft.sources.v2.PaperDataSource")
  *   .option("terms", "ml,ai").load()`.
  *
  * What V2 buys over the mapPartitions source (`HttpSource.searchPapers`):
  * Catalyst drives *source-side* pushdown through the standard interfaces —
  *  - `SupportsPushDownRequiredColumns`: the pruned schema shrinks the
  *    `fields=` list in the HTTP request (the reference hand-rolled this
  *    projection pushdown, `semantic_scholar_client.py:23-29,44`);
  *  - `SupportsPushDownLimit`: `LIMIT n` rides as the request's `limit=`
  *    param (partial push — the per-term request cap; Spark still applies
  *    the global limit).
  *
  * One input partition per search term — partition count IS the request
  * concurrency cap (same rate-control stance as the mapPartitions source).
  * Transports are resolved from a JVM-static registry by the
  * `transport` option (options are string-only); the default is a plain
  * `java.net` GET.
  */
class PaperDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HttpSource.rawPaperSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new PaperTable(schema, properties.asScala.toMap)
}

object PaperDataSource {
  /** JVM-static transport registry (option values are strings only). */
  private val transports = new java.util.concurrent.ConcurrentHashMap[String, HttpTransport]()

  def registerTransport(id: String, t: HttpTransport): Unit = transports.put(id, t)

  def transportFor(id: Option[String]): HttpTransport =
    id.flatMap(i => Option(transports.get(i))).getOrElse(UrlTransport)

  /** Default transport: plain blocking GET (production path). */
  object UrlTransport extends HttpTransport {
    def get(url: String, headers: Map[String, String]): HttpSource.HttpResponse = {
      val conn = new java.net.URL(url).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      try {
        headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
        conn.setConnectTimeout(40000)
        conn.setReadTimeout(40000)
        val status = conn.getResponseCode
        val stream = if (status >= 400) conn.getErrorStream else conn.getInputStream
        val body =
          if (stream == null) ""
          else try scala.io.Source.fromInputStream(stream, "UTF-8").mkString
          finally stream.close()
        HttpSource.HttpResponse(status, body)
      } finally conn.disconnect()
    }
  }
}

class PaperTable(schema: StructType, props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = "semantic_scholar_papers"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PaperScanBuilder(schema, props ++ options.asScala)
}

class PaperScanBuilder(fullSchema: StructType, opts: Map[String, String])
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit {

  private var required: StructType = fullSchema
  private var limit: Int = opts.getOrElse("limit", "100").toInt

  override def pruneColumns(requiredSchema: StructType): Unit =
    // keep only fields we actually have; empty projections (count(*))
    // still need one field for row counting
    required =
      if (requiredSchema.fields.nonEmpty) requiredSchema
      else new StructType().add(fullSchema.fields.head)

  override def pushLimit(n: Int): Boolean = { limit = math.min(limit, n); true }
  override def isPartiallyPushed: Boolean = true // per-request cap, not global

  override def build(): Scan = new PaperScan(fullSchema, required, limit, opts)
}

class PaperScan(fullSchema: StructType, required: StructType, limit: Int,
                opts: Map[String, String]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    opts.getOrElse("terms", "")
      .split(",").map(_.trim).filter(_.nonEmpty)
      .map(t => PaperInputPartition(t): InputPartition)

  override def createReaderFactory(): PartitionReaderFactory =
    new PaperReaderFactory(fullSchema, required, limit,
      opts.get("transport"), opts.getOrElse("min_interval_ms", "0").toLong)
}

case class PaperInputPartition(term: String) extends InputPartition

class PaperReaderFactory(fullSchema: StructType, required: StructType,
                         limit: Int, transportId: Option[String],
                         minIntervalMs: Long)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val term = partition.asInstanceOf[PaperInputPartition].term
    new PartitionReader[InternalRow] {
      private var rows: Iterator[InternalRow] = _
      private var current: InternalRow = _

      private def fetch(): Iterator[InternalRow] = {
        val transport = PaperDataSource.transportFor(transportId)
        // projection pushdown: request only the pruned field list (the
        // engine-generated search_term column never goes on the wire)
        val apiFields = required.fieldNames.toSeq.filter(_ != "search_term")
        val cfg = SourceConfig(
          fields = if (apiFields.nonEmpty) apiFields else Seq("paperId"),
          limit = limit, minIntervalMs = minIntervalMs)
        val full = HttpSource.searchTermRows(transport, cfg, term)
        val idx = required.fieldNames.map(fullSchema.fieldIndex).toSeq
        val toInternal = GraftBridge.catalystConverter(required)
        full.iterator.map { row =>
          toInternal(org.apache.spark.sql.Row.fromSeq(idx.map(row.get)))
        }
      }

      override def next(): Boolean = {
        if (rows == null) rows = fetch()
        if (rows.hasNext) { current = rows.next(); true } else false
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
