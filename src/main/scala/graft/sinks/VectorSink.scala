package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.util.LongAccumulator

/** Vector-store sink (reference K5, `embeddings/vector_store.py:33-91`):
  * push (id, vector, metadata) batches to an external vector database
  * through a pluggable client — the same foreachPartition shape as the
  * JDBC upsert (one client per partition, batched flushes, accumulator
  * stats). A Weaviate/pgvector/etc. client implements [[VectorClient]];
  * tests inject a fake.
  */
object VectorSink {

  /** One batch entry: id, dense vector, and the typed metadata columns. */
  final case class VectorRecord(id: String, vector: Array[Float],
                                meta: Map[String, String])

  /** Client factory must be serializable; the client itself is constructed
    * per partition (connection objects never cross the wire).
    */
  trait VectorClient {
    def insertBatch(records: Seq[VectorRecord]): Int // returns #accepted
    def close(): Unit = ()
  }

  final case class SinkStats(attempted: Long, accepted: Long)

  /** Write (idCol, vectorCol, metaCols*) to the vector store in batches. */
  def write(df: DataFrame, idCol: String, vectorCol: String,
            metaCols: Seq[String], makeClient: () => VectorClient,
            batchSize: Int = 100): SinkStats = {
    val spark = df.sparkSession
    val attempted: LongAccumulator = spark.sparkContext.longAccumulator("vec_attempted")
    val accepted: LongAccumulator = spark.sparkContext.longAccumulator("vec_accepted")
    val idIdx = df.columns.indexOf(idCol)
    val vecIdx = df.columns.indexOf(vectorCol)
    val metaIdx = metaCols.map(c => c -> df.columns.indexOf(c))
    df.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.nonEmpty) {
        val client = makeClient()
        try {
          rows.grouped(batchSize).foreach { batch =>
            val recs = batch.map { r =>
              VectorRecord(
                String.valueOf(r.get(idIdx)),
                r.getAs[scala.collection.Seq[Float]](vecIdx).toArray,
                metaIdx.map { case (c, i) => c -> String.valueOf(r.get(i)) }.toMap)
            }
            attempted.add(recs.size)
            accepted.add(client.insertBatch(recs))
          }
        } finally client.close()
      }
    }
    SinkStats(attempted.value, accepted.value)
  }
}
