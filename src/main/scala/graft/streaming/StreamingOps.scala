package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.Partition

/** Structured Streaming re-expression of the reference's incremental
  * semantics (SURVEY.md §2.10):
  *  - T1 generator-based batch streaming of parquet
  *    (`utils/gcs_reader.py:173-217`) → file-source streaming with
  *    `maxFilesPerTrigger` / `Trigger.AvailableNow`;
  *  - T3 timestamped-append + downstream dedup → append-mode sink +
  *    `dropDuplicates` on the watermark key;
  *  - windowed aggregation with a watermark for late data (absent in the
  *    reference but required the moment ingestion streams).
  *
  * The transforms are the *same logical plans* as the batch operators in
  * `graft.operators.Sessionization` — one definition of the aggregation,
  * two execution modes; correctness of the streaming mode is asserted by
  * equality with the batch result in StreamingSpec.
  */
object StreamingOps {

  /** Streaming reader for an events-shaped parquet directory. The schema
    * must be supplied (streaming sources don't infer); epoch-nano `ts`
    * columns are normalized exactly like the batch loader.
    */
  def readEvents(spark: SparkSession, path: String, schema: StructType,
                 maxFilesPerTrigger: Int = 1): DataFrame = {
    val raw = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(path)
    if (schema.fields.exists(f => f.name == "ts" && f.dataType == LongType))
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }

  /** Tumbling-window aggregation with watermark — streaming twin of
    * `Sessionization.tumbling`.
    */
  def tumblingCounts(events: DataFrame, width: String,
                     watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width).getField("start").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).cast("long").as("n"),
        round(sum(col("value")), 2).as("sum_value"))

  /** Stream-deduplicated events (T3/T4 semantics: idempotent re-delivery). */
  def dedupedStream(events: DataFrame, watermark: String): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Drain a streaming query into an in-memory table and stop (test/dev
    * harness — production sinks write parquet with checkpointing).
    */
  def runToMemory(df: DataFrame, name: String, outputMode: String): DataFrame = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    df.sparkSession.table(name)
  }
}
