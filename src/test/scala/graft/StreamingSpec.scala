package graft

import graft.operators.Sessionization
import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

class StreamingSpec extends SparkSpec {

  test("streaming tumbling counts equal the batch twin (complete mode)") {
    // schema as the streaming source sees the raw file (ts = epoch nanos)
    val rawSchema = new StructType()
      .add("event_id", LongType).add("ts", LongType)
      .add("user_id", LongType)
      .add("event_type", org.apache.spark.sql.types.StringType)
      .add("value", org.apache.spark.sql.types.DoubleType)
      .add("props", org.apache.spark.sql.types.StringType)
    // the file-stream source needs a directory: stage the single file
    val dir = java.nio.file.Files.createTempDirectory("graft-events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val stream = StreamingOps.readEvents(spark, dir.toString, rawSchema)
    val agg = StreamingOps.tumblingCounts(stream, "1 hour", "10 minutes")
    val streamed = StreamingOps.runToMemory(agg, "tumbling_out", "complete")
      .select("window_start", "event_type", "n", "sum_value")

    val batch = Sessionization.tumbling(
      Tables(spark, sf, "events"), "ts", "1 hour", Seq("event_type"), "value")

    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("streaming dedup drops re-delivered events within the watermark") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    Seq((1L, base, "click", 1.0), (1L, base, "click", 1.0), (2L, base, "view", 2.0))
      .toDF("event_id", "ts", "event_type", "value")
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val deduped = StreamingOps.dedupedStream(stream, "1 minute")
    val out = StreamingOps.runToMemory(deduped, "dedup_out", "append")
    assert(out.count() == 2)
  }
}
