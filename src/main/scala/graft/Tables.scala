package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet stage-table loader (reference: GCS folder-as-table scans,
  * `utils/gcs_reader.py:64-171` — replaced wholesale by Spark's parquet
  * source, which does listing, schema merge, column pruning and predicate
  * pushdown natively).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS), which Spark's parquet reader
    // rejects unless spark.sql.legacy.parquet.nanosAsLong=true (set by our
    // session builders). Under that conf the column arrives as epoch-nanos
    // Long; normalize to a true TimestampType here so downstream operators
    // see one type regardless of file encoding.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        // integer division: epoch-nanos overflow double precision, so
        // `ts / 1000` (double div) would be off by ±1 µs on some rows
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(TimestampNTZType) =>
        // plain timestamp[us] files arrive as TIMESTAMP_NTZ; session tz is
        // pinned to UTC, so the cast is value-preserving. Downstream
        // operators (unix_micros, watermarks) require TimestampType.
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
}
