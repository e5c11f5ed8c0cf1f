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

  /** Per-(session, dir, table) memo of the CONSTRUCTED DataFrame — a
    * catalog, not a cache: a DataFrame is a lazy logical plan, so every
    * action on it still scans the parquet files in full (no rows, no
    * intermediates, no results are stored — `CACHE TABLE` this is not).
    * What the memo skips is the per-call DRIVER metadata work
    * `spark.read.parquet` redoes from scratch: directory listing and
    * footer schema inference, measured ~50 ms per call — at 242 queries
    * × 3 reps × 2-4 table refs per query, ~60-90 s of serial driver
    * time per bench sweep for byte-identical metadata. This is exactly
    * what a metastore/catalog table provides in production (list and
    * infer once, plan many); the test corpus is immutable for the life
    * of a session, which is the one assumption a catalog also makes
    * (files changing under a registered table need a refresh there too).
    */
  private val catalog =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String),
      DataFrame]()

  /** Contexts whose end-of-application eviction hook is registered —
    * entries for a stopped session are dropped (the memo would otherwise
    * retain every stopped session and its plans for process lifetime in
    * multi-session test runs). Sessions sharing one context evict
    * together when the context stops, which is when their plans die
    * anyway.
    */
  private val hooked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[org.apache.spark.SparkContext]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val sc = spark.sparkContext
    if (hooked.add(sc))
      sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
          hooked.remove(sc)
          catalog.keySet.removeIf(_._1.sparkContext eq sc)
        }
      })
    catalog.computeIfAbsent((spark, dir, name),
      _ => build(spark, dir, name))
  }

  /** Drop every memoized entry — the refresh hook for a caller that
    * changed files under a registered dir mid-session (the memo, like a
    * metastore table, otherwise assumes an immutable corpus per session).
    */
  def invalidate(): Unit = catalog.clear()

  private def build(spark: SparkSession, dir: String,
                    name: String): DataFrame = {
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
