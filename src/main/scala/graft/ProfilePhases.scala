package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (optimization rounds): phase-attributed timing of the big
  * index-lifecycle queries — replicates a query body with a stopwatch
  * around each imperative call so driver vs job time lands on the phase
  * that caused it. Usage: `runMain graft.ProfilePhases q242 [reps]`.
  */
object ProfilePhases {
  def main(args: Array[String]): Unit = {
    val which = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("lineitem", "orders", "documents", "embeddings", "events")
      .foreach(t => Tables(spark, sfDir, t).count())

    def ph[T](rep: Int, name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[phase] rep$rep $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    (1 to reps).foreach { rep =>
      val t0 = System.nanoTime()
      which match {
        case "q242" =>
          import graft.operators._
          val emb = Tables(spark, sfDir, "embeddings")
          val ds = spark.read.parquet(s"$sfDir/documents.parquet")
          val cand = ds.join(emb.select(col("vec_id")),
            col("doc_id") === col("vec_id"), "left_semi")
          val delIds = cand.filter(col("doc_id") % 97 === 13)
            .select(col("doc_id"))
          val bmDir = graft.Scratch.dir("q242_bm25")
          ph(rep, "bm25.writeIndex")(Bm25.writeIndex(
            cand.filter(col("doc_id") % 10 =!= 0), "doc_id", "text", bmDir))
          ph(rep, "bm25.append")(Bm25.appendToIndex(
            cand.filter(col("doc_id") % 10 === 0), "doc_id", "text", bmDir))
          ph(rep, "bm25.remove")(Bm25.removeFromIndex(delIds, "doc_id", bmDir))
          val corp = emb.join(ds.select(col("doc_id")),
              col("vec_id") === col("doc_id"), "left_semi")
            .select(col("vec_id"), PortableAnn.quant(col("embedding")).as("qv"))
          val bqDir = graft.Scratch.dir("q242_bq")
          ph(rep, "bq.writeIndex")(BqIndex.writeIndex(
            corp.filter(col("vec_id") % 10 =!= 0), "vec_id", "qv", bqDir))
          ph(rep, "bq.writeSegment")(BqIndex.writeSegment(
            corp.filter(col("vec_id") % 10 === 0), "vec_id", "qv", bqDir, 0L))
          ph(rep, "bq.remove")(BqIndex.removeFromIndex(
            delIds.select(col("doc_id").as("vec_id")), "vec_id", bqDir))
          val qv = corp.filter(col("vec_id") < 3)
            .select(concat(lit("s"), (col("vec_id") + 1).cast("string"))
              .as("vec_id"), col("qv"))
          val nLive = ph(rep, "nLive.count")(
            corp.join(delIds, col("vec_id") === col("doc_id"), "left_anti")
              .count().toInt)
          val bm25Queries = Seq(
            "s1" -> "fast hash join",
            "s2" -> "window sort merge",
            "s3" -> "stream filter vector")
          val res = ph(rep, "hybrid.search")(Hybrid.searchIndexed(
            spark, bmDir, bqDir, corp, qv, bm25Queries,
            "doc_id", "vec_id", "qv", kPerSide = 30, k = 10, shortlist = nLive))
          ph(rep, "final.count")(res.orderBy(col("query_id"), col("rank")).count())
        case "q232" =>
          import graft.operators._
          val all = spark.read.parquet(s"$sfDir/documents.parquet")
          val old = all.filter(col("doc_id") % 10 =!= 0)
          val base = graft.Scratch.dir("q232")
          val dir = s"$base/index"
          ph(rep, "writeDedupIndex")(DedupOps.writeDedupIndex(
            old.filter(col("doc_id") % 3 === 0), "doc_id", "text", 3, dir))
          val incDir = s"$base/increment"
          ph(rep, "incWrite")(
            old.filter(col("doc_id") % 3 =!= 0).select("doc_id", "text")
              .repartition(3).write.parquet(incDir))
          val stream = spark.readStream
            .schema(spark.read.parquet(incDir).schema)
            .option("maxFilesPerTrigger", "1").parquet(incDir)
          val q = graft.streaming.StreamingOps.streamDedupIndex(
            stream, "doc_id", "text", 3, dir, s"$base/ckpt")
          ph(rep, "stream")(q.processAllAvailable())
          q.stop()
          val res = ph(rep, "dedupAgainstIndex")(DedupOps.dedupAgainstIndex(
            spark, dir, all.filter(col("doc_id") % 10 === 0),
            "doc_id", "text", 3, 0.5))
          ph(rep, "final.count")(res.orderBy(col("doc_id")).count())
        case "q226" =>
          import graft.operators._
          val all = spark.read.parquet(s"$sfDir/documents.parquet")
          val dir = graft.Scratch.dir("q226_index")
          ph(rep, "writeDedupIndex")(DedupOps.writeDedupIndex(
            all.filter(col("doc_id") % 10 =!= 0), "doc_id", "text", 3, dir))
          val res = ph(rep, "dedupAgainstIndex")(DedupOps.dedupAgainstIndex(
            spark, dir, all.filter(col("doc_id") % 10 === 0),
            "doc_id", "text", 3, 0.5))
          ph(rep, "final.count")(res.orderBy(col("doc_id")).count())
        case "q231" =>
          import graft.operators._
          val all = spark.read.parquet(s"$sfDir/documents.parquet")
          val base = graft.Scratch.dir("q231")
          val dir = s"$base/index"
          ph(rep, "bm25.writeIndex")(Bm25.writeIndex(
            all.filter(col("doc_id") % 3 === 0), "doc_id", "text", dir))
          val incDir = s"$base/increment"
          ph(rep, "incWrite")(
            all.filter(col("doc_id") % 3 =!= 0).select("doc_id", "text")
              .repartition(3).write.parquet(incDir))
          val stream = spark.readStream
            .schema(spark.read.parquet(incDir).schema)
            .option("maxFilesPerTrigger", "1").parquet(incDir)
          val lsn = new org.apache.spark.sql.streaming.StreamingQueryListener {
            override def onQueryStarted(
                e: org.apache.spark.sql.streaming.StreamingQueryListener
                  .QueryStartedEvent): Unit = ()
            override def onQueryProgress(
                e: org.apache.spark.sql.streaming.StreamingQueryListener
                  .QueryProgressEvent): Unit =
              println(s"[stream] batch=${e.progress.batchId} " +
                s"rows=${e.progress.numInputRows} " +
                s"durations=${e.progress.durationMs}")
            override def onQueryTerminated(
                e: org.apache.spark.sql.streaming.StreamingQueryListener
                  .QueryTerminatedEvent): Unit = ()
          }
          spark.streams.addListener(lsn)
          val q = graft.streaming.StreamingOps.streamBm25Index(
            stream, "doc_id", "text", dir, s"$base/ckpt")
          ph(rep, "stream")(q.processAllAvailable())
          q.stop()
          spark.streams.removeListener(lsn)
          val bm25Queries = Seq(
            "s1" -> "fast hash join",
            "s2" -> "window sort merge",
            "s3" -> "stream filter vector")
          ph(rep, "topKIndexed")(Bm25.topKIndexed(
            spark, dir, "doc_id", bm25Queries, k = 10)
            .orderBy(col("query_id"), col("rank")).count())
        case other => sys.error(s"unknown phase profile: $other")
      }
      println(f"[phase] rep$rep TOTAL: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
