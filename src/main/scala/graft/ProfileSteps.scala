package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (optimization rounds): sub-step timing INSIDE the dedup/bm25
  * index builds — replicates the operator bodies step by step so the
  * expensive pass is identified before any restructure (guide §1).
  * Usage: `runMain graft.ProfileSteps dedupBuild|bm25Build [reps]`.
  */
object ProfileSteps {
  def main(args: Array[String]): Unit = {
    val which = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
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
    import graft.functions.TextFns
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    docs0.count()

    def ph[T](rep: Int, name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[step] rep$rep $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    (1 to reps).foreach { rep =>
      which match {
        case "dedupBuild" =>
          val docs = docs0.filter(col("doc_id") % 10 =!= 0)
          val dir = graft.Scratch.dir("steps_dedup")
          val nShards = 256
          val shardCol =
            graft.functions.ShardExpr.javaHashMod(col("shingle"), nShards)
          val rows = graft.operators.DedupOps
            .shingleArrays(docs, "doc_id", "text", 3)
            .select(col("doc_id"), size(col("__shingles")).cast("long").as("sz"),
              explode(col("__shingles")).as("shingle"))
            .withColumn("shard", shardCol)
          ph(rep, "probe.isEmpty")(
            graft.operators.DedupOps.shingles(docs, "doc_id", "text", 3).isEmpty)
          ph(rep, "postings.noop")(
            rows.write.format("noop").mode("overwrite").save())
          ph(rep, "postings.clustered.write")(
            rows.repartition(col("shard")).write.mode("overwrite")
              .partitionBy("shard").parquet(s"$dir/shingles"))
          ph(rep, "postings.unpart.write")(
            rows.write.mode("overwrite").parquet(s"$dir/shingles_unpart"))
          ph(rep, "fingerprints.write")(
            docs.select(col("doc_id"),
              TextFns.fingerprint(col("text")).as("__fp"))
            .distinct().write.mode("overwrite").parquet(s"$dir/fingerprints"))
          ph(rep, "postings.clustered.sorted.write")(
            rows.repartition(col("shard")).sortWithinPartitions("shard")
              .write.mode("overwrite")
              .partitionBy("shard").parquet(s"$dir/shingles_v2"))
          spark.sparkContext.hadoopConfiguration
            .set("mapreduce.fileoutputcommitter.algorithm.version", "2")
          ph(rep, "postings.clustered.write.committerV2")(
            rows.repartition(col("shard")).write.mode("overwrite")
              .partitionBy("shard").parquet(s"$dir/shingles_v3"))
          spark.sparkContext.hadoopConfiguration
            .set("mapreduce.fileoutputcommitter.algorithm.version", "1")
          ph(rep, "postings.64shard.write")(
            graft.operators.DedupOps
              .shingleArrays(docs, "doc_id", "text", 3)
              .select(col("doc_id"),
                size(col("__shingles")).cast("long").as("sz"),
                explode(col("__shingles")).as("shingle"))
              .withColumn("shard",
                graft.functions.ShardExpr.javaHashMod(col("shingle"), 64))
              .repartition(col("shard")).write.mode("overwrite")
              .partitionBy("shard").parquet(s"$dir/shingles_v4"))
        case "bm25Build" =>
          val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
          val ds = docs0
          val cand = ds.join(emb.select(col("vec_id")),
            col("doc_id") === col("vec_id"), "left_semi")
          val docs = cand.filter(col("doc_id") % 10 =!= 0)
          val dir = graft.Scratch.dir("steps_bm25")
          val nShards = 64
          val shardCol =
            graft.functions.ShardExpr.javaHashMod(col("term"), nShards)
          val unclustered = docs
            .select(col("doc_id"), TextFns.words(col("text")).as("__toks"))
            .select(col("doc_id"),
              size(col("__toks")).cast("long").as("doc_len"),
              explode(col("__toks")).as("term"))
            .groupBy(col("doc_id"), col("doc_len"), col("term"))
            .agg(count(lit(1)).cast("double").as("tf"))
            .withColumn("shard", shardCol)
          ph(rep, "probe.isEmpty")(
            docs.select(explode(TextFns.words(col("text"))).as("__t")).isEmpty)
          ph(rep, "postings.write")(
            unclustered.repartition(col("shard")).write.mode("overwrite")
              .partitionBy("shard").parquet(s"$dir/postings"))
          ph(rep, "stats.write")(
            docs.agg(count(lit(1)).cast("double").as("n"),
              avg(size(TextFns.words(col("text")))).as("avgdl"),
              coalesce(sum(size(TextFns.words(col("text")))).cast("double"),
                lit(0.0)).as("sum_len"),
              count(size(TextFns.words(col("text")))).cast("double").as("n_len"))
            .withColumn("tomb_dirs", typedLit(Seq.empty[String]))
            .write.mode("overwrite").parquet(s"$dir/stats"))
          ph(rep, "sidecar.write")(
            docs.select(col("doc_id"),
              size(TextFns.words(col("text"))).cast("long").as("doc_len"))
            .write.mode("overwrite").parquet(s"$dir/docs"))
          val dl = docs.select(col("doc_id"),
            size(TextFns.words(col("text"))).cast("long").as("doc_len")).cache()
          ph(rep, "dl.cache+stats")(
            dl.agg(count(lit(1)).cast("double"),
              coalesce(sum(col("doc_len")).cast("double"), lit(0.0)),
              count(col("doc_len")).cast("double")).head())
          ph(rep, "sidecar.from.dl")(
            dl.write.mode("overwrite").parquet(s"$dir/docs2"))
          dl.unpersist()
        case "q23steps" =>
          import graft.operators.DedupOps
          val docs = docs0
          val sh = DedupOps.shingles(docs, "doc_id", "text", 3).cache()
          ph(rep, "sh.count")(sh.count())
          val sigs = DedupOps.minhashSignatures(sh, "doc_id", 32)
          ph(rep, "sigs.noop")(
            sigs.write.format("noop").mode("overwrite").save())
          val cands0 = DedupOps.prefixCandidates(sh, "doc_id", 0.5)
          ph(rep, "prefixCands.count")(cands0.count())
          val cands = cands0.distinct().cache()
          ph(rep, "cands.distinct.count")(cands.count())
          ph(rep, "full.q23")(
            DedupOps.minhashLshPairs(docs, "doc_id", "text", 3, 0.5,
              32, 16, exactRecallGuard = true).count())
          // verifyCandidates internals, inlined (broadcast regime)
          val candDocs = cands.select(col("id_a").as("doc_id"))
            .union(cands.select(col("id_b").as("doc_id"))).distinct()
          val candSh = sh.join(broadcast(candDocs), Seq("doc_id"), "left_semi")
          val nSh = ph(rep, "verify.nShingles.count")(candSh.count())
          println(s"[step] rep$rep nShingles=$nSh cands=" + cands.count())
          val local = ph(rep, "verify.collect.map")(
            candSh.groupBy(col("doc_id").cast("string").as("doc_id"))
              .agg(sort_array(collect_list(col("shingle"))).as("set"))
              .collect()
              .map(r => r.getString(0) -> r.getSeq[String](1).toArray)
              .toMap)
          val bc = spark.sparkContext.broadcast(local)
          val stats = udf { (a: String, b: String) =>
            val x = bc.value(a); val y = bc.value(b)
            var i = 0; var j = 0; var c = 0L
            while (i < x.length && j < y.length) {
              val cmp = x(i).compareTo(y(j))
              if (cmp == 0) { c += 1; i += 1; j += 1 }
              else if (cmp < 0) i += 1 else j += 1
            }
            (c, x.length.toLong, y.length.toLong)
          }
          ph(rep, "verify.udf.pass")(
            cands.withColumn("__st",
                stats(col("id_a").cast("string"), col("id_b").cast("string")))
              .filter(col("__st._1") > 0).count())
          bc.destroy()
          sh.unpersist(); cands.unpersist()
        case "q121steps" =>
          // q121's co-purchase edge build + kCore, timed separately
          val lp = spark.read.parquet(s"$sfDir/lineitem.parquet")
            .select(col("l_orderkey"), col("l_partkey")).distinct()
          val edges = lp.groupBy(col("l_orderkey"))
            .agg(collect_set(col("l_partkey")).as("ps"))
            .select(explode(expr(
              "filter(flatten(transform(ps, x -> transform(ps, y -> struct(x, y))))," +
                " p -> p.x < p.y)")).as("p"))
            .select(col("p.x").as("x"), col("p.y").as("y"))
            .distinct()
          ph(rep, "edges.noop")(
            edges.write.format("noop").mode("overwrite").save())
          ph(rep, "kcore.full")(
            graft.operators.GraphOps.kCore(edges, "x", "y", 80).count())
        case "tables" =>
          // driver-side construction cost of Tables() (listing + footer
          // schema read), amortized over 50 calls
          val t0 = System.nanoTime()
          (1 to 50).foreach { _ =>
            Tables(spark, sfDir, "lineitem")
            Tables(spark, sfDir, "documents")
          }
          println(f"[step] rep$rep tables.construct.100: ${(System.nanoTime() - t0) / 1e9}%.3f s")
          val t1 = System.nanoTime()
          (1 to 50).foreach { _ =>
            Tables(spark, sfDir, "lineitem").filter(col("l_orderkey") > 0)
              .count()
          }
          println(f"[step] rep$rep tables.count.50: ${(System.nanoTime() - t1) / 1e9}%.3f s")
        case other => sys.error(s"unknown: $other")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
