package graft

import graft.functions.VectorFns
import org.apache.spark.sql.functions._

class ExtensionsSpec extends SparkSpec {

  test("dot_product is callable from SQL and matches the Column API") {
    GraftExtensions.install(spark)
    Tables(spark, sf, "embeddings").createOrReplaceTempView("emb_view")
    val viaSql = spark.sql(
      "SELECT vec_id, dot_product(embedding, embedding) AS d FROM emb_view")
    val viaCol = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), VectorFns.dot(col("embedding"), col("embedding")).as("d"))
    assert(viaSql.exceptAll(viaCol).count() == 0)
    assert(viaCol.exceptAll(viaSql).count() == 0)
  }

  test("text functions are callable from SQL and match the Column API") {
    import graft.functions.TextFns
    GraftExtensions.install(spark)
    Tables(spark, sf, "documents").createOrReplaceTempView("docs_view")
    val viaSql = spark.sql(
      """SELECT doc_id, fingerprint(text) AS fp, language_id(text) AS lang,
        |token_count(text) AS n, quality_score(text) AS q
        |FROM docs_view""".stripMargin)
    val viaCol = Tables(spark, sf, "documents").select(col("doc_id"),
      TextFns.fingerprint(col("text")).as("fp"),
      TextFns.languageId(col("text")).as("lang"),
      TextFns.tokenCount(col("text")).as("n"),
      TextFns.qualityScore(col("text")).as("q"))
    assert(viaSql.exceptAll(viaCol).count() == 0)
    assert(viaCol.exceptAll(viaSql).count() == 0)
  }

  test("codegen shard expression matches the driver-side hash exactly (incl. non-ASCII)") {
    import spark.implicits._
    // layout-vs-pruning parity is THE invariant: the expression buckets
    // postings at build time, the driver's floorMod(hashCode, n) picks
    // the shards to read at query time — one divergent string breaks
    // partition pruning silently
    val strs = Seq("fast", "hash join", "", "a", "ümläut-ß", "日本語テキスト",
      "mixed 日本 ascii", "😀 emoji", "negctrl",
      "x" * 500)
    for (n <- Seq(7, 64, 256, 1600)) {
      val got = strs.toDF("s")
        .select(graft.functions.ShardExpr.javaHashMod(col("s"), n).as("h"))
        .collect().map(_.getInt(0)).toSeq
      assert(got == strs.map(s => math.floorMod(s.hashCode, n)), s"n=$n")
    }
    // and it stays inside whole-stage codegen (a local literal table
    // constant-folds away, so probe over a range-backed plan)
    val plan = spark.range(100)
      .select(graft.functions.ShardExpr.javaHashMod(
        concat(lit("t"), col("id").cast("string")), 64).as("h"))
      .queryExecution.executedPlan.toString
    // "*(n)" is the WholeStageCodegen marker in the executed-plan string;
    // a UDF here would plan an uncompiled plain Project instead
    assert(plan.contains("*(1) Project") && plan.contains("javahashmodexpr"),
      plan.take(1000))
  }

  test("opt-in rewrite turns exact count(DISTINCT) into HyperLogLog++") {
    GraftExtensions.install(spark)
    def q = Tables(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n"))
    val exact = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    spark.conf.set(graft.plans.ApproxCountDistinctRewrite.confKey, "true")
    try {
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("approx_count_distinct"), plan)
      val approx = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      exact.foreach { case (flag, n) =>
        assert(math.abs(approx(flag) - n) <= math.max(2L, (n * 0.1).toLong),
          s"$flag: exact=$n approx=${approx(flag)}")
      }
    } finally spark.conf.set(graft.plans.ApproxCountDistinctRewrite.confKey, "false")
  }

  test("HLL sketches re-aggregate: monthly sketches merged = direct quarterly count") {
    // The precompute-then-merge pattern for distinct counts at scale:
    // persist one small hll_sketch_agg blob per (month, key), answer any
    // coarser rollup later with hll_union_agg — no rescan of the raw
    // data. Spark's built-in DataSketches HLL is deterministic for a
    // given input set, so merged-vs-direct must agree EXACTLY, and both
    // sit within the sketch's error bound of the true count.
    val ev = Tables(spark, sf, "events")
      .withColumn("month", date_format(col("ts"), "yyyy-MM"))
    val monthly = ev.groupBy(col("month"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
    val merged = monthly
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .collect()(0).getLong(0)
    val direct = ev
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("est"))
      .collect()(0).getLong(0)
    val exact = ev.select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    assert(merged == direct, s"merge must be lossless: $merged vs $direct")
    assert(math.abs(merged - exact) <= math.max(3L, (exact * 0.05).toLong),
      s"estimate $merged vs exact $exact")
  }

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    import graft.operators.Relational
    // one hot key with 5k rows + long tail
    val left = ((1 to 5000).map(i => ("hot", i)) ++ (1 to 100).map(i => (s"k$i", i)))
      .toDF("k", "v")
    val right = (Seq("hot") ++ (1 to 100).map(i => s"k$i")).map(k => (k, k.length))
      .toDF("k", "w")
    val plain = left.join(right, "k")
    val salted = Relational.saltedJoin(left, right, "k", saltBuckets = 8)
    assert(salted.count() == plain.count())
    assert(salted.select("k", "v", "w").exceptAll(plain.select("k", "v", "w")).count() == 0)
  }

  test("PackExec node equals the mapPartitions packer and plans one exchange") {
    import graft.operators.DataSelection
    GraftExtensions.install(spark)
    import spark.implicits._
    val docs = (1L to 300L)
      .map(i => (i, Seq.fill((i % 61 + 1).toInt)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val viaExec = graft.plans.Packing
      .packSequences(docs, "doc_id", "text", budget = 48L, nShards = 4)
    val viaMap = DataSelection
      .packSequences(docs, "doc_id", "text", budget = 48L, nShards = 4)
    assert(viaExec.exceptAll(viaMap).count() == 0)
    assert(viaMap.exceptAll(viaExec).count() == 0)
    val p = viaExec.queryExecution.executedPlan.toString
    assert(p.contains("Pack 48"), p) // PackExec prints as "Pack <budget>"
    // EnsureRequirements plans exactly one shard exchange + sort
    assert("Exchange hashpartitioning\\(shard".r.findAllIn(p).size == 1, p)
  }

  test("PackExec adds NO exchange over an already shard-clustered child") {
    GraftExtensions.install(spark)
    import org.apache.spark.sql.GraftBridge
    import spark.implicits._
    val tok = (1L to 100L).map(i => (i % 4, f"o$i%04d", i, i % 9 + 1))
      .toDF("shard", "ord", "id", "nTok")
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "ord", "id")
    val packed = GraftBridge.ofRows(spark,
      graft.plans.PackPlan(GraftBridge.logicalPlan(tok), budget = 10L))
    val p = packed.queryExecution.executedPlan.toString
    // the child's explicit repartition is the ONLY exchange: the node's
    // required distribution/ordering are already satisfied, so
    // EnsureRequirements inserts nothing — the zero-new-shuffle claim
    assert("Exchange".r.findAllIn(p).size == 1, p)
    assert(packed.count() == 100L)
    // and its bins respect the budget
    val sums = packed.filter(col("bin") >= 0)
      .groupBy("shard", "bin").agg(sum("nTok").as("s"))
      .collect().map(_.getAs[Long]("s"))
    assert(sums.nonEmpty && sums.forall(_ <= 10L))
  }
}
