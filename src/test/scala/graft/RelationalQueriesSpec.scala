package graft

import org.apache.spark.sql.functions._

class RelationalQueriesSpec extends SparkSpec {

  test("binned Lorenz Gini tracks the exact-rank Gini") {
    // q136 is q119's billions-of-keys path: 64 bins quantize the Lorenz
    // curve, so its Gini must sit within the bin-width error of the exact
    // ranked computation (and agree exactly on the key/event totals)
    def row(name: String) = SparkEntry.queries(name)(spark, sf).collect()(0)
    val exact = row("q119_skew_audit")
    val binned = row("q136_skew_audit_binned")
    assert(binned.getAs[Long]("n_keys") == exact.getAs[Long]("n_keys"))
    assert(binned.getAs[Long]("n_events") == exact.getAs[Long]("n_events"))
    val diff = math.abs(
      binned.getAs[Long]("gini_x1e6") - exact.getAs[Long]("gini_x1e6"))
    assert(diff <= 20000L, s"binned gini off by ${diff / 1e6}") // ≤0.02
  }

  test("shard export: stable shards under growth, contiguous positions, full coverage") {
    import org.apache.spark.sql.functions.col
    val docs = Tables(spark, sf, "documents")
    val full = operators.Relational.shardExport(docs, "doc_id", 16).collect()
    // every doc lands in exactly one shard
    assert(full.map(_.getLong(0)).toSet.size == full.length)
    assert(full.length == docs.count())
    // positions are 1..n within each shard
    full.groupBy(_.getLong(1)).values.foreach { g =>
      assert(g.map(_.getLong(2)).sorted.toSeq == (1L to g.length).toSeq)
    }
    // shard membership depends only on the doc's own hash: a subset corpus
    // assigns every common doc the same shard (stability under growth)
    val sub = operators.Relational
      .shardExport(docs.filter(col("doc_id") < 100), "doc_id", 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fullMap = full.map(r => r.getLong(0) -> r.getLong(1)).toMap
    sub.foreach { case (id, sh) => assert(fullMap(id) == sh) }
  }

  test("every registered query runs at sf0.001 and has stable columns") {
    QueryRegistry.all.foreach { q =>
      val df = q.run(spark, sf)
      val n = df.count()
      assert(n >= 0, s"${q.name} failed to execute")
      assert(df.columns.nonEmpty, s"${q.name} has no columns")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    val qk = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qk))
  }

  test("registered query names are unique (Map would silently drop dups)") {
    val names = QueryRegistry.all.map(_.name)
    assert(names.distinct.size == names.size,
      names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }.mkString(","))
  }

  test("q01 pricing summary: groups are distinct flag/status pairs") {
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sf)
    val n = df.count()
    assert(n == df.select("l_returnflag", "l_linestatus").distinct().count())
    assert(n > 0)
  }

  test("q06 dedup keep-first: one row per customer, earliest order survives") {
    val df = SparkEntry.queries("q06_dedup_keepfirst")(spark, sf)
    assert(df.groupBy("o_custkey").count().filter(col("count") > 1).count() == 0)
    val orders = Tables(spark, sf, "orders")
    val minDates = orders.groupBy("o_custkey")
      .agg(min("o_orderdate").as("min_date"))
    val joined = df.join(minDates, "o_custkey")
      .filter(col("o_orderdate") =!= col("min_date"))
    assert(joined.count() == 0, "survivor is not the earliest order")
  }

  test("q10 topk is ordered desc by sum_total") {
    val rows = SparkEntry.queries("q10_topk_customers")(spark, sf)
      .select("sum_total").collect().map(_.getDouble(0))
    assert(rows.sameElements(rows.sorted(Ordering[Double].reverse)))
    assert(rows.length == 10)
  }

  test("q08/q09 anti and semi join partition the dimension") {
    val cust = Tables(spark, sf, "customer")
    val anti = SparkEntry.queries("q08_anti_join")(spark, sf).count()
    val withOrders = Tables(spark, sf, "orders")
      .select("o_custkey").distinct().count()
    assert(anti + withOrders == cust.count())
  }

  test("binnedIntervalJoin matches the naive cross-join range filter") {
    import graft.operators.Relational
    val probe = Tables(spark, sf, "part").select(col("p_partkey"), col("p_retailprice"))
    val bands = Tables(spark, sf, "part").select(col("p_size")).distinct()
      .withColumn("lo", lit(898.0) + col("p_size") * 2.0)
      .withColumn("hi", col("lo") + 3.0 + (col("p_size") % 4) * 2.5)
    val binned = Relational.binnedIntervalJoin(probe, "p_retailprice", bands,
        "lo", "hi", binWidth = 5.0)
      .select("p_partkey", "p_size")
    val naive = probe.crossJoin(bands)
      .filter(col("p_retailprice") >= col("lo") && col("p_retailprice") <= col("hi"))
      .select("p_partkey", "p_size")
    assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty)
    // boundary values land in exactly one bin and still match inclusively
    import spark.implicits._
    val p2 = Seq((1L, 10.0), (2L, 15.0), (3L, 14.999999), (4L, 20.0))
      .toDF("id", "v")
    val b2 = Seq((100L, 10.0, 15.0), (200L, 15.0, 20.0)).toDF("band", "lo", "hi")
    val got = Relational.binnedIntervalJoin(p2, "v", b2, "lo", "hi", 5.0)
      .select("id", "band").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 100L), (2L, 100L), (2L, 200L), (3L, 100L), (4L, 200L)))
  }

  test("degree-oriented triangle count equals the naive a<b<c join on a skewed graph") {
    import spark.implicits._
    import graft.operators.GraphOps
    // deterministic pseudo-random graph with a heavy hub: node 0 links to
    // everyone, plus hash-scattered edges — the shape that breaks
    // un-oriented wedge counting
    val rnd = new scala.util.Random(42)
    val scattered = (1 to 400).map { _ =>
      val a = rnd.nextInt(60).toLong; val b = rnd.nextInt(60).toLong; (a, b)
    }
    val hub = (1 to 59).map(i => (0L, i.toLong))
    val edges = (scattered ++ hub).toDF("a", "b")
    val r = GraphOps.triangleCount(edges, "a", "b").collect()(0)
    val e = edges.select(least(col("a"), col("b")).as("x"),
        greatest(col("a"), col("b")).as("y"))
      .filter(col("x") =!= col("y")).distinct().cache()
    val naive = e.as("e1")
      .join(e.as("e2"), col("e2.x") === col("e1.x") && col("e2.y") > col("e1.y"))
      .join(e.as("e3"), col("e3.x") === col("e1.y") && col("e3.y") === col("e2.y"))
      .count()
    assert(r.getAs[Long]("n_triangles") == naive)
    assert(naive > 100) // the graph must actually exercise the path
  }

  test("windowed skyline equals the NOT-EXISTS dominance filter") {
    val parts = Tables(spark, sf, "part")
      .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
    val skyline = SparkEntry.queries("q115_skyline")(spark, sf)
      .select("p_partkey")
    val naive = parts.as("p").join(parts.as("q"),
        col("q.p_size") >= col("p.p_size") &&
          col("q.p_retailprice") <= col("p.p_retailprice") &&
          (col("q.p_size") > col("p.p_size") ||
            col("q.p_retailprice") < col("p.p_retailprice")), "left_anti")
      .select("p.p_partkey")
    assert(skyline.exceptAll(naive).isEmpty && naive.exceptAll(skyline).isEmpty)
  }

  test("bloom-pruned semi join is row-identical to the plain semi join") {
    import graft.operators.Relational
    val customer = Tables(spark, sf, "customer")
    val orders = Tables(spark, sf, "orders")
    val pruned = Relational.bloomPrunedSemiJoin(
      customer, "c_custkey", orders, "o_custkey", fpp = 0.05)
    val plain = customer.join(
      orders.select(col("o_custkey").as("c_custkey")), Seq("c_custkey"), "left_semi")
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("k-anonymity ladder: finer QI levels can only shrink classes") {
    val rows = SparkEntry.queries("q156_kanonymity")(spark, sf).collect()
      .map(r => r.getAs[String]("qi_level") -> r).toMap
    val full = rows("nation+segment")
    Seq("nation", "segment").foreach { coarse =>
      // generalizing (dropping a QI column) merges classes: fewer classes,
      // each at least as large
      assert(rows(coarse).getAs[Long]("n_classes") <= full.getAs[Long]("n_classes"))
      assert(rows(coarse).getAs[Long]("min_k") >= full.getAs[Long]("min_k"))
    }
    rows.values.foreach { r =>
      val f = r.getAs[Double]("frac_below_k10")
      assert(f >= 0.0 && f <= 1.0)
    }
  }

  test("temperature mixing flattens toward uniform without reordering sources") {
    val rows = SparkEntry.queries("q157_temperature_mix")(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("weight_x1e4")).sum
    assert(math.abs(total - 10000L) <= rows.length, s"weights sum to $total")
    // α<1 boosts the smallest share above proportional and caps the
    // largest below it
    val bySz = rows.sortBy(_.getAs[Long]("src_tokens"))
    assert(bySz.head.getAs[Long]("epochs_x1e4") >= 10000L)
    assert(bySz.last.getAs[Long]("epochs_x1e4") <= 10000L)
    // flattening is monotone: token order and weight order agree
    val ws = bySz.map(_.getAs[Long]("weight_x1e4"))
    assert(ws.zip(ws.tail).forall { case (a, b) => a <= b })
  }

  test("vocab growth curve is cumulative and lands on the exact totals") {
    val rows = SparkEntry.queries("q158_vocab_growth")(spark, sf).collect()
      .sortBy(_.getAs[Long]("checkpoint"))
    assert(rows.length == 8)
    Seq("cum_docs", "cum_tokens", "cum_vocab").foreach { c =>
      val v = rows.map(_.getAs[Long](c))
      assert(v.zip(v.tail).forall { case (a, b) => a <= b }, s"$c not monotone")
    }
    val docs = Tables(spark, sf, "documents")
    assert(rows.last.getAs[Long]("cum_docs") == docs.count())
    val vocab = docs.select(explode(array_distinct(
        regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)))))
      .distinct().count()
    assert(rows.last.getAs[Long]("cum_vocab") == vocab)
  }

  test("split-leakage matrix only reports cross-split near-dup pairs") {
    val rows = SparkEntry.queries("q159_split_leakage")(spark, sf).collect()
    val totalPairs = SparkEntry.queries("q24_ngram_jaccard")(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_leaked_pairs")).sum <= totalPairs)
    rows.foreach { r =>
      assert(r.getAs[String]("split_lo") < r.getAs[String]("split_hi"))
      val j = r.getAs[Double]("mean_jaccard")
      assert(j >= 0.5 && j <= 1.0)
    }
  }

  test("l-diversity summary matches a hand-built class table") {
    import spark.implicits._
    // nation 1: segments A,A,B (l=2, k=3); nation 2: C,C,C (l=1, k=3) —
    // nation-level: 2 classes, min_l 1, one class below l=3 contributing 3
    // of 6 rows; both classes are below l=3 at this tiny scale? no: l<3
    // catches BOTH (2 and 1) → 6 of 6 rows
    val df = Seq((1L, "A", 100.0), (1L, "A", 100.0), (1L, "B", 100.0),
      (2L, "C", 100.0), (2L, "C", 100.0), (2L, "C", 100.0))
      .toDF("c_nationkey", "c_mktsegment", "c_acctbal")
    val got = df
      .withColumn("balband", floor(col("c_acctbal") / 2000).cast("long"))
      .groupBy(col("c_nationkey"))
      .agg(countDistinct(col("c_mktsegment")).cast("long").as("l"),
        count(lit(1)).cast("long").as("k"))
      .agg(count(lit(1)).cast("long").as("n_classes"),
        min(col("l")).as("min_l"),
        sum(when(col("l") < 3, col("k")).otherwise(0L)).cast("long")
          .as("rows_below_l3"))
      .head()
    assert(got.getAs[Long]("n_classes") == 2L)
    assert(got.getAs[Long]("min_l") == 1L)
    assert(got.getAs[Long]("rows_below_l3") == 6L)
  }

  test("hashSampleEstimate: portable membership, exact HT arithmetic") {
    import spark.implicits._
    val df = (1 to 400).map(i => (i.toLong, if (i % 2 == 0) "even" else "odd",
      (i % 7).toDouble)).toDF("k", "grp", "v")
    val got = operators.Profiling.hashSampleEstimate(df,
      col("k").cast("string"), "grp", "v", permille = 100)
      .collect().map(r => r.getString(0) -> r).toMap
    // membership recomputed independently: md5 low 16 bits (signed-long
    // bit slice of the md5_number_lower convention) mod 1000 < 100
    def in(k: Long): Boolean =
      (operators.DedupOps.md5Low64Token(k.toString) & 0xFFFFL) % 1000L < 100L
    for (g <- Seq("even", "odd")) {
      val rows = (1 to 400).filter(i =>
        (if (i % 2 == 0) "even" else "odd") == g)
      val expSample = rows.filter(i => in(i.toLong))
      val r = got(g)
      assert(r.getAs[Long]("n_exact") == rows.length.toLong)
      assert(r.getAs[Long]("n_sample") == expSample.length.toLong, g)
      assert(r.getAs[Double]("sum_exact") == rows.map(i => (i % 7).toDouble).sum)
      assert(r.getAs[Double]("est_sum") ==
        BigDecimal(expSample.map(i => (i % 7).toDouble).sum * 10.0)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble, g)
    }
  }
}
