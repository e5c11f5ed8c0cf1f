package graft

import graft.operators.PortableAnn
import org.apache.spark.sql.functions._

/** Pins the properties that make q217/q218/q219's recall oracles sound:
  * the fixed-point pipeline must be EXECUTION-ORDER INVARIANT (else the
  * DuckDB restatement could diverge from Spark on a different partition
  * layout) and the approximate paths must degrade to exact search at
  * full probe width.
  */
class PortableAnnSpec extends SparkSpec {

  private lazy val corpus = spark.read.parquet(s"$sf/embeddings.parquet")
    .select(col("vec_id"), PortableAnn.quant(col("embedding")).as("qv"))

  test("codegen long dot/dist2 match the HOF forms exactly") {
    val pairs = corpus.limit(40).select(col("qv").as("a"))
      .crossJoin(corpus.limit(40).select(col("qv").as("b")))
    val diff = pairs.select(
        (PortableAnn.dotL(col("a"), col("b")) -
          PortableAnn.dotLHof(col("a"), col("b"))).as("dd"),
        (PortableAnn.dist2(col("a"), col("b")) -
          PortableAnn.dist2Hof(col("a"), col("b"))).as("dl"))
      .agg(sum(abs(col("dd"))), sum(abs(col("dl")))).head()
    assert(diff.getLong(0) == 0L && diff.getLong(1) == 0L)
  }

  test("pqCodes closure regime is bit-identical to the literal expression form") {
    val books = PortableAnn.pqTrain(corpus, "vec_id", "qv",
      m = 8, subDim = 8, k = 16, iters = 2)
    // 8×16 = 128 entries: pqCodes takes the closure-UDF branch; the
    // literal form is the oracle twin — every code must agree, including
    // on a short (ragged) vector where the trailing slices are empty and
    // on a NULL vector (both regimes: null codes, never cell 0)
    val ragged = corpus.limit(50)
      .union(corpus.limit(3).select(col("vec_id") + 100000L,
        slice(col("qv"), 1, 11)))
      .union(corpus.limit(1).select(col("vec_id") + 200000L,
        lit(null).cast("array<bigint>")))
    val both = ragged.select(col("vec_id"),
        PortableAnn.pqCodes(col("qv"), books, 8).as("hot"),
        PortableAnn.pqCodesLiteral(col("qv"), books, 8).as("lit"))
      .collect()
    both.foreach { r =>
      if (r.getLong(0) >= 200000L)
        assert(r.isNullAt(1) && r.isNullAt(2), s"null vec must yield null codes")
      else
        assert(r.getSeq[Int](1) == r.getSeq[Int](2), s"vec ${r.getLong(0)}")
    }
  }

  test("portable k-means is partition-order invariant") {
    val a = PortableAnn.train(corpus, "vec_id", "qv", k = 8, iters = 2)
    val b = PortableAnn.train(corpus.repartition(7), "vec_id", "qv",
      k = 8, iters = 2)
    assert(a.centroids.map(_.toSeq).toSeq === b.centroids.map(_.toSeq).toSeq)
  }

  test("ivfSearch at nprobe = k equals exhaustive top-k") {
    val model = PortableAnn.train(corpus, "vec_id", "qv", k = 8, iters = 2)
    val queries = corpus.filter(col("vec_id") < 5)
    val full = PortableAnn.ivfSearch(queries, corpus, "vec_id", "qv",
        model, nprobe = 8, topK = 5)
      .select("query_id", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exact = PortableAnn.exactTopK(queries, corpus, "vec_id", "qv", 5)
      .select("query_id", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(full === exact)
  }

  test("pq rerank at shortlist = corpus equals exhaustive top-k") {
    val books = PortableAnn.pqTrain(corpus, "vec_id", "qv",
      m = 8, subDim = 8, k = 16, iters = 2)
    val qvec = corpus.orderBy(col("vec_id")).limit(1)
      .select(col("qv")).head().getSeq[Long](0).toArray
    val rest = corpus.filter(col("vec_id") =!= 0L)
    val n = rest.count().toInt
    val full = PortableAnn.pqSearchWithRerank(rest, "vec_id", "qv",
        books, qvec, subDim = 8, shortlist = n, topK = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val exact = PortableAnn.exactTopK(
        corpus.filter(col("vec_id") === 0L), rest, "vec_id", "qv", 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(full === exact)
  }

  test("sq rerank at shortlist = corpus equals exhaustive top-k") {
    val (mins, deltas) = PortableAnn.sqTrain(corpus, "qv")
    val qvec = corpus.orderBy(col("vec_id")).limit(1)
      .select(col("qv")).head().getSeq[Long](0).toArray
    val rest = corpus.filter(col("vec_id") =!= 0L)
    val n = rest.count().toInt
    val full = PortableAnn.sqSearchWithRerank(rest, "vec_id", "qv",
        mins, deltas, qvec, shortlist = n, topK = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val exact = PortableAnn.exactTopK(
        corpus.filter(col("vec_id") === 0L), rest, "vec_id", "qv", 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(full === exact)
  }

  test("bq rerank at shortlist = corpus equals exhaustive top-k") {
    val (n0, sums) = PortableAnn.bqTrain(corpus, "qv")
    val qvec = corpus.orderBy(col("vec_id")).limit(1)
      .select(col("qv")).head().getSeq[Long](0).toArray
    val rest = corpus.filter(col("vec_id") =!= 0L)
    val n = rest.count().toInt
    val full = PortableAnn.bqSearchWithRerank(rest, "vec_id", "qv",
        n0, sums, qvec, shortlist = n, topK = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val exact = PortableAnn.exactTopK(
        corpus.filter(col("vec_id") === 0L), rest, "vec_id", "qv", 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(full === exact)
  }

  test("bqCode column matches driver-side bqPack bit for bit, incl. bit 63") {
    val (n, sums) = PortableAnn.bqTrain(corpus, "qv")
    val rows = corpus.limit(300)
      .select(col("vec_id"), col("qv"),
        PortableAnn.bqCode(col("qv"), n, sums).as("code"))
      .collect()
    rows.foreach { r =>
      val expected = PortableAnn.bqPack(r.getSeq[Long](1).toArray, n, sums)
      assert(r.getLong(2) === expected,
        s"vec ${r.getLong(0)}: column code ${r.getLong(2)} != pack $expected")
    }
    // bit 63 must actually be exercised (a negative code), or the
    // MinValue-addend edge the q237 oracle's CASE mirrors is untested
    assert(rows.exists(_.getLong(2) < 0L), "no vector set bit 63")
    // Hamming is bit_count(xor): zero on itself, symmetric, and equal
    // to the driver-side popcount on a sample pair
    val a = rows(0).getLong(2); val b = rows(1).getLong(2)
    import spark.implicits._
    val h = Seq((a, b)).toDF("a", "b")
      .select(PortableAnn.hamming(col("a"), col("b")).as("h"),
        PortableAnn.hamming(col("a"), col("a")).as("z"))
      .head()
    assert(h.getInt(0) === java.lang.Long.bitCount(a ^ b))
    assert(h.getInt(1) === 0)
  }

  test("sq codes clamp to [0,255] for vectors outside the trained range") {
    import spark.implicits._
    // train SQ on a SUBSET, then search a corpus holding vectors far
    // above and below the trained [mn, mn+Δ] — the clamp must keep the
    // shortlist scan well-defined and full-shortlist search still exact
    val (mins, deltas) = PortableAnn.sqTrain(corpus.filter(col("vec_id") < 100), "qv")
    val dim = mins.length
    val out = Seq(
      (9001L, Seq.fill(dim)(1000000L)),
      (9002L, Seq.fill(dim)(-1000000L)))
      .toDF("vec_id", "qv")
    val rest = corpus.filter(col("vec_id") =!= 0L && col("vec_id") < 200)
      .select(col("vec_id"), col("qv").cast("array<bigint>").as("qv"))
      .unionByName(out.select(col("vec_id"), col("qv").cast("array<bigint>").as("qv")))
    val qvec = corpus.orderBy(col("vec_id")).limit(1)
      .select(col("qv")).head().getSeq[Long](0).toArray
    val n = rest.count().toInt
    val full = PortableAnn.sqSearchWithRerank(rest, "vec_id", "qv",
        mins, deltas, qvec, shortlist = n, topK = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val exact = PortableAnn.exactTopK(
        corpus.filter(col("vec_id") === 0L), rest, "vec_id", "qv", 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(full === exact)
  }

  test("semdedup containment theorem: clustered drops ⊆ exhaustive drops") {
    // any within-cell cos≥τ lower-id neighbor is also a global one, so
    // the violation count is structurally zero — the q219 gate row's
    // n_violations=0 is a theorem, not a corpus accident
    val row = graft.queries.SimilarityQueries.defs
      .find(_.name == "q219_semdedup_containment").get
      .run(spark, sf).head()
    assert(row.getAs[Long]("n_violations") === 0L)
    assert(row.getAs[Long]("n_drops_clustered")
      <= row.getAs[Long]("n_drops_exhaustive"))
  }

  test("JL projection of basis vectors reads the sign matrix back") {
    import spark.implicits._
    val signs = PortableAnn.rpSigns(16, 64)
    // e_i scaled by 7 projects to 7 × (column i of the sign matrix)
    val basis = (0 until 64).map { i =>
      (i.toLong, Array.tabulate(64)(j => if (j == i) 7L else 0L))
    }.toDF("vec_id", "qv")
    val out = PortableAnn.rpProject(col("qv"), signs)
    basis.select(col("vec_id"), out.as("py")).collect().foreach { r =>
      val i = r.getLong(0).toInt
      val py = r.getSeq[Long](1)
      (0 until 16).foreach(j => assert(py(j) === 7L * signs(j)(i), s"($j,$i)"))
    }
  }

  test("JL distortion concentrates around 1 on the corpus pairs") {
    val rows = graft.queries.SimilarityQueries.defs
      .find(_.name == "q223_jl_distortion").get.run(spark, sf).collect()
    assert(rows.length === 190)
    val ds = rows.map(_.getAs[Long]("distortion_x1e6").toDouble / 1e6)
    val mean = ds.sum / ds.length
    // E[ratio] = 1; at 16 output dims the empirical mean should sit well
    // inside [0.7, 1.3] and no pair should collapse to 0 or blow past 4x
    assert(mean > 0.7 && mean < 1.3, s"mean distortion $mean")
    assert(ds.forall(d => d > 0.05 && d < 4.0), s"outlier in ${ds.min}..${ds.max}")
  }

  test("hard-example mining matches the hand-traced selection") {
    import spark.implicits._
    // 1-D quantized points with labels; anchor id0 (label 0, at 0):
    //   id1 label 0 at 100   id2 label 1 at 1   id3 label 1 at 50
    //   id4 label 0 at 2     id5 label 2 at 1  (tie with id2 → lower id)
    val base = Seq(
      (0L, Array(0L), 0), (1L, Array(100L), 0), (2L, Array(1L), 1),
      (3L, Array(50L), 1), (4L, Array(2L), 0), (5L, Array(1L), 2)
    ).toDF("vec_id", "qv", "label")
    val out = PortableAnn.hardExamples(base.filter(col("vec_id") === 0L),
        base, "vec_id", "qv", "label", negK = 2)
      .orderBy(col("kind"), col("rank"))
      .select("vec_id", "d2", "rank", "kind").as[(Long, Long, Long, String)]
      .collect()
    // negatives: id2 d2=1 (tie → beats id5), id5 d2=1; positive: id1
    // (d2=10000, farthest same-label — NOT the nearer id4)
    assert(out === Array((2L, 1L, 1L, "neg"), (5L, 1L, 2L, "neg"),
      (1L, 10000L, 1L, "pos")))
  }

  test("hard negatives are label-disjoint and distance-monotone on the corpus") {
    val rows = graft.queries.SimilarityQueries.defs
      .find(_.name == "q224_hard_negatives").get.run(spark, sf).collect()
    val anchors = rows.map(_.getAs[Long]("query_id")).distinct
    assert(anchors.length === 8)
    rows.foreach { r =>
      val neg = r.getAs[String]("kind") == "neg"
      assert((r.getAs[Int]("label") != r.getAs[Int]("anchor_label")) == neg)
    }
    anchors.foreach { a =>
      val negs = rows.filter(r => r.getAs[Long]("query_id") == a &&
        r.getAs[String]("kind") == "neg").sortBy(_.getAs[Long]("rank"))
      assert(negs.length === 5)
      val ds = negs.map(_.getAs[Long]("d2"))
      assert(ds.zip(ds.tail).forall { case (x, y) => x <= y })
    }
  }

  test("IVF hard negatives are wrong-label and q225 recall is their hit rate") {
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), PortableAnn.quant(col("embedding")).as("qv"),
        col("label"))
    val model = PortableAnn.train(base, "vec_id", "qv", k = 8, iters = 2)
    val anchors = base.filter(col("vec_id") < 8)
    val approx = PortableAnn.ivfHardNegatives(anchors, base, "vec_id", "qv",
      "label", model, nprobe = 3, negK = 5)
    val anchorLabels = anchors.collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    val labels = base.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    approx.collect().foreach { r =>
      assert(labels(r.getLong(1)) != anchorLabels(r.getLong(0)))
      assert(r.getLong(3) >= 1L && r.getLong(3) <= 5L)
    }
    val recall = graft.queries.SimilarityQueries.defs
      .find(_.name == "q225_hard_negative_recall").get.run(spark, sf).collect()
    assert(recall.length === 8)
    recall.foreach { r =>
      val hits = r.getAs[Long]("n_hits")
      assert(hits >= 0L && hits <= 5L)
      assert(r.getAs[Long]("recall_x1e6") === hits * 200000L)
    }
  }

  test("k-center coreset matches the hand-traced farthest-first walk") {
    import spark.implicits._
    // 1-D quantized points 0, 1, 10, 11, 30: seed id0, then 30 (d²=900),
    // then 11 (d²=121); after 3 centers the worst point is 10 (d²=1).
    val pts = Seq((0L, Array(0L)), (1L, Array(1L)), (2L, Array(10L)),
      (3L, Array(11L)), (4L, Array(30L))).toDF("vec_id", "qv")
    val got = graft.operators.DataSelection
      .kcenterCoreset(pts, "vec_id", "qv", k = 3)
      .orderBy("sel_rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq === Seq((1L, 0L, 0L, 900L), (2L, 4L, 900L, 121L),
      (3L, 3L, 121L, 1L)))
  }

  test("k-center argmax ties break to the lowest id") {
    import spark.implicits._
    val pts = Seq((0L, Array(0L)), (1L, Array(10L)), (2L, Array(-10L)))
      .toDF("vec_id", "qv")
    val got = graft.operators.DataSelection
      .kcenterCoreset(pts, "vec_id", "qv", k = 2)
      .orderBy("sel_rank").collect()
    assert(got(1).getLong(1) === 1L) // both at d²=100; id 1 < id 2
  }

  test("k-center coverage radius is exact and monotone on the corpus") {
    val corpus = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), PortableAnn.quant(col("embedding")).as("qv"))
    val sel = graft.operators.DataSelection
      .kcenterCoreset(corpus, "vec_id", "qv", k = 6)
      .orderBy("sel_rank").collect()
    val cov = sel.map(_.getAs[Long]("coverage_after"))
    assert(cov.sliding(2).forall(p => p(1) <= p(0)), "radius must shrink")
    // brute-force check of the final covering radius
    val centers = sel.map(_.getAs[Long]("vec_id")).toSet
    val rows = corpus.collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val cvecs = rows.filter(r => centers.contains(r._1)).map(_._2)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val brute = rows.map(r => cvecs.map(c => d2(r._2, c)).min).max
    assert(cov.last === brute)
  }
}
