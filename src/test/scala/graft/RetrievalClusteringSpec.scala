package graft

import graft.operators.{DataSelection, DedupOps, KMeansOps, Profiling, Similarity}
import org.apache.spark.sql.functions._

/** Round-4 additions: token-budget fill, RRF hybrid fusion, Lloyd's
  * k-means, filter-attrition funnel. The corpus-scale behavior of each is
  * oracle-checked (q161-q164); these specs pin the edge semantics the
  * oracles can't reach.
  */
class RetrievalClusteringSpec extends SparkSpec {
  import spark.implicits._

  test("leakageFreeSplit: no near-dup pair straddles splits; singletons match q80") {
    val docs = Tables(spark, sf, "documents")
    val assign = DataSelection.leakageFreeSplit(docs, "doc_id", "text",
      n = 3, threshold = 0.5).cache()
    val splitOf = assign.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(splitOf.size == docs.count())
    // the guarantee: every exact near-dup pair shares a split
    val pairs = DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty) // corpus plants dup clusters; vacuous otherwise
    pairs.foreach { case (a, b) =>
      assert(splitOf(a)._2 == splitOf(b)._2, s"pair ($a,$b) straddles splits")
    }
    // singletons (group_key == own id) get exactly the q80 per-doc rule
    val grouped = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    splitOf.foreach { case (id, (gk, sp)) =>
      if (!grouped(id)) {
        assert(gk == id)
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.head
        val exp = if (h <= '9' || h == 'a' || h == 'b') "train"
                  else if (h == 'c' || h == 'd') "val" else "test"
        assert(sp == exp, s"singleton $id")
      } else assert(gk <= id) // component id = min member
    }
    assign.unpersist()
  }

  test("budgetFill: source whose first doc overshoots keeps zero docs") {
    // one source, one 10-token doc, budget = 10·3 DIV 5 = 6 < 10 → nothing
    // fits; the summary row must still appear with zeros.
    val df = Seq((1L, "a b c d e f g h i j", "s1"))
      .toDF("doc_id", "text", "source")
    val out = DataSelection.budgetFill(df, "doc_id", "text", "source", 3, 5)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("src_tokens") == 10L)
    assert(r.getAs[Long]("budget_tokens") == 6L)
    assert(r.getAs[Long]("n_docs_sel") == 0L)
    assert(r.getAs[Long]("sel_tokens") == 0L)
    assert(r.getAs[Long]("fill_x1e4") == 0L)
  }

  test("budgetFill: greedy prefix stops exactly at the budget boundary") {
    // 4 docs × 5 tokens in one source: budget = 20·3 DIV 5 = 12 → exactly
    // 2 docs (10 tokens) fit; the 3rd would reach 15 > 12.
    val docs = (1L to 4L).map(i => (i, "t1 t2 t3 t4 t5", "s"))
    val out = DataSelection
      .budgetFill(docs.toDF("doc_id", "text", "source"), "doc_id", "text",
        "source", 3, 5)
      .collect().head
    assert(out.getAs[Long]("budget_tokens") == 12L)
    assert(out.getAs[Long]("n_docs_sel") == 2L)
    assert(out.getAs[Long]("sel_tokens") == 10L)
    // fill = floor(10/12·1e4 + .5) = 8333
    assert(out.getAs[Long]("fill_x1e4") == 8333L)
  }

  test("rrfFuse: doc ranked by both systems beats single-system docs") {
    val a = Seq(("q", 1L, 1L), ("q", 2L, 2L)).toDF("query_id", "doc_id", "rank")
    val b = Seq(("q", 1L, 2L), ("q", 3L, 1L)).toDF("query_id", "doc_id", "rank")
    val out = Similarity.rrfFuse(a, b, k = 3).orderBy("rank").collect()
    // doc 1: 1/61 + 1/62 ≈ 0.032524 beats doc 3 (1/61) and doc 2 (1/62)
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 3L, 2L))
    assert(math.abs(out.head.getAs[Double]("rrf") - (1.0 / 61 + 1.0 / 62)) < 1e-6)
  }

  test("rankJoin keeps self-matches (symmetric candidate set for fusion)") {
    val emb = Seq((0L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") === 0)
      .select(lit("q0").as("query_id"), col("embedding"))
    val out = Similarity.rankJoin(q, emb, "vec_id", "embedding", k = 2)
      .orderBy("rank").collect()
    assert(out.length == 2 && out.head.getAs[Long]("doc_id") == 0L)
  }

  test("kmeans: two separated blobs recover their centers") {
    val pts = (Seq.tabulate(10)(i => (i.toLong, Array(0.0 + i * 0.01, 0.0)))
      ++ Seq.tabulate(10)(i => (10L + i, Array(5.0 + i * 0.01, 5.0))))
    val df = pts.toDF("vec_id", "embedding")
    val model = KMeansOps.fit(df, "vec_id", "embedding", k = 2, updates = 3)
    val centers = model.map(_.toSeq).sortBy(_.head)
    assert(math.abs(centers(0).head - 0.045) < 1e-9)
    assert(math.abs(centers(1).head - 5.045) < 1e-9)
    val sum = KMeansOps.clusterSummary(df, "vec_id", "embedding", 2, 3)
      .collect()
    assert(sum.map(_.getAs[Long]("n_points")).sum == 20L)
  }

  test("kmeans: empty cluster keeps its centroid; summary emits every id") {
    // duplicate init centroids: c1 loses every round-1 argmin tie (ties
    // break to the lower cluster id) so its cluster is empty — it must
    // keep its previous centroid, not NaN out.
    val df = Seq((0L, Array(0.0, 0.0)), (1L, Array(0.0, 0.0)),
      (2L, Array(4.0, 4.0))).toDF("vec_id", "embedding")
    val model = KMeansOps.fit(df, "vec_id", "embedding", k = 2, updates = 1)
    assert(model(1).toSeq == Seq(0.0, 0.0))
    assert(model(0).toSeq == Seq(4.0 / 3, 4.0 / 3))
    // k beyond the data (2 points, k=3): the cluster spine still emits a
    // row per id, zero-filled for clusters no point lands in.
    val sum = KMeansOps.clusterSummary(df.filter(col("vec_id") < 2),
      "vec_id", "embedding", k = 3, updates = 1).collect()
    assert(sum.length == 3)
    assert(sum.count(r => r.getAs[Long]("n_points") == 0L
      && r.getAs[Double]("mean_d2") == 0.0) == 2)
  }

  test("silhouette: separated blobs near 1, degenerate ties are 0") {
    val pts = (Seq.tabulate(4)(i => (i.toLong * 2, Array(0.0 + i * 0.01, 0.0)))
      ++ Seq.tabulate(4)(i => (1L + i * 2, Array(5.0 + i * 0.01, 5.0))))
    val df = pts.toDF("vec_id", "embedding")
    // init = ids 0,1 → one seed per blob; after 1 update the centroids sit
    // on the blob means, so every point is ~70× closer to its own center
    val sil = KMeansOps.silhouette(df, "vec_id", "embedding",
      k = 2, updates = 1).collect()
    assert(sil.length == 2)
    sil.foreach { r =>
      assert(r.getAs[Long]("n_points") == 4L)
      assert(r.getAs[Double]("mean_silhouette") > 0.99)
    }
    // identical points: both centroids coincide, a = b = 0 → s = 0, and
    // the d2-tie assigns everything to cluster 0 (lower id wins)
    val same = Seq((0L, Array(1.0, 1.0)), (1L, Array(1.0, 1.0)),
      (2L, Array(1.0, 1.0))).toDF("vec_id", "embedding")
    val s2 = KMeansOps.silhouette(same, "vec_id", "embedding",
      k = 2, updates = 1).orderBy("cluster").collect()
    assert(s2(0).getAs[Long]("n_points") == 3L)
    assert(s2(0).getAs[Double]("mean_silhouette") == 0.0)
    assert(s2(1).getAs[Long]("n_points") == 0L)
  }

  test("winnowing: shared run of w+k-1 tokens guarantees a shared fingerprint") {
    // k=3, w=4: any common run of ≥ 6 tokens must surface. The two docs
    // share exactly one 6-token run inside otherwise-disjoint text.
    val common = "alpha beta gamma delta epsilon zeta"
    val df = Seq(
      (1L, s"one two three four five $common six seven eight nine ten"),
      (2L, s"uno dos tres cuatro cinco $common seis siete ocho nueve diez"))
      .toDF("doc_id", "text")
    val fp = DedupOps.winnowingFingerprints(df, "doc_id", "text", k = 3, w = 4)
    val a = fp.filter(col("doc_id") === 1).select("fingerprint")
      .collect().map(_.getString(0)).toSet
    val b = fp.filter(col("doc_id") === 2).select("fingerprint")
      .collect().map(_.getString(0)).toSet
    assert((a intersect b).nonEmpty)
    // density: winnowing keeps ~2/(w+1) of positions, far below all grams
    val nGrams = 17 - 2 // 17 tokens, k=3
    assert(a.size < nGrams)
  }

  test("winnowing guarantee holds over 20 seeded random corpora") {
    // The Schleimer et al. theorem: any shared run of >= w+k-1 tokens
    // yields at least one shared fingerprint — for EVERY input, not in
    // expectation. Plant a (w+k-1)-token run at random offsets inside
    // otherwise-random token soup and check the guarantee each time.
    val k = 3; val w = 4
    val run = (1 to (w + k - 1)).map(i => s"planted$i").mkString(" ")
    val cases = (1 to 20).map { seed =>
      val rnd = new scala.util.Random(seed)
      def soup(n: Int) = Seq.fill(n)("w" + rnd.nextInt(50)).mkString(" ")
      val a = s"${soup(5 + rnd.nextInt(20))} $run ${soup(5 + rnd.nextInt(20))}"
      val b = s"${soup(5 + rnd.nextInt(20))} $run ${soup(5 + rnd.nextInt(20))}"
      (seed.toLong * 2, a, seed.toLong * 2 + 1, b)
    }
    val df = cases.flatMap { case (ia, a, ib, b) => Seq((ia, a), (ib, b)) }
      .toDF("doc_id", "text")
    val fp = DedupOps.winnowingFingerprints(df, "doc_id", "text", k, w)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.map(_.getString(1)).toSet }
    cases.foreach { case (ia, _, ib, _) =>
      assert((fp(ia) intersect fp(ib)).nonEmpty, s"pair ($ia,$ib)")
    }
  }

  test("winnowing: docs shorter than w+k-1 tokens emit no fingerprints") {
    val df = Seq((1L, "a b c d e"), (2L, "a b c d e f")).toDF("doc_id", "text")
    // doc 1: 5 tokens → 3 gram positions < w=4 → nothing; doc 2: 6 tokens
    // → 4 positions = exactly one window → one fingerprint.
    val fp = DedupOps.winnowingFingerprints(df, "doc_id", "text", k = 3, w = 4)
      .collect()
    assert(!fp.exists(_.getLong(0) == 1L))
    assert(fp.count(_.getLong(0) == 2L) == 1)
  }

  test("filterFunnel: counts telescope (n_out(k) = n_in(k+1)) and order is kept") {
    val df = Seq((1, "en", 10), (2, "en", 3), (3, "zh", 10), (4, "en", 10))
      .toDF("id", "lang", "n")
    val out = Profiling.filterFunnel(df, Seq(
      "min_n" -> (col("n") >= 5),
      "lang" -> (col("lang") =!= "zh"))).collect()
    assert(out.map(_.getAs[String]("rule")).toSeq == Seq("min_n", "lang"))
    assert(out(0).getAs[Long]("n_in") == 4L)
    assert(out(0).getAs[Long]("n_out") == 3L)
    assert(out(1).getAs[Long]("n_in") == 3L)
    assert(out(1).getAs[Long]("n_drop") == 1L)
    assert(out(1).getAs[Long]("n_out") == 2L)
  }

  test("filterFunnel: quoted rule names are safe; empty rule list rejected") {
    val df = Seq((1, 10), (2, 3)).toDF("id", "n")
    // a name with a single quote must pass through verbatim (names are lit
    // values, not SQL text)
    val out = Profiling.filterFunnel(df,
      Seq("n >= 5 ('min' rule)" -> (col("n") >= 5))).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("rule") == "n >= 5 ('min' rule)")
    assert(out.head.getAs[Long]("n_out") == 1L)
    intercept[IllegalArgumentException] {
      Profiling.filterFunnel(df, Seq.empty)
    }
  }
}
