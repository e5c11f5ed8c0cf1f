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
}
