package graft.queries

import graft.{QDef, Tables}
import graft.operators.{BqIndex, DataSelection, DedupOps, IvfIndex, IvfPq, KMeansOps, PortableAnn, PqIndex, Similarity, SqIndex}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity-search + content-dedup surface: cosine top-k / k-NN join /
  * exact near-dup (reference O2) and the training-pipeline dedup ladder
  * (exact fingerprint, n-gram Jaccard, MinHash+LSH, SimHash).
  *
  * Oracles exist for everything exact; the LSH/SimHash approximations are
  * rows-only checked here and recall-tested against their exact baselines
  * in SimilaritySpec.
  */
object SimilarityQueries {

  private def docs(s: SparkSession, d: String) = Tables(s, d, "documents")
  private def embs(s: SparkSession, d: String) = Tables(s, d, "embeddings")

  private val dotSql =
    "list_dot_product(%s, %s)"

  val defs: Seq[QDef] = Seq(

    // O2: cosine top-10 for one query vector (vec_id 0), via broadcast join
    // — no driver-side vector collect.
    QDef("q20_cosine_topk",
      (s, d) => Similarity.knnJoin(
          embs(s, d).filter(col("vec_id") === 0), embs(s, d),
          "vec_id", "embedding", 10)
        .select(col("query_id"), col("vec_id"), round(col("sim"), 6).as("sim"),
          col("rank"))
        .orderBy(col("rank")),
      Some("""SELECT query_id, vec_id, round(sim, 6) AS sim, rank FROM (
             |  SELECT q.qid AS query_id, e.vec_id,
             |    list_dot_product(e.v, q.qv)
             |      / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS sim,
             |    row_number() OVER (ORDER BY list_dot_product(e.v, q.qv)
             |      / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) DESC, e.vec_id) AS rank
             |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings) e,
             |       (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) qv FROM embeddings WHERE vec_id = 0) q
             |  WHERE e.vec_id <> q.qid)
             |WHERE rank <= 10 ORDER BY rank""".stripMargin)),

    // k-NN join: top-3 neighbors for each of the first 5 vectors.
    QDef("q21_knn_join",
      (s, d) => Similarity.knnJoin(
          embs(s, d).filter(col("vec_id") < 5), embs(s, d),
          "vec_id", "embedding", 3)
        .select(col("query_id"), col("vec_id"), round(col("sim"), 6).as("sim"),
          col("rank"))
        .orderBy(col("query_id"), col("rank")),
      Some("""SELECT query_id, vec_id, round(sim, 6) AS sim, rank FROM (
             |  SELECT q.qid AS query_id, e.vec_id,
             |    list_dot_product(e.v, q.qv)
             |      / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS sim,
             |    row_number() OVER (PARTITION BY q.qid
             |      ORDER BY list_dot_product(e.v, q.qv)
             |      / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) DESC, e.vec_id) AS rank
             |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings) e,
             |       (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) qv FROM embeddings WHERE vec_id < 5) q
             |  WHERE e.vec_id <> q.qid)
             |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin)),

    // Exact embedding near-dup pairs (cosine ≥ 0.4), all-pairs baseline.
    QDef("q22_embed_neardup",
      (s, d) => Similarity.nearDupPairs(embs(s, d), "vec_id", "embedding", 0.4)
        .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
        .orderBy(col("id_a"), col("id_b")),
      Some("""SELECT id_a, id_b, round(sim, 6) AS sim FROM (
             |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |    list_dot_product(a.v, b.v)
             |      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS sim
             |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings) a
             |  JOIN (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings) b
             |    ON a.vec_id < b.vec_id)
             |WHERE sim >= 0.4 ORDER BY id_a, id_b""".stripMargin)),

    // MinHash + LSH banding near-dups, exact-Jaccard verified, run with the
    // exact-recall guard: banding alone is 16 bands × 2 rows (miss
    // probability (1-J²)^16 ≈ 1% at J=0.5), so LSH-equals-exact would be an
    // EMPIRICAL property of the corpus — a regenerated testdata set with a
    // borderline J≈0.5 pair could fail the row on correct code. The guard
    // unions the PPJoin prefix-filter candidates (recall 1 by theorem)
    // before exact verification, making equality with the q24 pair set
    // STRUCTURAL under any reseeded corpus. SimilaritySpec pins this with a
    // planted J=0.50 pair and randomized corpora; pure-LSH recall is
    // spec'd separately and ScaleProbe exercises the unguarded path.
    QDef("q23_minhash_lsh",
      (s, d) => DedupOps.minhashLshPairs(docs(s, d), "doc_id", "text",
          n = 3, threshold = 0.5, k = 32, bands = 16, exactRecallGuard = true)
        .orderBy(col("id_a"), col("id_b")),
      Some("""WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
             |            FROM documents),
             |sh AS (SELECT doc_id, unnest(list_distinct(
             |         [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
             |          for i in range(1, greatest(len(toks) - 1, 1))])) AS s
             |       FROM t),
             |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
             |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
             |      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             |      GROUP BY 1, 2)
             |SELECT id_a, id_b, round(j, 6) AS jaccard FROM (
             |  SELECT id_a, id_b, CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS j
             |  FROM p JOIN sz sa ON p.id_a = sa.doc_id
             |         JOIN sz sb ON p.id_b = sb.doc_id)
             |WHERE j >= 0.5 ORDER BY id_a, id_b""".stripMargin)),

    // Exact word-3-gram Jaccard near-dup pairs via inverted shingle index.
    QDef("q24_ngram_jaccard",
      (s, d) => DedupOps.ngramJaccardPairs(docs(s, d), "doc_id", "text",
          n = 3, threshold = 0.5)
        .orderBy(col("id_a"), col("id_b")),
      Some("""WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
             |            FROM documents),
             |sh AS (SELECT doc_id, unnest(list_distinct(
             |         [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
             |          for i in range(1, greatest(len(toks) - 1, 1))])) AS s
             |       FROM t),
             |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
             |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
             |      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             |      GROUP BY 1, 2)
             |SELECT id_a, id_b, round(j, 6) AS jaccard FROM (
             |  SELECT id_a, id_b, CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS j
             |  FROM p JOIN sz sa ON p.id_a = sa.doc_id
             |         JOIN sz sb ON p.id_b = sb.doc_id)
             |WHERE j >= 0.5 ORDER BY id_a, id_b""".stripMargin)),

    // Same exact pair set as q24, via PPJoin-style prefix filtering: only
    // each doc's ⌊(1-τ)|x|⌋+1 globally-rarest shingles enter the inverted
    // index (hot shingle buckets never materialize), candidates verified
    // against full sets. Shares q24's oracle — exactness is the point.
    QDef("q102_prefix_jaccard",
      (s, d) => DedupOps.prefixJaccardPairs(docs(s, d), "doc_id", "text",
          n = 3, threshold = 0.5)
        .orderBy(col("id_a"), col("id_b")),
      Some("""WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
             |            FROM documents),
             |sh AS (SELECT doc_id, unnest(list_distinct(
             |         [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
             |          for i in range(1, greatest(len(toks) - 1, 1))])) AS s
             |       FROM t),
             |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
             |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
             |      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             |      GROUP BY 1, 2)
             |SELECT id_a, id_b, round(j, 6) AS jaccard FROM (
             |  SELECT id_a, id_b, CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS j
             |  FROM p JOIN sz sa ON p.id_a = sa.doc_id
             |         JOIN sz sb ON p.id_b = sb.doc_id)
             |WHERE j >= 0.5 ORDER BY id_a, id_b""".stripMargin)),

    // SimHash near-dups (Hamming ≤ 3 via 16-bit banding). The banding is
    // EXACT for maxDist ≤ 3 (pigeonhole over 4 bands), and the md5-portable
    // token hash (= DuckDB's md5_number_lower) makes the whole signature
    // reproducible in SQL — the oracle recomputes every signature and does
    // the all-pairs Hamming check the banding avoids.
    QDef("q25_simhash_pairs",
      (s, d) => DedupOps.simhashPairs(docs(s, d), "doc_id", "text",
          maxDist = 3, md5Portable = true)
        .orderBy(col("id_a"), col("id_b")),
      Some("""WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
             |             FROM documents),
             |h AS (SELECT doc_id, md5_number_lower(t) AS h FROM tok),
             |bits AS (SELECT doc_id, b,
             |           sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
             |         FROM h, range(64) r(b) GROUP BY 1, 2),
             |sig AS (SELECT doc_id,
             |          CAST(sum(CASE WHEN v > 0 THEN (1::UBIGINT << b)
             |                        ELSE 0::UBIGINT END) AS UBIGINT) AS s
             |        FROM bits GROUP BY 1)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming
             |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
             |WHERE bit_count(xor(a.s, b.s)) <= 3
             |ORDER BY id_a, id_b""".stripMargin)),

    // IVF ANN at the APPROXIMATE operating point (nprobe = 3 of 8 cells),
    // in PortableAnn fixed-point arithmetic so the probe-limited OUTPUT
    // ITSELF hash-checks — which ids, at which exact integer distances,
    // in which rank order (the q237 move applied to the IVF rung; the
    // k-means chain is unrolled in the oracle). The float production
    // machinery stays exercised by q129 (nprobe = nlist exact twin, same
    // train/assign/probe/rank plan) and IvfIndexSpec; q217 hash-checks
    // this exact config's recall.
    QDef("q46_ivf_ann",
      (s, d) => {
        val corpus = embs(s, d).select(col("vec_id"),
          PortableAnn.quant(col("embedding")).as("qv"))
        val model = PortableAnn.train(corpus, "vec_id", "qv", k = 8, iters = 2)
        PortableAnn.ivfSearch(corpus.filter(col("vec_id") < 5), corpus,
            "vec_id", "qv", model, nprobe = 3, topK = 5)
          .select(col("query_id"), col("vec_id"), col("d").as("d2"),
            col("rank"))
          .orderBy(col("query_id"), col("rank"))
      },
      Some(ivfAnnSql)),

    // IVF at nprobe = nlist: every cell probed, so the result is EXACTLY
    // brute-force top-k (independent of where k-means put the centroids)
    // while still exercising the full IVF machinery — train, assign,
    // probe-list, per-cell search, rank window. This is the oracle-visible
    // twin of q46: the SQL is the same brute-force cosine as q21's.
    QDef("q129_ivf_exhaustive",
      (s, d) => {
        val corpus = embs(s, d)
        val model = IvfIndex.train(corpus, "vec_id", "embedding", k = 8, iters = 2)
        IvfIndex.search(corpus.filter(col("vec_id") < 5), corpus,
          "vec_id", "embedding", model, nprobe = 8, topK = 5)
          .select(col("query_id"), col("vec_id"), round(col("sim"), 6).as("sim"),
            col("rank"))
          .orderBy(col("query_id"), col("rank"))
      },
      Some("""SELECT query_id, vec_id, round(sim, 6) AS sim, rank FROM (
             |  SELECT q.qid AS query_id, e.vec_id,
             |    list_dot_product(e.v, q.qv)
             |      / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS sim,
             |    row_number() OVER (PARTITION BY q.qid
             |      ORDER BY list_dot_product(e.v, q.qv)
             |      / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) DESC, e.vec_id) AS rank
             |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings) e,
             |       (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) qv FROM embeddings WHERE vec_id < 5) q
             |  WHERE e.vec_id <> q.qid)
             |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // PQ-compressed ANN at the APPROXIMATE operating point (ADC shortlist
    // 50 → exact rerank), in PortableAnn fixed-point arithmetic so the
    // shortlisted OUTPUT ITSELF hash-checks — per-subspace codebook
    // training unrolled in the oracle, the ADC lookup table a relational
    // join there (the q237 move applied to the PQ rung). The float
    // production machinery stays exercised by q130 (shortlist = corpus
    // exact twin) and PqIndexSpec; q218 hash-checks this exact config's
    // recall.
    QDef("q88_pq_ann",
      (s, d) => {
        val corpus = embs(s, d).select(col("vec_id"),
          PortableAnn.quant(col("embedding")).as("qv"))
        val books = PortableAnn.pqTrain(corpus, "vec_id", "qv",
          m = 8, subDim = 8, k = 16, iters = 2)
        val qvec = corpus.filter(col("vec_id") === 0L)
          .select(col("qv")).head().getSeq[Long](0).toArray
        PortableAnn.pqSearchWithRerank(corpus.filter(col("vec_id") =!= 0L),
            "vec_id", "qv", books, qvec, subDim = 8, shortlist = 50,
            topK = 10)
          .select(col("vec_id"), col("d").as("d2"))
          .orderBy(col("d2"), col("vec_id"))
      },
      Some(pqAnnSql)),

    // PQ at shortlist = corpus size: the ADC pass shortlists EVERY vector,
    // so the exact rerank is brute-force L2 top-k regardless of where the
    // codebooks landed — while still exercising the full PQ machinery
    // (train, encode, ADC lookup tables, shortlist semi-join, rerank).
    // Oracle-visible twin of q88, same trick as q129-vs-q46; q88 stays as
    // the approximate-path bench twin.
    QDef("q130_pq_exhaustive",
      (s, d) => {
        val corpus = embs(s, d)
        val n = corpus.count().toInt
        val model = PqIndex.train(corpus, "vec_id", "embedding",
          m = 8, k = 16, iters = 2)
        val q = corpus.filter(col("vec_id") === 0L)
          .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toArray
        PqIndex.searchWithRerank(corpus.filter(col("vec_id") =!= 0L),
            "vec_id", "embedding", model, q, shortlist = n, topK = 10)
          .select(col("vec_id"), round(sqrt(col("dist")), 6).as("l2_dist"))
          .orderBy(col("l2_dist"), col("vec_id"))
      },
      Some("""SELECT vec_id, round(d, 6) AS l2_dist FROM (
             |  SELECT e.vec_id, list_distance(e.v, q.qv) AS d
             |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings) e,
             |       (SELECT CAST(embedding AS DOUBLE[]) qv FROM embeddings WHERE vec_id = 0) q
             |  WHERE e.vec_id <> 0)
             |ORDER BY d, vec_id LIMIT 10""".stripMargin)),

    // The BATCH IVF-PQ path at full width: nprobe = nlist and
    // shortlist = corpus degrade searchPrunedBatch to exact per-query
    // L2 top-k (the query's own row included at rank 1, dist 0) — the
    // oracle-visible twin that hash-checks the one-scan multi-query
    // machinery end to end: union-cell partition pruning, broadcast
    // per-query ADC tables, per-query shortlist windows, exact rerank.
    // Same q129/q130 trick; the probed approximate path stays q88/q46's
    // territory with its recall metric rows.
    QDef("q235_ivfpq_batch_exact",
      (s, d) => {
        val corpus = embs(s, d)
        val n = corpus.count().toInt
        val model = IvfPq.train(corpus, "vec_id", "embedding",
          nlist = 4, coarseIters = 2, m = 8, k = 16, pqIters = 2)
        val dir = graft.Scratch.dir("q235_index")
        IvfPq.writeIndex(corpus, "vec_id", "embedding", model, dir)
        IvfPq.searchPrunedBatch(s, dir, corpus.filter(col("vec_id") < 5),
            "vec_id", "embedding", model, nprobe = 4, shortlist = n,
            topK = 5)
          .select(col("query_id"), col("vec_id"),
            round(sqrt(col("dist")), 6).as("l2_dist"), col("rank"))
          .orderBy(col("query_id"), col("rank"))
      },
      Some("""SELECT query_id, vec_id, round(d, 6) AS l2_dist, rank FROM (
             |  SELECT q.qid AS query_id, e.vec_id, list_distance(e.v, q.qv) AS d,
             |    row_number() OVER (PARTITION BY q.qid
             |      ORDER BY list_distance(e.v, q.qv), e.vec_id) AS rank
             |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings) e,
             |       (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) qv
             |        FROM embeddings WHERE vec_id < 5) q)
             |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // SQ8 scalar quantization at shortlist = corpus size: the byte-code
    // scan shortlists EVERY vector, so the exact rerank is brute-force L2
    // top-k — the full SQ machinery (per-dim min/max train, encode,
    // dequantized scan, rerank) under the same exact oracle as q130.
    // Compression + shortlist-recall are pinned in SimilaritySpec.
    QDef("q135_sq_exhaustive",
      (s, d) => {
        val corpus = embs(s, d)
        val n = corpus.count().toInt
        val model = SqIndex.train(corpus, "embedding")
        val q = corpus.filter(col("vec_id") === 0L)
          .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toArray
        SqIndex.searchWithRerank(corpus.filter(col("vec_id") =!= 0L),
            "vec_id", "embedding", model, q, shortlist = n, topK = 10)
          .select(col("vec_id"), round(sqrt(col("dist")), 6).as("l2_dist"))
          .orderBy(col("l2_dist"), col("vec_id"))
      },
      Some("""SELECT vec_id, round(d, 6) AS l2_dist FROM (
             |  SELECT e.vec_id, list_distance(e.v, q.qv) AS d
             |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings) e,
             |       (SELECT CAST(embedding AS DOUBLE[]) qv FROM embeddings WHERE vec_id = 0) q
             |  WHERE e.vec_id <> 0)
             |ORDER BY d, vec_id LIMIT 10""".stripMargin)),

    // SemDeDup at nClusters = 1: the cluster restriction vanishes, so the
    // drop rule is exactly "has ANY lower-id neighbor with cosine ≥ 0.4" —
    // SQL-oracle-able while still exercising the full machinery (k-means
    // train, cell assignment, per-cell pair join, drop aggregation).
    // Oracle-visible twin of q138, same pattern as q129/q130.
    // Bounded to the first 2000 vectors: with nClusters = 1 every pair
    // lands on ONE cell key, so the all-pairs join is single-partition BY
    // CONSTRUCTION (that is what makes it the exact baseline) — the slice
    // keeps the oracle affordable at every SF while the full-corpus scale
    // path is q138.
    QDef("q137_semdedup_exhaustive",
      (s, d) => Similarity.semanticDedup(
          embs(s, d).filter(col("vec_id") < 2000), "vec_id", "embedding",
          nClusters = 1, iters = 1, threshold = 0.4)
        .orderBy(col("vec_id")),
      Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings
             |       WHERE vec_id < 2000),
             |d AS (SELECT b.vec_id AS id, count(*) AS n
             |      FROM v a JOIN v b ON a.vec_id < b.vec_id
             |      WHERE list_dot_product(a.v, b.v)
             |          / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.4
             |      GROUP BY 1)
             |SELECT e.vec_id, COALESCE(d.n, 0) AS n_close_lower,
             |  CAST(CASE WHEN d.id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
             |FROM v e LEFT JOIN d ON e.vec_id = d.id
             |ORDER BY e.vec_id""".stripMargin)),

    // SemDeDup clustered scale path: per-cluster pairs only — the
    // O(Σ|c|²) form that survives corpus scale — in PortableAnn
    // fixed-point arithmetic (integer k-means unrolled in the oracle,
    // cos ≥ 2/5 as the exact predicate dot > 0 ∧ 25·dot² ≥ 4·‖a‖²·‖b‖²),
    // so the clustered drop decisions THEMSELVES hash-check per vector.
    // k is pinned at 8 for the static oracle; the production entry point
    // (Similarity.semanticDedup, float, corpus-scaled k ≈ n/250 so
    // per-cell pair cost stays constant) remains exercised by q137's
    // exhaustive twin and SimilaritySpec's containment pin, and q219
    // hash-checks this clustered config's containment vs exhaustive.
    QDef("q138_semdedup_clustered",
      (s, d) => {
        val base = embs(s, d).select(col("vec_id"),
          PortableAnn.quant(col("embedding")).as("qv"))
        val model = PortableAnn.train(base, "vec_id", "qv", k = 8, iters = 2)
        val a = base
          .withColumn("cell", PortableAnn.bestCell(col("qv"), model))
          .withColumn("n2", PortableAnn.dotL(col("qv"), col("qv")))
        val lo = a.select(col("vec_id").as("ia"), col("qv").as("qa"),
          col("n2").as("na2"), col("cell").as("ca"))
        val hi = a.select(col("vec_id").as("ib"), col("qv").as("qb"),
          col("n2").as("nb2"), col("cell").as("cb"))
        val close = lo
          .join(hi, col("ca") === col("cb") && col("ia") < col("ib"))
          .select(col("ib"), PortableAnn.dotL(col("qa"), col("qb")).as("dp"),
            col("na2"), col("nb2"))
          .filter(PortableAnn.cosGe(col("dp"), col("na2"), col("nb2"), 2, 5))
          .groupBy(col("ib"))
          .agg(count(lit(1)).cast("long").as("n_close_lower"))
        base.join(close, base("vec_id") === close("ib"), "left")
          .select(col("vec_id"),
            coalesce(col("n_close_lower"), lit(0L)).as("n_close_lower"),
            when(col("ib").isNull, lit(1L)).otherwise(lit(0L)).as("kept"))
          .orderBy(col("vec_id"))
      },
      Some(semdedupClusteredSql)),

    // Embedding-health audit: the gate an embedding pipeline runs before
    // indexing — norm spectrum, dimension consistency, zero/non-finite
    // vectors. One narrow scan, one global aggregate.
    QDef("q150_embedding_audit",
      (s, d) => embs(s, d)
        .withColumn("nrm",
          sqrt(graft.functions.VectorFns.dot(col("embedding"), col("embedding"))))
        .withColumn("bad",
          expr("exists(embedding, x -> isnan(x) OR abs(x) > 3.4e38)"))
        .agg(
          count(lit(1)).cast("long").as("n_vecs"),
          countDistinct(size(col("embedding"))).cast("long").as("n_distinct_dims"),
          round(avg(col("nrm")), 6).as("mean_norm"),
          round(min(col("nrm")), 6).as("min_norm"),
          round(max(col("nrm")), 6).as("max_norm"),
          count(when(col("nrm") === 0.0, lit(1))).as("n_zero"),
          count(when(col("bad"), lit(1))).as("n_nonfinite")),
      Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |n AS (SELECT vec_id, sqrt(list_dot_product(v, v)) AS nrm, len(v) AS dim,
             |    len(list_filter(v, x -> isnan(x) OR isinf(x))) > 0 AS bad
             |  FROM v)
             |SELECT CAST(count(*) AS BIGINT) AS n_vecs,
             |  CAST(count(DISTINCT dim) AS BIGINT) AS n_distinct_dims,
             |  round(avg(nrm), 6) AS mean_norm,
             |  round(min(nrm), 6) AS min_norm,
             |  round(max(nrm), 6) AS max_norm,
             |  CAST(count(*) FILTER (WHERE nrm = 0) AS BIGINT) AS n_zero,
             |  CAST(count(*) FILTER (WHERE bad) AS BIGINT) AS n_nonfinite
             |FROM n""".stripMargin)),

    // Per-label embedding centroids as (label, pos, avg) rows: posexplode →
    // groupBy(label, pos) — one shuffle keyed on (label, pos), partial
    // (map-side) averages do the heavy lifting. Emitting rows rather than an
    // array column keeps it oracle-comparable.
    QDef("q73_label_centroids",
      (s, d) => embs(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("label"), col("pos").cast("long").as("pos"))
        .agg(round(avg(col("v").cast("double")), 6).as("centroid_v"),
          count(lit(1)).cast("long").as("n_vecs"))
        .orderBy(col("label"), col("pos")),
      Some("""SELECT label, pos, round(avg(v), 6) AS centroid_v, count(*) AS n_vecs
             |FROM (SELECT label,
             |        CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS pos,
             |        CAST(unnest(embedding) AS DOUBLE) AS v
             |      FROM embeddings)
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Exact dedup groups by prefix fingerprint (hash-groupBy dedup).
    QDef("q26_exact_dedup_groups",
      (s, d) => DedupOps.exactDupGroups(docs(s, d), "doc_id",
          md5(substring(col("text"), 1, 80)))
        .orderBy(col("fp")),
      Some("""SELECT md5(substr(text, 1, 80)) AS fp,
             |CAST(min(doc_id) AS BIGINT) AS keeper,
             |count(*) AS n_dups
             |FROM documents GROUP BY 1 HAVING count(*) > 1 ORDER BY fp""".stripMargin)),

    // Incremental dedup: the doc_id%10==0 slice plays the daily increment,
    // the rest the accumulated corpus. Exact fingerprint + exact 3-gram
    // Jaccard vs corpus only (no corpus self-join) — increment-bound cost.
    QDef("q142_dedup_against_corpus",
      (s, d) => {
        val all = docs(s, d)
        DedupOps.dedupAgainst(
            all.filter(col("doc_id") % 10 === 0),
            all.filter(col("doc_id") % 10 =!= 0),
            "doc_id", "text", n = 3, threshold = 0.5)
          .orderBy(col("doc_id"))
      },
      Some(dedupAgainstSql)),

    // q142 through the PERSISTED index path: the accumulated corpus is
    // written as a shingle-sharded index (per-doc sizes denormalized,
    // fingerprint table alongside), then the increment is checked with
    // partition-pruned reads — the same semantics, so the SAME oracle
    // hash-checks that the layout path loses nothing. The timed cost
    // includes the index build; the query half alone reads only the
    // increment's shards.
    QDef("q226_dedup_against_indexed",
      (s, d) => {
        val all = docs(s, d)
        val dir = graft.Scratch.dir("q226_index")
        DedupOps.writeDedupIndex(all.filter(col("doc_id") % 10 =!= 0),
          "doc_id", "text", n = 3, dir)
        DedupOps.dedupAgainstIndex(s, dir,
            all.filter(col("doc_id") % 10 === 0),
            "doc_id", "text", n = 3, threshold = 0.5)
          .orderBy(col("doc_id"))
      },
      Some(dedupAgainstSql)),

    // q226's DELETE half: index the %10!=0 corpus, tombstone the
    // doc_id%5==1 subset OUT (O(batch) sidecar rows — shingles hash
    // across ~every shard, so no shard is rewritten), then check the
    // %10==0 increment against the shrunken index. Tombstones anti-join
    // on BOTH the shingle and fingerprint sides, so the result equals a
    // live-only rebuild — the parameterized oracle restates `old` as the
    // post-delete set. Compaction equivalence is pinned in SimilaritySpec.
    QDef("q230_dedup_index_delete",
      (s, d) => {
        val all = docs(s, d)
        val dir = graft.Scratch.dir("q230_index")
        DedupOps.writeDedupIndex(all.filter(col("doc_id") % 10 =!= 0),
          "doc_id", "text", n = 3, dir)
        DedupOps.removeFromDedupIndex(
          all.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 5 === 1)
            .select("doc_id"), "doc_id", dir)
        DedupOps.dedupAgainstIndex(s, dir,
            all.filter(col("doc_id") % 10 === 0),
            "doc_id", "text", n = 3, threshold = 0.5)
          .orderBy(col("doc_id"))
      },
      Some(dedupAgainstSqlOver(
        "SELECT * FROM documents WHERE doc_id % 10 <> 0 AND doc_id % 5 <> 1"))),

    // q226's STREAMING half: base index on a third of the %10!=0 corpus,
    // Structured Streaming folds the rest in as immutable per-batch
    // segments (file-source, maxFilesPerTrigger=1 — real micro-batches;
    // per-batch overwrite ⇒ exactly-once on replay), then the %10==0
    // increment is checked against the streamed index. Reads span base +
    // segments with per-segment partition pruning and the comparison is
    // exact, so the SAME oracle as q142/q226 hash-checks continuous
    // index ingestion end to end.
    QDef("q232_dedup_streamed",
      (s, d) => {
        val all = docs(s, d)
        val old = all.filter(col("doc_id") % 10 =!= 0)
        val base = graft.Scratch.dir("q232")
        val dir = s"$base/index"
        DedupOps.writeDedupIndex(old.filter(col("doc_id") % 3 === 0),
          "doc_id", "text", n = 3, dir)
        val incDir = s"$base/increment"
        old.filter(col("doc_id") % 3 =!= 0).select("doc_id", "text")
          .repartition(3).write.parquet(incDir)
        val stream = s.readStream
          .schema(s.read.parquet(incDir).schema)
          .option("maxFilesPerTrigger", "1").parquet(incDir)
        val q = graft.streaming.StreamingOps.streamDedupIndex(
          stream, "doc_id", "text", n = 3, dir, s"$base/ckpt")
        q.processAllAvailable()
        q.stop()
        DedupOps.dedupAgainstIndex(s, dir,
            all.filter(col("doc_id") % 10 === 0),
            "doc_id", "text", n = 3, threshold = 0.5)
          .orderBy(col("doc_id"))
      },
      Some(dedupAgainstSql)),

    // Hard-negative mining for contrastive training: top-3 most-similar
    // vectors with a DIFFERENT label, for each of the first 5 vectors.
    QDef("q118_hard_negatives",
      (s, d) => graft.operators.Similarity.hardNegatives(
          embs(s, d).filter(col("vec_id") < 5), embs(s, d),
          "vec_id", "embedding", "label", 3)
        .select(col("query_id"), col("vec_id"), col("label").cast("long").as("label"),
          round(col("sim"), 6).as("sim"), col("rank"))
        .orderBy(col("query_id"), col("rank")),
      Some("""SELECT query_id, vec_id, label, round(sim, 6) AS sim, rank FROM (
             |  SELECT q.qid AS query_id, e.vec_id, CAST(e.label AS BIGINT) AS label,
             |    list_dot_product(e.v, q.qv)
             |      / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS sim,
             |    row_number() OVER (PARTITION BY q.qid
             |      ORDER BY list_dot_product(e.v, q.qv)
             |        / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) DESC,
             |        e.vec_id) AS rank
             |  FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v FROM embeddings) e,
             |       (SELECT vec_id AS qid, label AS qlabel, CAST(embedding AS DOUBLE[]) qv
             |        FROM embeddings WHERE vec_id < 5) q
             |  WHERE e.label <> q.qlabel)
             |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin)),

    // Cross-source n-gram overlap matrix: per source pair, shared shingle
    // count, Jaccard, and both directed containments — the mirror/feed
    // provenance diagnostic run before mixing sources into a corpus.
    QDef("q155_source_overlap",
      (s, d) => DedupOps.sourceOverlapMatrix(docs(s, d), "source", "text", n = 3)
        .orderBy(col("source_a"), col("source_b")),
      Some("""WITH t AS (SELECT source, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
             |            FROM documents),
             |sh AS (SELECT DISTINCT source, s FROM
             |        (SELECT source, unnest(list_distinct(
             |           [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
             |            for i in range(1, greatest(len(toks) - 1, 1))])) AS s
             |         FROM t)),
             |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
             |p AS (SELECT a.source AS source_a, b.source AS source_b,
             |        CAST(count(*) AS BIGINT) AS shared
             |      FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
             |      GROUP BY 1, 2)
             |SELECT source_a, source_b, sa.n AS n_a, sb.n AS n_b, shared,
             |  round(CAST(shared AS DOUBLE) / (sa.n + sb.n - shared), 6) AS jaccard,
             |  round(CAST(shared AS DOUBLE) / sa.n, 6) AS containment_a,
             |  round(CAST(shared AS DOUBLE) / sb.n, 6) AS containment_b
             |FROM p JOIN sz sa ON source_a = sa.source
             |       JOIN sz sb ON source_b = sb.source
             |ORDER BY source_a, source_b""".stripMargin)),

    // Train/val/test split LEAKAGE audit: exact 3-gram Jaccard near-dup
    // pairs (q24's machinery) whose two ends land in DIFFERENT splits
    // under the q80 deterministic md5 hash split — the eval-integrity
    // check that exact-match decontamination (q79) misses, because a
    // near-duplicate of a test doc sitting in train inflates eval scores
    // without any shared fingerprint. Reported as a split×split matrix
    // (pair counts + mean Jaccard); the pair set is candidate-bounded,
    // so the split join touches pair-count rows, never corpus².
    QDef("q159_split_leakage",
      (s, d) => {
        val splits = docs(s, d)
          .withColumn("h", substring(md5(col("doc_id").cast("string")), 1, 1))
          .select(col("doc_id"),
            when(col("h").between("0", "9") || col("h").isin("a", "b"), "train")
              .when(col("h").isin("c", "d"), "val")
              .otherwise("test").as("split"))
        DedupOps.ngramJaccardPairs(docs(s, d), "doc_id", "text",
            n = 3, threshold = 0.5)
          .join(splits.select(col("doc_id").as("id_a"), col("split").as("split_a")),
            Seq("id_a"))
          .join(splits.select(col("doc_id").as("id_b"), col("split").as("split_b")),
            Seq("id_b"))
          .filter(col("split_a") =!= col("split_b"))
          .groupBy(least(col("split_a"), col("split_b")).as("split_lo"),
            greatest(col("split_a"), col("split_b")).as("split_hi"))
          .agg(count(lit(1)).cast("long").as("n_leaked_pairs"),
            round(avg(col("jaccard")), 6).as("mean_jaccard"))
          .orderBy(col("split_lo"), col("split_hi"))
      },
      Some("""WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
             |            FROM documents),
             |sh AS (SELECT doc_id, unnest(list_distinct(
             |         [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
             |          for i in range(1, greatest(len(toks) - 1, 1))])) AS s
             |       FROM t),
             |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
             |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
             |      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             |      GROUP BY 1, 2),
             |pairs AS (
             |  SELECT id_a, id_b, round(j, 6) AS jaccard FROM (
             |    SELECT id_a, id_b, CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS j
             |    FROM p JOIN sz sa ON p.id_a = sa.doc_id
             |           JOIN sz sb ON p.id_b = sb.doc_id)
             |  WHERE j >= 0.5),
             |spl AS (
             |  SELECT doc_id,
             |    CASE WHEN h BETWEEN '0' AND '9' OR h IN ('a','b') THEN 'train'
             |         WHEN h IN ('c','d') THEN 'val' ELSE 'test' END AS split
             |  FROM (SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS h
             |        FROM documents))
             |SELECT least(sa.split, sb.split) AS split_lo,
             |  greatest(sa.split, sb.split) AS split_hi,
             |  count(*) AS n_leaked_pairs,
             |  round(avg(jaccard), 6) AS mean_jaccard
             |FROM pairs JOIN spl sa ON pairs.id_a = sa.doc_id
             |           JOIN spl sb ON pairs.id_b = sb.doc_id
             |WHERE sa.split <> sb.split
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Exact sparse TF-IDF cosine pair join — the lexical-vector similarity
    // join next to set Jaccard (q24) and dense-embedding cosine (q22).
    // Zero-weight (corpus-saturating) terms are dropped before the
    // inverted index exists; the oracle recomputes every weight, norm and
    // dot product in SQL.
    QDef("q160_sparse_cosine_pairs",
      (s, d) => Similarity.sparseCosinePairs(docs(s, d), "doc_id", "text",
          threshold = 0.9)
        .orderBy(col("id_a"), col("id_b")),
      Some("""WITH tf AS (SELECT doc_id, term, count(*) AS tf FROM (
             |    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]{3,}')) AS term
             |    FROM documents) GROUP BY 1, 2),
             |n AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents),
             |idf AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
             |        FROM tf GROUP BY 1),
             |w AS (SELECT doc_id, term, tf * ln(nd / df) AS w
             |      FROM tf JOIN idf USING (term), n WHERE df < nd),
             |nm AS (SELECT doc_id, sqrt(sum(w * w)) AS norm FROM w GROUP BY 1),
             |dots AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |           sum(a.w * b.w) AS dot
             |         FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
             |         GROUP BY 1, 2)
             |SELECT id_a, id_b, round(dot / (na.norm * nb.norm), 6) AS cosine
             |FROM dots JOIN nm na ON id_a = na.doc_id
             |          JOIN nm nb ON id_b = nb.doc_id
             |WHERE round(dot / (na.norm * nb.norm), 6) >= 0.9
             |ORDER BY id_a, id_b""".stripMargin)),

    // Distributed Lloyd's k-means, k=4, ONE centroid update from the
    // deterministic lowest-id init, then a final assignment — exactly
    // unrollable in SQL (c0 → argmin → per-dim avg → argmin), the q121
    // pattern. Broadcast model-sized centroids; per-(cluster,dim) update
    // shuffle; corpus never collected. The engines compute d² by
    // different-but-equivalent formulas (dot expansion vs per-dim sum);
    // round(·,6) absorbs the ~1e-12 FP gap and argmin gaps are O(1).
    // Empty clusters: KMeansOps keeps the previous centroid (standard
    // Lloyd fix), so the oracle's c1 COALESCEs the per-dim average with
    // the init centroid — without it a cluster that attracts no points in
    // round 1 would silently vanish from the final argmin.
    QDef("q163_kmeans",
      (s, d) => KMeansOps.clusterSummary(embs(s, d), "vec_id", "embedding",
        k = 4, updates = 1),
      Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e
             |           FROM embeddings),
             |c0 AS (SELECT vec_id AS c, e FROM v WHERE vec_id < 4),
             |a1 AS (SELECT vec_id, c, e FROM (
             |    SELECT v.vec_id, c0.c, v.e,
             |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
             |        list_dot_product(v.e, v.e)
             |        - 2 * list_dot_product(v.e, c0.e)
             |        + list_dot_product(c0.e, c0.e), c0.c) AS rn
             |    FROM v, c0) WHERE rn = 1),
             |dims AS (SELECT unnest(range(1, 65)) AS i),
             |av AS (SELECT a1.c, dims.i, avg(a1.e[dims.i]) AS x
             |       FROM a1, dims GROUP BY 1, 2),
             |c1 AS (SELECT c0.c AS c, dims.i,
             |         COALESCE(av.x, c0.e[dims.i]) AS x
             |       FROM c0 CROSS JOIN dims
             |       LEFT JOIN av ON av.c = c0.c AND av.i = dims.i),
             |d2 AS (SELECT v.vec_id, c1.c,
             |         sum((v.e[c1.i] - c1.x) * (v.e[c1.i] - c1.x)) AS d
             |       FROM v, c1 GROUP BY 1, 2),
             |a2 AS (SELECT vec_id, c, d FROM (
             |    SELECT *, row_number() OVER (PARTITION BY vec_id
             |      ORDER BY d, c) AS rn FROM d2) WHERE rn = 1)
             |SELECT CAST(sp.c AS BIGINT) AS cluster,
             |  COALESCE(st.n, 0) AS n_points,
             |  COALESCE(st.mean_d2, 0.0) AS mean_d2
             |FROM (SELECT unnest(range(0, 4)) AS c) sp
             |LEFT JOIN (SELECT c, CAST(count(*) AS BIGINT) AS n,
             |             round(avg(d), 6) AS mean_d2
             |           FROM a2 GROUP BY 1) st ON sp.c = st.c
             |ORDER BY cluster""".stripMargin)),

    // Clustering-quality eval: simplified (centroid-based) silhouette per
    // cluster over the same deterministic 1-update Lloyd model as q163 —
    // the exact per-pair silhouette is O(n²); the centroid form is the
    // linear-time corpus-scale substitute. d² clamps at 0 before sqrt in
    // BOTH engines (the dot identity can go −ε).
    QDef("q204_cluster_silhouette",
      (s, d) => KMeansOps.silhouette(embs(s, d), "vec_id", "embedding",
        k = 4, updates = 1),
      Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e
             |           FROM embeddings),
             |c0 AS (SELECT vec_id AS c, e FROM v WHERE vec_id < 4),
             |a1 AS (SELECT vec_id, c, e FROM (
             |    SELECT v.vec_id, c0.c, v.e,
             |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
             |        list_dot_product(v.e, v.e)
             |        - 2 * list_dot_product(v.e, c0.e)
             |        + list_dot_product(c0.e, c0.e), c0.c) AS rn
             |    FROM v, c0) WHERE rn = 1),
             |dims AS (SELECT unnest(range(1, 65)) AS i),
             |av AS (SELECT a1.c, dims.i, avg(a1.e[dims.i]) AS x
             |       FROM a1, dims GROUP BY 1, 2),
             |c1 AS (SELECT c0.c AS c, dims.i,
             |         COALESCE(av.x, c0.e[dims.i]) AS x
             |       FROM c0 CROSS JOIN dims
             |       LEFT JOIN av ON av.c = c0.c AND av.i = dims.i),
             |d2 AS (SELECT v.vec_id, c1.c,
             |         sum((v.e[c1.i] - c1.x) * (v.e[c1.i] - c1.x)) AS d
             |       FROM v, c1 GROUP BY 1, 2),
             |rk AS (SELECT vec_id, c, d, row_number() OVER (
             |         PARTITION BY vec_id ORDER BY d, c) AS rn FROM d2),
             |per AS (SELECT vec_id,
             |    min(CASE WHEN rn = 1 THEN c END) AS cl,
             |    min(CASE WHEN rn = 1 THEN d END) AS a2,
             |    min(CASE WHEN rn = 2 THEN d END) AS b2
             |  FROM rk WHERE rn <= 2 GROUP BY 1),
             |sil AS (SELECT cl, CASE WHEN b2 <= 0 THEN 0.0
             |    ELSE (sqrt(greatest(b2, 0)) - sqrt(greatest(a2, 0)))
             |         / sqrt(greatest(b2, 0)) END AS s
             |  FROM per)
             |SELECT CAST(sp.c AS BIGINT) AS cluster,
             |  COALESCE(st.n, 0) AS n_points,
             |  COALESCE(st.ms, 0.0) AS mean_silhouette
             |FROM (SELECT unnest(range(0, 4)) AS c) sp
             |LEFT JOIN (SELECT cl, CAST(count(*) AS BIGINT) AS n,
             |             round(avg(s), 6) AS ms FROM sil GROUP BY 1) st
             |ON sp.c = st.cl
             |ORDER BY cluster""".stripMargin)),

    // Dimension-prefix variance energy: cumulative per-dim variance at
    // prefix widths 8/16/32/64 over the total — the PCA-energy evidence
    // behind choosing Matryoshka truncation widths (q182 audits the
    // BEHAVIOR of a truncation; this reports the variance it keeps).
    // One scan + windows over the 64-row dim spine only; the total is
    // max(cum) (order-insensitive — cum is monotone), so both engines
    // fold the running sum in the same ascending-dim order.
    QDef("q212_prefix_energy",
      (s, d) => {
        val st = embs(s, d)
          .select(posexplode(col("embedding").cast("array<double>"))
            .as(Seq("i", "x")))
          .groupBy(col("i"))
          .agg(avg(col("x")).as("m"), avg(col("x") * col("x")).as("m2"))
          .withColumn("v", col("m2") - col("m") * col("m"))
        val run = Window.orderBy(col("i"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        st.withColumn("cum", sum(col("v")).over(run))
          .withColumn("tot", max(col("cum")).over(
            Window.partitionBy().rowsBetween(
              Window.unboundedPreceding, Window.unboundedFollowing)))
          .filter(col("i").isin(7, 15, 31, 63))
          .select((col("i") + 1).cast("long").as("prefix_dims"),
            round(col("cum"), 6).as("cum_var"),
            floor(col("cum") * lit(1000000.0) / col("tot") + lit(0.5))
              .cast("long").as("energy_x1e6"))
          .orderBy(col("prefix_dims"))
      },
      Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
             |dims AS (SELECT unnest(range(1, 65)) AS i),
             |ex AS (SELECT vec_id, dims.i, e[dims.i] AS x FROM v, dims),
             |st AS (SELECT i, avg(x) AS m, avg(x*x) AS m2 FROM ex GROUP BY 1),
             |c AS (SELECT i, sum(m2 - m*m) OVER (ORDER BY i ROWS UNBOUNDED PRECEDING) AS cum FROM st),
             |t AS (SELECT i, cum, max(cum) OVER () AS tot FROM c)
             |SELECT CAST(i AS BIGINT) AS prefix_dims, round(cum, 6) AS cum_var,
             |  CAST(floor(cum * 1000000.0 / tot + 0.5) AS BIGINT) AS energy_x1e6
             |FROM t WHERE i IN (8, 16, 32, 64) ORDER BY 1""".stripMargin)),

    // Embedding covariance spectrum: top eigenvalue via 3 power
    // iterations, C·v unrolled as (1/n)·Σ x·(x·v − μ·v) so the d×d
    // covariance never materializes — one corpus scan per iteration,
    // driver state = two 64-vectors (the PageRank pattern on dense
    // vectors). Oracle unrolls the same 3 iterations with ordered lists
    // and list_dot_product so every scalar fold runs in the same order.
    QDef("q206_embedding_spectrum",
      (s, d) => Similarity.spectrumAudit(embs(s, d), "vec_id", "embedding",
        iters = 3),
      Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
             |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM v),
             |dims AS (SELECT unnest(range(1, 65)) AS i),
             |ex AS (SELECT vec_id, dims.i, e[dims.i] AS x FROM v, dims),
             |st AS (SELECT i, avg(x) AS m, avg(x*x) AS m2 FROM ex GROUP BY 1),
             |tv AS (SELECT sum(m2 - m*m) AS total_var FROM st),
             |mu AS (SELECT list(m ORDER BY i) AS ml FROM st),
             |u0 AS (SELECT [0.125 for x in range(64)] AS vl),
             |s1 AS (SELECT v.vec_id, list_dot_product(v.e, u0.vl)
             |         - list_dot_product(mu.ml, u0.vl) AS s FROM v, u0, mu),
             |w1 AS (SELECT ex.i, sum(ex.x * s1.s) / (SELECT n FROM nn) AS w
             |       FROM ex JOIN s1 USING (vec_id) GROUP BY 1),
             |n1 AS (SELECT sqrt(sum(w*w)) AS nr FROM w1),
             |u1 AS (SELECT list(w / (SELECT nr FROM n1) ORDER BY i) AS vl FROM w1),
             |s2 AS (SELECT v.vec_id, list_dot_product(v.e, u1.vl)
             |         - list_dot_product(mu.ml, u1.vl) AS s FROM v, u1, mu),
             |w2 AS (SELECT ex.i, sum(ex.x * s2.s) / (SELECT n FROM nn) AS w
             |       FROM ex JOIN s2 USING (vec_id) GROUP BY 1),
             |n2 AS (SELECT sqrt(sum(w*w)) AS nr FROM w2),
             |u2 AS (SELECT list(w / (SELECT nr FROM n2) ORDER BY i) AS vl FROM w2),
             |s3 AS (SELECT v.vec_id, list_dot_product(v.e, u2.vl)
             |         - list_dot_product(mu.ml, u2.vl) AS s FROM v, u2, mu),
             |w3 AS (SELECT ex.i, sum(ex.x * s3.s) / (SELECT n FROM nn) AS w
             |       FROM ex JOIN s3 USING (vec_id) GROUP BY 1),
             |n3 AS (SELECT sqrt(sum(w*w)) AS nr FROM w3)
             |SELECT CAST((SELECT n FROM nn) AS BIGINT) AS n_vecs,
             |  CAST(64 AS BIGINT) AS dim,
             |  round((SELECT total_var FROM tv), 6) AS total_var,
             |  round((SELECT nr FROM n3), 6) AS top_eig,
             |  CASE WHEN round((SELECT total_var FROM tv), 6) <= 0 THEN 0
             |    ELSE CAST(floor(round((SELECT nr FROM n3), 6) * 1000000.0
             |      / round((SELECT total_var FROM tv), 6) + 0.5) AS BIGINT)
             |  END AS explained_x1e6""".stripMargin)),

    // Dedup threshold sensitivity: the exact pair table computed ONCE at a
    // low floor (J ≥ 0.3), then swept across candidate thresholds — pairs
    // removed and docs touched per τ, the table a dedup-aggressiveness
    // decision reads. The sweep joins the (already materialized) pair
    // table against a 5-row broadcast threshold spine; comparisons run on
    // the 6dp-rounded Jaccard both engines share.
    QDef("q167_dedup_sensitivity",
      (s, d) => {
        val pairs = DedupOps.ngramJaccardPairs(docs(s, d), "doc_id", "text",
          n = 3, threshold = 0.3)
        val th = s.range(5, 10)
          .select((col("id") * 10).cast("int").as("threshold_x100"))
        val m = pairs.join(broadcast(th),
          col("jaccard") >= col("threshold_x100").cast("double") / 100.0)
        val np = m.groupBy(col("threshold_x100"))
          .agg(count(lit(1)).cast("long").as("n_pairs"))
        val nd = m.select(col("threshold_x100"),
            explode(array(col("id_a"), col("id_b"))).as("dd"))
          .groupBy(col("threshold_x100"))
          .agg(countDistinct(col("dd")).cast("long").as("n_docs"))
        th.join(np, Seq("threshold_x100"), "left")
          .join(nd, Seq("threshold_x100"), "left")
          .select(col("threshold_x100").cast("long").as("threshold_x100"),
            coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
            coalesce(col("n_docs"), lit(0L)).as("n_docs"))
          .orderBy(col("threshold_x100"))
      },
      Some("""WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
             |            FROM documents),
             |sh AS (SELECT doc_id, unnest(list_distinct(
             |         [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
             |          for i in range(1, greatest(len(toks) - 1, 1))])) AS s
             |       FROM t),
             |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
             |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
             |      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             |      GROUP BY 1, 2),
             |pr AS (SELECT id_a, id_b, round(j, 6) AS jac FROM (
             |    SELECT id_a, id_b, CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS j
             |    FROM p JOIN sz sa ON p.id_a = sa.doc_id
             |           JOIN sz sb ON p.id_b = sb.doc_id)
             |  WHERE j >= 0.3),
             |th(t) AS (VALUES (50), (60), (70), (80), (90)),
             |m AS (SELECT th.t, pr.id_a, pr.id_b
             |      FROM pr JOIN th ON pr.jac >= th.t / 100.0),
             |np AS (SELECT t, CAST(count(*) AS BIGINT) AS n_pairs
             |       FROM m GROUP BY 1),
             |nd AS (SELECT t, CAST(count(DISTINCT dd) AS BIGINT) AS n_docs
             |       FROM (SELECT t, id_a AS dd FROM m
             |             UNION ALL SELECT t, id_b FROM m) GROUP BY 1)
             |SELECT CAST(th.t AS BIGINT) AS threshold_x100,
             |  COALESCE(np.n_pairs, 0) AS n_pairs,
             |  COALESCE(nd.n_docs, 0) AS n_docs
             |FROM th LEFT JOIN np ON th.t = np.t
             |        LEFT JOIN nd ON th.t = nd.t
             |ORDER BY threshold_x100""".stripMargin)),

    // Winnowing (MOSS) fingerprint near-dup pairs: positional 3-gram md5
    // hex hashes, 4-hash window minima, pairs sharing ≥ 5 fingerprints.
    // Hex-string mins make the selection engine-portable, so the oracle
    // reproduces the EXACT fingerprint sets — no recall argument needed.
    QDef("q168_winnowing_pairs",
      (s, d) => DedupOps.winnowingPairs(docs(s, d), "doc_id", "text",
          k = 3, w = 4, minShared = 5L)
        .orderBy(col("id_a"), col("id_b")),
      Some("""WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
             |            FROM documents),
             |pos AS (SELECT doc_id, unnest(range(1, len(ts) - 1)) AS i, ts,
             |          len(ts) - 2 AS np
             |        FROM tok),
             |h AS (SELECT doc_id, i, np,
             |        md5(array_to_string(ts[i:i+2], ' ')) AS h
             |      FROM pos),
             |mh AS (SELECT doc_id, i, np, min(h) OVER (PARTITION BY doc_id
             |         ORDER BY i ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mh
             |       FROM h),
             |fp AS (SELECT DISTINCT doc_id, mh FROM mh WHERE i <= np - 3),
             |pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |         CAST(count(*) AS BIGINT) AS shared
             |       FROM fp a JOIN fp b ON a.mh = b.mh AND a.doc_id < b.doc_id
             |       GROUP BY 1, 2 HAVING count(*) >= 5)
             |SELECT id_a, id_b, shared FROM pr
             |ORDER BY id_a, id_b""".stripMargin)),

    // MinHash estimator calibration: signature-estimated Jaccard vs exact
    // on every true pair — the k-selection evidence for the LSH scale
    // path. The oracle recomputes the k=8 signatures bit-for-bit from the
    // SAME affine coefficients (interpolated below) over the portable
    // md5-low-64 mod p base hash.
    QDef("q178_minhash_estimate",
      (s, d) => DedupOps.minhashEstimateAudit(docs(s, d), "doc_id", "text",
          n = 3, threshold = 0.5, k = 8)
        .orderBy(col("id_a"), col("id_b")),
      Some {
        val sigCols = DedupOps.minhashCoefs(8, 42L).zipWithIndex.map {
          case ((a, b), i) =>
            s"CAST(min(($a * x + $b) % 2147483647) AS BIGINT) AS mh_$i"
        }.mkString(",\n")
        val estSum = (0 until 8)
          .map(i => s"CASE WHEN ga.mh_$i = gb.mh_$i THEN 1 ELSE 0 END")
          .mkString(" + ")
        s"""WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
           |            FROM documents),
           |sh AS (SELECT doc_id, unnest(list_distinct(
           |         [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
           |          for i in range(1, greatest(len(toks) - 1, 1))])) AS s
           |       FROM t),
           |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
           |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
           |      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
           |      GROUP BY 1, 2),
           |pj AS (SELECT id_a, id_b, CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS j
           |       FROM p JOIN sz sa ON p.id_a = sa.doc_id
           |              JOIN sz sb ON p.id_b = sb.doc_id
           |       WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5),
           |hx AS (SELECT doc_id, CAST(md5_number_lower(s) AS HUGEINT) % 2147483647 AS x
           |       FROM sh),
           |sg AS (SELECT doc_id,
           |$sigCols
           |       FROM hx GROUP BY 1)
           |SELECT id_a, id_b, round(j, 6) AS jaccard,
           |       round(($estSum) / 8.0, 6) AS est_jaccard,
           |       round(abs(($estSum) / 8.0 - j), 6) AS abs_err
           |FROM pj JOIN sg ga ON pj.id_a = ga.doc_id
           |        JOIN sg gb ON pj.id_b = gb.doc_id
           |ORDER BY id_a, id_b""".stripMargin
      }),

    // Content-defined chunking dup profile: boundaries where the trailing
    // 8-char window's polynomial hash ≡ 0 (mod 64) — content-anchored;
    // the oracle re-chunks bit-for-bit from the SAME power-of-B literals.
    QDef("q179_cdc_dedup",
      (s, d) => DedupOps.cdcDupProfile(docs(s, d), "doc_id", "text",
          w = 8, modulus = 64)
        .orderBy(col("doc_id")),
      Some {
        val winSum = DedupOps.cdcPows(8).zipWithIndex
          .map { case (p, j) => s"cs[i - ${7 - j}] * $p" }
          .mkString(" + ")
        s"""WITH t AS (SELECT doc_id, text AS s,
           |             [unicode(ch)::BIGINT for ch in string_split(text, '')] AS cs
           |            FROM documents
           |            WHERE text IS NOT NULL AND len(text) > 0),
           |bl AS (SELECT doc_id, s,
           |         [i for i in range(8, len(s) + 1)
           |          if (($winSum) % ${DedupOps.CdcM}) % 64 = 0] AS mids
           |       FROM t),
           |""".stripMargin + """b AS (SELECT doc_id, s,
             |        list_concat(list_concat([0], mids),
             |          CASE WHEN len(mids) > 0 AND mids[-1] = len(s)
             |               THEN [] ELSE [len(s)] END) AS bs
             |      FROM bl),
             |ch AS (SELECT doc_id,
             |         unnest([substr(s, bs[j] + 1, bs[j + 1] - bs[j])
             |                 for j in range(1, len(bs))]) AS chunk
             |       FROM b),
             |fr AS (SELECT chunk, count(*) AS n FROM ch GROUP BY 1)
             |SELECT doc_id,
             |  CAST(count(*) AS BIGINT) AS n_chunks,
             |  CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_chunks,
             |  CAST(sum(len(chunk)) AS BIGINT) AS total_chars,
             |  CAST(sum(CASE WHEN n >= 2 THEN len(chunk) ELSE 0 END) AS BIGINT) AS dup_chars,
             |  round(sum(CASE WHEN n >= 2 THEN len(chunk) ELSE 0 END)::DOUBLE
             |        / sum(len(chunk))::DOUBLE, 6) AS dup_frac
             |FROM ch JOIN fr USING (chunk)
             |GROUP BY 1 ORDER BY doc_id""".stripMargin
      }),

    // Matryoshka truncation audit: top-10 overlap between full-dim (64)
    // and first-16-dim cosine retrieval for the first 5 query vectors —
    // the recall-cost evidence for serving truncated embeddings.
    QDef("q182_matryoshka",
      (s, d) => Similarity.truncationAudit(
          embs(s, d).filter(col("vec_id") < 5), embs(s, d),
          "vec_id", "embedding", dims = 16, k = 10)
        .orderBy(col("query_id")),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
             |      FROM embeddings WHERE vec_id < 5),
             |pf AS (SELECT qid, e.vec_id AS vid,
             |         list_dot_product(e.v, q.qv)
             |           / (sqrt(list_dot_product(e.v, e.v))
             |              * sqrt(list_dot_product(q.qv, q.qv))) AS sim
             |       FROM e, q WHERE e.vec_id <> q.qid),
             |pt AS (SELECT qid, e.vec_id AS vid,
             |         list_dot_product(e.v[1:16], q.qv[1:16])
             |           / (sqrt(list_dot_product(e.v[1:16], e.v[1:16]))
             |              * sqrt(list_dot_product(q.qv[1:16], q.qv[1:16]))) AS sim
             |       FROM e, q WHERE e.vec_id <> q.qid),
             |rf AS (SELECT qid, vid,
             |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vid) AS r
             |       FROM pf QUALIFY r <= 10),
             |rt AS (SELECT qid, vid,
             |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vid) AS r
             |       FROM pt QUALIFY r <= 10)
             |SELECT COALESCE(rf.qid, rt.qid) AS query_id,
             |  CAST(sum(CASE WHEN rf.vid IS NOT NULL AND rt.vid IS NOT NULL
             |           THEN 1 ELSE 0 END) AS BIGINT) AS overlap,
             |  max(CASE WHEN rf.r = 1 THEN rf.vid END) AS top1_full,
             |  max(CASE WHEN rt.r = 1 THEN rt.vid END) AS top1_trunc,
             |  round(sum(CASE WHEN rf.vid IS NOT NULL AND rt.vid IS NOT NULL
             |            THEN 1 ELSE 0 END)::DOUBLE / 10.0, 6) AS overlap_frac
             |FROM rf FULL JOIN rt ON rf.qid = rt.qid AND rf.vid = rt.vid
             |GROUP BY 1 ORDER BY query_id""".stripMargin)),

    // ── Quantified-recall family (q217/q218/q219): the three approximate
    // paths (q46 IVF, q88 PQ, q138 clustered SemDeDup) are genuinely
    // inexact, so THEY can't be oracled — but their recall/containment
    // CAN be, by running the same algorithm (same configs, same first-k
    // Lloyd's init, same plan shapes) in fixed-point integer arithmetic
    // (PortableAnn: quantize floor(x·1024+0.5), integer L2², truncating
    // centroid means). Every step is then order-independent and exactly
    // restatable in DuckDB SQL — the k-means iterations appear UNROLLED
    // in the oracle below, so the driver gate hash-checks the recall
    // number itself, not just a row count. ──

    // IVF recall@5 vs exhaustive, q46's config (k=8, iters=2, nprobe=3,
    // queries vec_id<5) in portable arithmetic. recall_x1e6 = hits·200000.
    QDef("q217_ivf_recall",
      (s, d) => {
        val corpus = embs(s, d).select(col("vec_id"),
          PortableAnn.quant(col("embedding")).as("qv"))
        val model = PortableAnn.train(corpus, "vec_id", "qv", k = 8, iters = 2)
        val queries = corpus.filter(col("vec_id") < 5)
        val approx = PortableAnn.ivfSearch(queries, corpus, "vec_id", "qv",
            model, nprobe = 3, topK = 5)
          .select(col("query_id"), col("vec_id"), lit(1).as("hit"))
        PortableAnn.exactTopK(queries, corpus, "vec_id", "qv", topK = 5)
          .select(col("query_id"), col("vec_id"))
          .join(approx, Seq("query_id", "vec_id"), "left")
          .groupBy(col("query_id"))
          .agg(sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hits"))
          .select(col("query_id"), col("n_hits"),
            (col("n_hits") * lit(200000L)).as("recall_x1e6"))
          .orderBy(col("query_id"))
      },
      Some(ivfRecallSql)),

    // PQ recall@10 vs exhaustive, q88's config (m=8, k=16, iters=2,
    // query = vec 0, shortlist 50) in portable arithmetic. The ADC lookup
    // table is a driver-side lut in Spark and a relational join against
    // the codebook CTE in SQL — same integers. recall_x1e6 = hits·100000.
    QDef("q218_pq_recall",
      (s, d) => {
        val corpus = embs(s, d).select(col("vec_id"),
          PortableAnn.quant(col("embedding")).as("qv"))
        val books = PortableAnn.pqTrain(corpus, "vec_id", "qv",
          m = 8, subDim = 8, k = 16, iters = 2)
        val qvec = corpus.filter(col("vec_id") === 0L)
          .select(col("qv")).head().getSeq[Long](0).toArray
        val rest = corpus.filter(col("vec_id") =!= 0L)
        val approx = PortableAnn.pqSearchWithRerank(rest, "vec_id", "qv",
            books, qvec, subDim = 8, shortlist = 50, topK = 10)
          .select(col("vec_id"), lit(1).as("hit"))
        PortableAnn.exactTopK(
            corpus.filter(col("vec_id") === 0L), rest, "vec_id", "qv",
            topK = 10)
          .select(col("vec_id"))
          .join(approx, Seq("vec_id"), "left")
          .agg(sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hits"))
          .select(col("n_hits"),
            (col("n_hits") * lit(100000L)).as("recall_x1e6"))
      },
      Some(pqRecallSql)),

    // Clustered-SemDeDup containment vs exhaustive over the q137 slice
    // (vec_id < 2000), q138's algorithm (k-means cells, per-cell pairs,
    // cos ≥ 0.4 with a lower id drops the higher id) in portable
    // arithmetic:
    // cos ≥ 2/5 becomes the exact integer predicate dot > 0 ∧
    // 25·dot² ≥ 4·‖a‖²·‖b‖². n_violations = clustered drops that the
    // exhaustive pass does NOT drop — 0 by theorem (a within-cell
    // neighbor is a global neighbor); containment_x1e6 quantifies the
    // cross-cluster misses the scale path trades away.
    QDef("q219_semdedup_containment",
      (s, d) => {
        val base = embs(s, d).filter(col("vec_id") < 2000)
          .select(col("vec_id"), PortableAnn.quant(col("embedding")).as("qv"))
        val model = PortableAnn.train(base, "vec_id", "qv", k = 8, iters = 2)
        val a = base
          .withColumn("cell", PortableAnn.bestCell(col("qv"), model))
          .withColumn("n2", PortableAnn.dotL(col("qv"), col("qv")))
        val lo = a.select(col("vec_id").as("ia"), col("qv").as("qa"),
          col("n2").as("na2"), col("cell").as("ca"))
        val hi = a.select(col("vec_id").as("ib"), col("qv").as("qb"),
          col("n2").as("nb2"), col("cell").as("cb"))
        def drops(joined: DataFrame): DataFrame = joined
          .filter(col("ia") < col("ib"))
          .select(col("ib"), PortableAnn.dotL(col("qa"), col("qb")).as("dp"),
            col("na2"), col("nb2"))
          .filter(PortableAnn.cosGe(col("dp"), col("na2"), col("nb2"), 2, 5))
          .select(col("ib")).distinct()
        val cdrop = drops(lo.join(hi, col("ca") === col("cb")))
        val edrop = drops(lo.crossJoin(hi))
        val nv = base.agg(count(lit(1)).cast("long").as("n_vectors"))
        val nc = cdrop.agg(count(lit(1)).cast("long").as("n_drops_clustered"))
        val ne = edrop.agg(count(lit(1)).cast("long").as("n_drops_exhaustive"))
        val viol = cdrop.join(edrop, Seq("ib"), "left_anti")
          .agg(count(lit(1)).cast("long").as("n_violations"))
        nv.crossJoin(nc).crossJoin(ne).crossJoin(viol)
          .select(col("n_vectors"), col("n_drops_clustered"),
            col("n_drops_exhaustive"), col("n_violations"),
            when(col("n_drops_exhaustive") === 0L, lit(1000000L))
              .otherwise(expr(
                "CAST(n_drops_clustered * 1000000 DIV n_drops_exhaustive AS BIGINT)"))
              .as("containment_x1e6"))
      },
      Some(semdedupContainSql)),

    // SQ8 recall@10 at the APPROXIMATE operating point (shortlist 50 —
    // q135 is the shortlist=corpus exact twin), completing the
    // driver-visible recall family across the whole ANN ladder
    // (IVF q217 / PQ q218 / SQ q220). Portable arithmetic: codes via
    // exact integer rounding, byte-scan distances in ×255-scaled
    // integers, so training + search restate in SQL bit-for-bit.
    QDef("q220_sq_recall",
      (s, d) => {
        val corpus = embs(s, d).select(col("vec_id"),
          PortableAnn.quant(col("embedding")).as("qv"))
        val (mins, deltas) = PortableAnn.sqTrain(corpus, "qv")
        val qvec = corpus.filter(col("vec_id") === 0L)
          .select(col("qv")).head().getSeq[Long](0).toArray
        val rest = corpus.filter(col("vec_id") =!= 0L)
        val approx = PortableAnn.sqSearchWithRerank(rest, "vec_id", "qv",
            mins, deltas, qvec, shortlist = 50, topK = 10)
          .select(col("vec_id"), lit(1).as("hit"))
        PortableAnn.exactTopK(
            corpus.filter(col("vec_id") === 0L), rest, "vec_id", "qv",
            topK = 10)
          .select(col("vec_id"))
          .join(approx, Seq("vec_id"), "left")
          .agg(sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hits"))
          .select(col("n_hits"),
            (col("n_hits") * lit(100000L)).as("recall_x1e6"))
      },
      Some(sqRecallSql)),

    // Greedy k-center coreset (Gonzalez farthest-first): 8 diversity-
    // maximizing exemplars over the quantized embedding corpus, with the
    // covering-radius² curve. Deterministic end-to-end (integer L2²,
    // fully tie-broken argmax), so the oracle below unrolls the 8 greedy
    // rounds as CTEs and the gate hash-checks the SELECTION ITSELF —
    // which ids, in which order, at which radius.
    QDef("q221_kcenter_coreset",
      (s, d) => DataSelection.kcenterCoreset(
          embs(s, d).select(col("vec_id"),
            PortableAnn.quant(col("embedding")).as("qv")),
          "vec_id", "qv", k = 8)
        .orderBy(col("sel_rank")),
      Some(kcenterSql(8))),

    // Greedy max-coverage selection: 5 documents covering the most word
    // 3-grams (submodular (1−1/e) greedy), with marginal gains and the
    // running coverage curve. q221's dual in n-gram space — the oracle
    // unrolls the 5 greedy rounds (argmax → fold into covered set) so
    // the gate hash-checks picks, gains, and coverage exactly.
    QDef("q222_greedy_coverage",
      (s, d) => DataSelection.greedyCoverage(docs(s, d), "doc_id", "text",
          n = 3, k = 5)
        .orderBy(col("sel_rank")),
      Some(coverageSql(5))),

    // Johnson–Lindenstrauss distortion audit: 64→16-dim ±1 random
    // projection (Achlioptas signs from the md5-portable hash, so the
    // matrix itself restates in SQL) over the first 20 vectors, with the
    // exact integer distance ratio per pair. distortion_x1e6 ≈ 1e6 means
    // the projected space preserves the pair's distance — the evidence
    // behind projecting BEFORE the ANN ladder at 100 TB (4× fewer bytes
    // per distance everywhere downstream). Map-only projection: the sign
    // matrix ships in the closure; nothing new shuffles.
    QDef("q223_jl_distortion",
      (s, d) => {
        val signs = PortableAnn.rpSigns(16, 64)
        val base = embs(s, d).filter(col("vec_id") < 20)
          .select(col("vec_id"), PortableAnn.quant(col("embedding")).as("qv"))
          .withColumn("py", PortableAnn.rpProject(col("qv"), signs))
        val a = base.select(col("vec_id").as("id_a"), col("qv").as("qa"),
          col("py").as("pa"))
        val b = base.select(col("vec_id").as("id_b"), col("qv").as("qb"),
          col("py").as("pb"))
        a.join(b, col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"),
            PortableAnn.dist2(col("qa"), col("qb")).as("d2_orig"),
            PortableAnn.dist2(col("pa"), col("pb")).as("d2_proj"))
          .withColumn("distortion_x1e6",
            when(col("d2_orig") === 0L, lit(1000000L))
              .otherwise(expr(
                "CAST(d2_proj * 1000000 DIV (16 * d2_orig) AS BIGINT)")))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(jlSql)),

    // Triplet mining: per anchor (vec_id < 8), the 5 NEAREST wrong-label
    // vectors (hard negatives — what a triplet/InfoNCE batch should
    // contain) and the single FARTHEST same-label vector (hardest
    // positive) — q118's negative-only mining completed into triplet
    // construction, and in exact integer L2² (not rounded float cosine)
    // over quantized vectors so the gate hash-checks the selection; the
    // 8-anchor set broadcasts over one corpus scan, rank windows
    // partition on query_id. 100 TB path: swap the exhaustive scan for
    // the IVF probe join (PortableAnn.ivfSearch) — label logic and
    // ranking identical.
    QDef("q224_hard_negatives",
      (s, d) => {
        val base = embs(s, d).select(col("vec_id"),
          PortableAnn.quant(col("embedding")).as("qv"), col("label"))
        PortableAnn.hardExamples(base.filter(col("vec_id") < 8), base,
            "vec_id", "qv", "label", negK = 5)
          .orderBy(col("query_id"), col("kind"), col("rank"))
      },
      Some(hardNegSql)),

    // Recall of the IVF-probed hard-negative path vs q224's exhaustive
    // selection (the q217 pattern applied to q224's documented scale
    // path): candidates come from the anchor's 3 nearest k-means cells
    // only, then the same wrong-label filter and (d², id) ranking.
    // Portable arithmetic end-to-end — training unrolled in the oracle —
    // so the gate hash-checks the recall number per anchor.
    QDef("q225_hard_negative_recall",
      (s, d) => {
        val base = embs(s, d).select(col("vec_id"),
          PortableAnn.quant(col("embedding")).as("qv"), col("label"))
        val model = PortableAnn.train(base, "vec_id", "qv", k = 8, iters = 2)
        val anchors = base.filter(col("vec_id") < 8)
        val approx = PortableAnn.ivfHardNegatives(anchors, base, "vec_id",
            "qv", "label", model, nprobe = 3, negK = 5)
          .select(col("query_id"), col("vec_id"), lit(1).as("hit"))
        PortableAnn.hardExamples(anchors, base, "vec_id", "qv", "label",
            negK = 5)
          .filter(col("kind") === "neg")
          .select(col("query_id"), col("vec_id"))
          .join(approx, Seq("query_id", "vec_id"), "left")
          .groupBy(col("query_id"))
          .agg(sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hits"))
          .select(col("query_id"), col("n_hits"),
            (col("n_hits") * lit(200000L)).as("recall_x1e6"))
          .orderBy(col("query_id"))
      },
      Some(hardNegRecallSql)),

    // Quantizer-DRIFT audit — the gate row behind the
    // `IvfIndex.retrainCompact` / `IvfPq.retrainCompact` decision:
    // appends assign to the ORIGINAL centroids (the standard IVF
    // maintenance contract), so after heavy growth the audit quantifies
    // how stale the quantizer is. The scenario: a model trained on the
    // first 80% of the corpus (by id — the pre-append state), then the
    // full corpus assigned to it ("before retrain") vs to a model
    // retrained on everything ("after"). Three drift signals per phase,
    // all in PortableAnn fixed-point so the numbers hash-check (q217's
    // pattern, k-means unrolled in the oracle): mean and p90
    // distance-to-assigned-centroid (quantization error — what probe
    // recall decays with) and cell-size skew max·k/n ×1e6 (hot cells =
    // probe-read imbalance). Retrain when the before/after gap is
    // material; PERF.md records the measured gap at sf0.1.
    QDef("q236_ivf_drift_audit",
      (s, d) => {
        val k = 8
        // cached: the quantized corpus feeds the cut count, two k-means
        // trains (2 iterations of jobs each) and both audits — ~10
        // consumers that each re-ran the quantization projection
        // (released by the session's post-query clearCache, the shared
        // in-query-cache convention)
        val corpus = embs(s, d).select(col("vec_id"),
          PortableAnn.quant(col("embedding")).as("qv")).cache()
        val phaseCaches = scala.collection.mutable.ArrayBuffer[DataFrame]()
        try {
        // the pre-append corpus: first 80% of ids (appends arrive as new
        // ids); one bounded count fixes the cut on both engines
        val cut = corpus.count() * 4L / 5L
        val before = PortableAnn.train(corpus.filter(col("vec_id") < cut),
          "vec_id", "qv", k = k, iters = 2)
        val after = PortableAnn.train(corpus, "vec_id", "qv", k = k,
          iters = 2)
        def audit(m: PortableAnn.QModel, phase: String): DataFrame = {
          // cached per phase: the (cell, d2) assignment feeds the n/sum
          // aggregate, the max-cell aggregate and both prefix-sum passes
          val a = corpus.select(col("vec_id"),
            PortableAnn.bestCell(col("qv"), m).as("cell"),
            PortableAnn.bestDist2(col("qv"), m).as("d2")).cache()
          phaseCaches += a
          val nAgg = a.agg(count(lit(1)).cast("long").as("n_vectors"),
            sum(col("d2")).cast("long").as("sum_d2"))
          val cells = a.groupBy(col("cell"))
            .agg(count(lit(1)).cast("long").as("cn"))
            .agg(max(col("cn")).cast("long").as("max_cell_n"))
          // exact p90 without a corpus-scale global sort OR a global
          // window: cumulative counts over the DISTINCT-d2 histogram via
          // the two-pass bucketed prefix sum (q187's shape). The
          // histogram is NOT provably small — quantized 64-dim L2² takes
          // up to ~min(n, 2.7e8) distinct values, so at 100× scale a
          // single-partition window over it would carry ~1e8 rows;
          // PrefixSum keeps work per task O(rows/buckets) with
          // driver-tiny bucket offsets. Then min d2 with cum ≥ ⌈0.9·n⌉.
          val hist = a.groupBy(col("d2"))
            .agg(count(lit(1)).cast("long").as("cnt"))
          val cum = graft.operators.PrefixSum.runningSum(
            hist, "d2", "cnt", "cum")
          val p90 = cum
            .crossJoin(broadcast(nAgg.select(col("n_vectors").as("__n"))))
            .filter(col("cum") * lit(10L) >= col("__n") * lit(9L))
            .agg(min(col("d2")).cast("long").as("p90_d2"))
          nAgg.crossJoin(broadcast(cells)).crossJoin(broadcast(p90))
            .select(lit(phase).as("phase"), col("n_vectors"),
              expr("CAST(sum_d2 DIV n_vectors AS BIGINT)").as("mean_d2"),
              col("p90_d2"), col("max_cell_n"),
              expr(s"CAST(max_cell_n * $k * 1000000 DIV n_vectors AS BIGINT)")
                .as("skew_x1e6"))
        }
        // the audit output is TWO rows — checkpoint them and release every
        // in-query cache before returning (q242's discipline: no query
        // relies on the harness's post-query clearCache for memory safety)
        graft.operators.DedupOps.materializeAndRelease(
          audit(before, "before_retrain")
            .unionByName(audit(after, "after_retrain"))
            .orderBy(col("phase")),
          phaseCaches.toSeq: _*)
        } finally corpus.unpersist()
      },
      Some(ivfDriftSql)),

    // Binary-quantization rerank search — the rung UNDER SQ8 on the ANN
    // ladder (Lucene/FAISS BQ): per-dim mean sign bits packed into ONE
    // long (d = 64 → 8 bytes/vector, 64× smaller than the quantized
    // form — at 100 TB the pre-rank scans a code table ~8 GB per 10⁹
    // vectors, cacheable where the vectors are not), Hamming pre-rank
    // via codegen'd bit_count(xor), exact integer-L2² rerank of the
    // 50-shortlist. The threshold is division-free (bit = n·x > Σx, the
    // mean test multiplied through by n) and ties break by id, so —
    // unlike PQ/SQ whose gates check recall — the APPROXIMATE OUTPUT
    // itself hash-checks: which ids, at which exact distances.
    QDef("q237_bq_rerank",
      (s, d) => {
        val corpus = embs(s, d).select(col("vec_id"),
          PortableAnn.quant(col("embedding")).as("qv"))
        val (n, sums) = PortableAnn.bqTrain(corpus, "qv")
        val qvec = corpus.filter(col("vec_id") === 0L)
          .select(col("qv")).head().getSeq[Long](0).toArray
        PortableAnn.bqSearchWithRerank(corpus.filter(col("vec_id") =!= 0L),
            "vec_id", "qv", n, sums, qvec, shortlist = 50, topK = 10)
          .orderBy(col("d2"), col("vec_id"))
      },
      Some(bqRerankSql)),

    // BQ recall@10 vs exhaustive at the q218/q220 operating point
    // (query = vec 0, shortlist 50) — completes the driver-visible
    // recall family across the whole ANN ladder (IVF q217 / PQ q218 /
    // SQ q220 / BQ q238): what one bit per dimension trades for the 64×
    // compression, hash-checked. recall_x1e6 = hits·100000.
    QDef("q238_bq_recall",
      (s, d) => {
        val corpus = embs(s, d).select(col("vec_id"),
          PortableAnn.quant(col("embedding")).as("qv"))
        val (n, sums) = PortableAnn.bqTrain(corpus, "qv")
        val qvec = corpus.filter(col("vec_id") === 0L)
          .select(col("qv")).head().getSeq[Long](0).toArray
        val rest = corpus.filter(col("vec_id") =!= 0L)
        val approx = PortableAnn.bqSearchWithRerank(rest, "vec_id", "qv",
            n, sums, qvec, shortlist = 50, topK = 10)
          .select(col("vec_id"), lit(1).as("hit"))
        PortableAnn.exactTopK(
            corpus.filter(col("vec_id") === 0L), rest, "vec_id", "qv",
            topK = 10)
          .select(col("vec_id"))
          .join(approx, Seq("vec_id"), "left")
          .agg(sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hits"))
          .select(col("n_hits"),
            (col("n_hits") * lit(100000L)).as("recall_x1e6"))
      },
      Some(bqRecallSql)),

    // BQ through the PERSISTED code-table index ([[BqIndex]], the fifth
    // index layout): build writes (id, code) + the (n, Σx) model rows,
    // search Hamming-preranks the 8-byte-per-vector code table and joins
    // back to the vectors only for the 50-row exact rerank. Same config
    // as q237 — the in-memory rung — and the SAME oracle: the persisted
    // path must be row-identical (the q226/q227 pattern applied to BQ).
    // Lifecycle (append / delete / segments / compaction) is pinned in
    // BqIndexSpec; code-table-bytes ≪ vector-bytes in IndexScaleProbe.
    QDef("q90_bq_indexed",
      (s, d) => {
        val corpus = embs(s, d).select(col("vec_id"),
          PortableAnn.quant(col("embedding")).as("qv"))
        val dir = graft.Scratch.dir("q90_bq_index")
        BqIndex.writeIndex(corpus, "vec_id", "qv", dir)
        val qvec = corpus.filter(col("vec_id") === 0L)
          .select(col("qv")).head().getSeq[Long](0).toArray
        BqIndex.searchWithRerank(s, dir, corpus, "vec_id", "qv", qvec,
            shortlist = 50, topK = 10, excludeId = Some(0L))
          .orderBy(col("d2"), col("vec_id"))
      },
      Some(bqRerankSql)),

    // The composed ladder rung: Johnson–Lindenstrauss ±1 projection
    // (64→16 dims, q223's matrix) UNDER binary quantization — 16-bit
    // codes, a 256× pre-rank compression of the quantized vectors for
    // one xor+popcount per row — with the exact integer-L2² rerank in
    // the ORIGINAL 64-dim space. recall@10 vs the exhaustive
    // original-space top-10, hash-checked end to end (projection matrix,
    // thresholds, codes, shortlist, rerank all restate in SQL).
    QDef("q239_rp_bq_recall",
      (s, d) => {
        val signs = PortableAnn.rpSigns(16, 64)
        val corpus = embs(s, d).select(col("vec_id"),
            PortableAnn.quant(col("embedding")).as("qv"))
          .withColumn("py", PortableAnn.rpProject(col("qv"), signs))
        val (n, sums) = PortableAnn.bqTrain(corpus, "py")
        val qrow = corpus.filter(col("vec_id") === 0L)
          .select(col("qv"), col("py")).head()
        val qv = qrow.getSeq[Long](0).toArray
        val qcode = PortableAnn.bqPack(qrow.getSeq[Long](1).toArray, n, sums)
        val rest = corpus.filter(col("vec_id") =!= 0L)
        val cand = rest
          .select(col("vec_id"),
            PortableAnn.hamming(PortableAnn.bqCode(col("py"), n, sums),
              lit(qcode)).as("h"))
          .orderBy(col("h"), col("vec_id"))
          .limit(50)
        val approx = rest
          .join(cand.select("vec_id"), Seq("vec_id"), "left_semi")
          .select(col("vec_id"),
            PortableAnn.dist2(col("qv"), typedLit(qv.toSeq)).as("d2"))
          .orderBy(col("d2"), col("vec_id"))
          .limit(10)
          .select(col("vec_id"), lit(1).as("hit"))
        PortableAnn.exactTopK(
            corpus.filter(col("vec_id") === 0L), rest, "vec_id", "qv",
            topK = 10)
          .select(col("vec_id"))
          .join(approx, Seq("vec_id"), "left")
          .agg(sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hits"))
          .select(col("n_hits"),
            (col("n_hits") * lit(100000L)).as("recall_x1e6"))
      },
      Some(rpBqRecallSql)),

    // The BATCH BQ path at full width: shortlist = corpus degrades
    // searchBatch to exact per-query integer-L2² top-k — the
    // oracle-visible twin that hash-checks the one-scan multi-query
    // machinery end to end (broadcast packed query codes, per-query
    // Hamming rank windows over ONE code-table read, union-shortlist
    // rerank join). Same q235 trick; the shortlisted approximate path
    // stays q90/q237's territory.
    QDef("q240_bq_batch_exact",
      (s, d) => {
        val corpus = embs(s, d).select(col("vec_id"),
          PortableAnn.quant(col("embedding")).as("qv"))
        val n = corpus.count().toInt
        val dir = graft.Scratch.dir("q240_bq_index")
        BqIndex.writeIndex(corpus, "vec_id", "qv", dir)
        BqIndex.searchBatch(s, dir, corpus, corpus.filter(col("vec_id") < 5),
            "vec_id", "qv", shortlist = n, topK = 5, excludeSelf = true)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(bqBatchSql)),

    // BQ threshold-DRIFT audit — q236's "measure, then act" applied to
    // the fifth layout: appends/segments encode against the PERSISTED
    // (n, Σx) model (codes stay comparable; thresholds drift only at
    // rebuild), so after heavy growth the per-dim mean tests no longer
    // reflect the corpus. The audit codes every vector under the
    // pre-append model (first 80% by id) AND a fresh full-corpus model
    // and reports the exact bit-flip spectrum: total flipped bits, the
    // per-bit flip rate, and the fraction of vectors whose code changed
    // at all — rising rates mean Hamming pre-ranks are drifting off the
    // corpus geometry and a rebuild (BqIndex.writeIndex) is due. All
    // integer, hash-checked.
    QDef("q241_bq_drift_audit",
      (s, d) => {
        val corpus = embs(s, d).select(col("vec_id"),
          PortableAnn.quant(col("embedding")).as("qv"))
        val cut = corpus.count() * 4L / 5L
        val (nb, sumsB) =
          PortableAnn.bqTrain(corpus.filter(col("vec_id") < cut), "qv")
        val (nf, sumsF) = PortableAnn.bqTrain(corpus, "qv")
        corpus
          .select(PortableAnn.hamming(
            PortableAnn.bqCode(col("qv"), nb, sumsB),
            PortableAnn.bqCode(col("qv"), nf, sumsF)).as("flips"))
          .agg(count(lit(1)).cast("long").as("n_vectors"),
            sum(col("flips")).cast("long").as("sum_flipped_bits"),
            count(when(col("flips") > 0, lit(1))).cast("long").as("__chg"))
          .select(col("n_vectors"), col("sum_flipped_bits"),
            expr("CAST(sum_flipped_bits * 1000000 DIV (n_vectors * 64) AS BIGINT)")
              .as("bit_flip_rate_x1e6"),
            expr("CAST(__chg * 1000000 DIV n_vectors AS BIGINT)")
              .as("frac_changed_x1e6"))
      },
      Some(bqDriftSql))
  )

  // ── Portable-arithmetic oracle SQL (q217/q218/q219). The k-means
  // chains are UNROLLED (iters=2): assignment = argmin integer L2² with
  // (dist, cid) tie-break, update = per-dimension truncating integer
  // mean (`//` and JVM long division both truncate toward zero), empty
  // cells keep their centroid via the LEFT JOIN COALESCE. ──

  /** Unrolled greedy k-center (q221): c1 = lowest id; round i picks the
    * max-dmin point from g_{i-1} (ties → lowest id), g_i folds the new
    * center into the running min-distance². Result rows stitch d2_sel
    * (the pick's dmin when chosen) and coverage_after (next pick's dmin;
    * for the last round, max over g_k).
    */
  private def kcenterSql(k: Int): String = {
    val sb = new StringBuilder(s"WITH ${qvSql("")}, ")
    sb ++= "c1 AS (SELECT vec_id, q FROM v ORDER BY vec_id LIMIT 1), "
    sb ++= s"g1 AS (SELECT v.vec_id, v.q, ${d2Sql("v.q", "c.q")} AS dmin " +
      "FROM v CROSS JOIN c1 c)"
    for (i <- 2 to k) {
      sb ++= s", c$i AS (SELECT vec_id, q, dmin FROM g${i - 1} " +
        "ORDER BY dmin DESC, vec_id LIMIT 1)"
      sb ++= s", g$i AS (SELECT g.vec_id, g.q, " +
        s"LEAST(g.dmin, ${d2Sql("g.q", "c.q")}) AS dmin " +
        s"FROM g${i - 1} g CROSS JOIN c$i c)"
    }
    val rows = (1 to k).map { i =>
      val d2sel =
        if (i == 1) "CAST(0 AS BIGINT)"
        else s"(SELECT CAST(dmin AS BIGINT) FROM c$i)"
      val cov =
        if (i < k) s"(SELECT CAST(dmin AS BIGINT) FROM c${i + 1})"
        else s"(SELECT CAST(max(dmin) AS BIGINT) FROM g$k)"
      s"SELECT CAST($i AS BIGINT) AS sel_rank, " +
        s"(SELECT vec_id FROM c$i) AS vec_id, $d2sel AS d2_sel, " +
        s"$cov AS coverage_after"
    }
    sb ++= " " + rows.mkString(" UNION ALL ") + " ORDER BY sel_rank"
    sb.toString
  }

  /** Unrolled greedy max-coverage (q222): distinct doc 3-gram table `g`
    * (q24's tokenizer), then k rounds of argmax-by-uncovered-count (r$i,
    * ties → lowest doc_id) folding each pick's shingles into the covered
    * set c$i. Row i stitches the pick, its marginal gain, and the
    * coverage total after it.
    */
  private def coverageSql(k: Int): String = {
    val sb = new StringBuilder(
      "WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents), " +
        "g AS (SELECT doc_id, unnest(list_distinct(" +
        "[toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] " +
        "for i in range(1, greatest(len(toks) - 1, 1))])) AS s FROM t), " +
        "r1 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS gain FROM g " +
        "GROUP BY 1 ORDER BY gain DESC, doc_id LIMIT 1), " +
        "c1 AS (SELECT DISTINCT g.s FROM g JOIN r1 USING (doc_id))")
    for (i <- 2 to k) {
      sb ++= s", r$i AS (SELECT g.doc_id, CAST(count(*) AS BIGINT) AS gain " +
        s"FROM g LEFT JOIN c${i - 1} c ON g.s = c.s WHERE c.s IS NULL " +
        "GROUP BY 1 ORDER BY gain DESC, doc_id LIMIT 1)"
      sb ++= s", c$i AS (SELECT s FROM c${i - 1} UNION " +
        s"SELECT g.s FROM g JOIN r$i USING (doc_id))"
    }
    val rows = (1 to k).map { i =>
      s"SELECT CAST($i AS BIGINT) AS sel_rank, " +
        s"(SELECT doc_id FROM r$i) AS doc_id, " +
        s"(SELECT gain FROM r$i) AS gain, " +
        s"(SELECT CAST(count(*) AS BIGINT) FROM c$i) AS covered_total"
    }
    sb ++= " " + rows.mkString(" UNION ALL ") + " ORDER BY sel_rank"
    sb.toString
  }

  /** q223: the ±1 JL sign matrix from `md5_number_lower` (the q25-pinned
    * hash convention), per-pair integer distances in both spaces, and
    * the exact fixed-point distortion ratio.
    */
  private lazy val jlSql: String =
    s"WITH ${qvSql(" WHERE vec_id < 20")}, " +
      "sm AS (SELECT a.j, b.i, CASE WHEN md5_number_lower('rp:' || a.j || ':' || b.i) % 2 = 1 " +
      "THEN 1 ELSE -1 END AS sgn FROM range(16) a(j) CROSS JOIN range(64) b(i)), " +
      "px AS (SELECT vec_id, generate_subscripts(q, 1) - 1 AS i, unnest(q) AS x FROM v), " +
      "p AS (SELECT vec_id, j, CAST(sum(sgn * x) AS BIGINT) AS y " +
      "FROM px JOIN sm USING (i) GROUP BY 1, 2), " +
      "pv AS (SELECT vec_id, list(y ORDER BY j) AS py FROM p GROUP BY 1) " +
      "SELECT id_a, id_b, d2_orig, d2_proj, " +
      "CASE WHEN d2_orig = 0 THEN 1000000 " +
      "ELSE CAST(d2_proj * 1000000 // (16 * d2_orig) AS BIGINT) END AS distortion_x1e6 " +
      s"FROM (SELECT a.vec_id AS id_a, b.vec_id AS id_b, " +
      s"CAST(${d2Sql("a.q", "b.q")} AS BIGINT) AS d2_orig, " +
      s"CAST(${d2Sql("pa.py", "pb.py")} AS BIGINT) AS d2_proj " +
      "FROM v a JOIN v b ON a.vec_id < b.vec_id " +
      "JOIN pv pa ON pa.vec_id = a.vec_id JOIN pv pb ON pb.vec_id = b.vec_id) " +
      "ORDER BY id_a, id_b"

  /** q142/q226/q230/q232 shared oracle: exact fingerprint + exact 3-gram
    * Jaccard of the increment against the corpus (`old` = the live
    * indexed set). The indexed path (q226) is lossless by construction,
    * the delete path (q230) anti-joins tombstones on both index sides,
    * and the streamed path (q232) unions per-segment reads exactly, so
    * ONE SQL restatement hash-checks all four.
    */
  private def dedupAgainstSqlOver(oldRel: String): String =
    s"""WITH newd AS (SELECT * FROM documents WHERE doc_id % 10 = 0),
      |old AS ($oldRel),
      |fpo AS (SELECT DISTINCT md5(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS fp FROM old),
      |ex AS (SELECT doc_id, 1 AS e FROM newd
      |       WHERE md5(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) IN (SELECT fp FROM fpo)),
      |tn AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts FROM newd),
      |toq AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts FROM old),
      |gn AS (SELECT DISTINCT doc_id, array_to_string(ts[i:i+2], ' ') AS sh
      |       FROM (SELECT doc_id, ts, unnest(range(1, len(ts) - 1)) AS i FROM tn)),
      |go AS (SELECT DISTINCT doc_id, array_to_string(ts[i:i+2], ' ') AS sh
      |       FROM (SELECT doc_id, ts, unnest(range(1, len(ts) - 1)) AS i FROM toq)),
      |szn AS (SELECT doc_id, count(*) AS sz FROM gn GROUP BY 1),
      |szo AS (SELECT doc_id, count(*) AS sz FROM go GROUP BY 1),
      |inter AS (SELECT gn.doc_id AS id_a, go.doc_id AS id_b, count(*) AS i
      |          FROM gn JOIN go ON gn.sh = go.sh GROUP BY 1, 2),
      |mj AS (SELECT id_a AS doc_id,
      |    max(i / CAST(szn.sz + szo.sz - i AS DOUBLE)) AS mj
      |  FROM inter
      |    JOIN szn ON szn.doc_id = inter.id_a
      |    JOIN szo ON szo.doc_id = inter.id_b
      |  GROUP BY 1)
      |SELECT n.doc_id,
      |  CAST(COALESCE(ex.e, 0) AS BIGINT) AS exact_dup,
      |  CAST(CASE WHEN COALESCE(mj.mj, 0) >= 0.5 THEN 1 ELSE 0 END AS BIGINT) AS near_dup,
      |  round(COALESCE(mj.mj, 0), 6) AS max_jaccard
      |FROM newd n LEFT JOIN ex USING (doc_id) LEFT JOIN mj USING (doc_id)
      |ORDER BY n.doc_id""".stripMargin

  private lazy val dedupAgainstSql: String =
    dedupAgainstSqlOver("SELECT * FROM documents WHERE doc_id % 10 <> 0")

  /** q224: quantized corpus with labels, per-anchor wrong-label top-5 by
    * ascending integer L2² (hard negatives) plus the same-label argmax
    * (hardest positive), ties → lowest id — the Spark side verbatim.
    */
  private lazy val hardNegSql: String =
    "WITH v AS (SELECT vec_id, label, [CAST(floor(x*1024.0 + 0.5) AS BIGINT) " +
      "for x in CAST(embedding AS DOUBLE[])] AS q FROM embeddings), " +
      "s AS (SELECT a.vec_id AS query_id, a.label AS anchor_label, " +
      s"b.vec_id, b.label, CAST(${d2Sql("a.q", "b.q")} AS BIGINT) AS d2 " +
      "FROM v a JOIN v b ON b.vec_id <> a.vec_id WHERE a.vec_id < 8), " +
      "n AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY d2, vec_id) AS rank " +
      "FROM s WHERE label <> anchor_label), " +
      "p AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY d2 DESC, vec_id) AS rank " +
      "FROM s WHERE label = anchor_label) " +
      "SELECT query_id, anchor_label, vec_id, label, d2, rank, 'neg' AS kind FROM n WHERE rank <= 5 " +
      "UNION ALL SELECT query_id, anchor_label, vec_id, label, d2, rank, 'pos' AS kind FROM p WHERE rank = 1 " +
      "ORDER BY query_id, kind, rank"

  /** q225: unrolled portable k-means (c2), full assignment (a3), anchor
    * probe lists (3 nearest cells), then wrong-label top-5 from probed
    * cells vs the exhaustive wrong-label top-5 — per-anchor hits ×2e5.
    */
  private lazy val hardNegRecallSql: String =
    s"WITH ${qvSql("")}, ${kmeansSql(8)}, ${assignSql(3, "c2")}, " +
      "lbl AS (SELECT vec_id, label FROM embeddings), " +
      "p AS (SELECT v.vec_id AS query_id, v.q AS qq, l.label AS al " +
      "FROM v JOIN lbl l ON l.vec_id = v.vec_id WHERE v.vec_id < 8), " +
      "pc AS (SELECT query_id, cid FROM (SELECT p.query_id, c.cid, " +
      s"row_number() OVER (PARTITION BY p.query_id ORDER BY ${d2Sql("p.qq", "c.c")}, c.cid) AS rn " +
      "FROM p CROSS JOIN c2 c) WHERE rn <= 3), " +
      "apx AS (SELECT query_id, vec_id FROM (SELECT pc.query_id, a3.vec_id, " +
      s"row_number() OVER (PARTITION BY pc.query_id ORDER BY ${d2Sql("a3.q", "p.qq")}, a3.vec_id) AS rn " +
      "FROM pc JOIN a3 ON pc.cid = a3.cid JOIN p ON p.query_id = pc.query_id " +
      "JOIN lbl b ON b.vec_id = a3.vec_id " +
      "WHERE a3.vec_id <> pc.query_id AND b.label <> p.al) WHERE rn <= 5), " +
      "ext AS (SELECT query_id, vec_id FROM (SELECT p.query_id, v.vec_id, " +
      s"row_number() OVER (PARTITION BY p.query_id ORDER BY ${d2Sql("v.q", "p.qq")}, v.vec_id) AS rn " +
      "FROM p CROSS JOIN v JOIN lbl b ON b.vec_id = v.vec_id " +
      "WHERE v.vec_id <> p.query_id AND b.label <> p.al) WHERE rn <= 5) " +
      "SELECT e.query_id, CAST(count(a.vec_id) AS BIGINT) AS n_hits, " +
      "CAST(count(a.vec_id) * 200000 AS BIGINT) AS recall_x1e6 " +
      "FROM ext e LEFT JOIN apx a ON e.query_id = a.query_id AND e.vec_id = a.vec_id " +
      "GROUP BY 1 ORDER BY 1"

  /** Shared BQ CTE chain (q237/q238): quantized vectors, per-dim (n, Σx)
    * — the division-free mean threshold — packed sign codes (bit 63 via
    * the −2^63 LITERAL: DuckDB's `1 << 63` range-errors, and addition of
    * disjoint-bit values equals bitwise OR so the signed long is the bit
    * pattern), the vec-0 query, the Hamming shortlist (bit_count(xor),
    * ties → lowest id), and the exact integer-L2² rerank.
    */
  private def bqCommonSql(shortlist: Int, topK: Int): String =
    s"WITH ${qvSql("")}, " +
      "px AS (SELECT vec_id, generate_subscripts(q, 1) - 1 AS i, unnest(q) AS x FROM v), " +
      "st AS (SELECT i, CAST(sum(x) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n FROM px GROUP BY 1), " +
      "codes AS (SELECT vec_id, CAST(sum(CASE WHEN st.n * px.x > st.s THEN " +
      "(CASE WHEN px.i = 63 THEN -9223372036854775808 ELSE (1::BIGINT << CAST(px.i AS INTEGER)) END) " +
      "ELSE 0 END) AS BIGINT) AS code FROM px JOIN st USING (i) GROUP BY 1), " +
      "qc AS (SELECT code AS qcode FROM codes WHERE vec_id = 0), " +
      "qq AS (SELECT q AS qq FROM v WHERE vec_id = 0), " +
      "sl AS (SELECT vec_id FROM (SELECT c.vec_id, " +
      "row_number() OVER (ORDER BY bit_count(xor(c.code, qc.qcode)), c.vec_id) AS rn " +
      s"FROM codes c CROSS JOIN qc WHERE c.vec_id <> 0) WHERE rn <= $shortlist), " +
      "rr AS (SELECT vec_id, d2 FROM (SELECT v.vec_id, " +
      s"CAST(${d2Sql("v.q", "qq.qq")} AS BIGINT) AS d2, " +
      s"row_number() OVER (ORDER BY ${d2Sql("v.q", "qq.qq")}, v.vec_id) AS rn " +
      s"FROM v JOIN sl USING (vec_id) CROSS JOIN qq) WHERE rn <= $topK)"

  /** q237: the BQ rerank output itself — ids and exact distances. */
  private lazy val bqRerankSql: String =
    bqCommonSql(50, 10) + " SELECT vec_id, d2 FROM rr ORDER BY d2, vec_id"

  /** q239: JL ±1 projection (64→16, the q223 matrix) → 16-bit BQ codes →
    * Hamming shortlist → exact rerank in the ORIGINAL space, recall@10
    * vs the exhaustive original-space top-10. Thresholds use per-dim
    * (n, Σy) over the PROJECTED values — the same division-free mean
    * test as bqCommonSql, one CTE chain down.
    */
  private lazy val rpBqRecallSql: String =
    s"WITH ${qvSql("")}, " +
      "sm AS (SELECT a.j, b.i, CASE WHEN md5_number_lower('rp:' || a.j || ':' || b.i) % 2 = 1 " +
      "THEN 1 ELSE -1 END AS sgn FROM range(16) a(j) CROSS JOIN range(64) b(i)), " +
      "px AS (SELECT vec_id, generate_subscripts(q, 1) - 1 AS i, unnest(q) AS x FROM v), " +
      "p AS (SELECT vec_id, j, CAST(sum(sgn * x) AS BIGINT) AS y " +
      "FROM px JOIN sm USING (i) GROUP BY 1, 2), " +
      "st AS (SELECT j, CAST(sum(y) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY 1), " +
      "codes AS (SELECT vec_id, CAST(sum(CASE WHEN st.n * p.y > st.s " +
      "THEN (1::BIGINT << CAST(p.j AS INTEGER)) ELSE 0 END) AS BIGINT) AS code " +
      "FROM p JOIN st USING (j) GROUP BY 1), " +
      "qc AS (SELECT code AS qcode FROM codes WHERE vec_id = 0), " +
      "qq AS (SELECT q AS qq FROM v WHERE vec_id = 0), " +
      "sl AS (SELECT vec_id FROM (SELECT c.vec_id, " +
      "row_number() OVER (ORDER BY bit_count(xor(c.code, qc.qcode)), c.vec_id) AS rn " +
      "FROM codes c CROSS JOIN qc WHERE c.vec_id <> 0) WHERE rn <= 50), " +
      s"rr AS (SELECT vec_id FROM (SELECT v.vec_id, ${d2Sql("v.q", "qq.qq")} AS d " +
      "FROM v JOIN sl USING (vec_id) CROSS JOIN qq) ORDER BY d, vec_id LIMIT 10), " +
      s"ext AS (SELECT vec_id FROM (SELECT v.vec_id, ${d2Sql("v.q", "qq.qq")} AS d " +
      "FROM v CROSS JOIN qq WHERE v.vec_id <> 0) ORDER BY d, vec_id LIMIT 10) " +
      "SELECT CAST(count(rr.vec_id) AS BIGINT) AS n_hits, " +
      "CAST(count(rr.vec_id) * 100000 AS BIGINT) AS recall_x1e6 " +
      "FROM ext LEFT JOIN rr ON ext.vec_id = rr.vec_id"

  /** q240: exact per-query integer-L2² top-5 for the vec_id < 5 query
    * set — what the batch BQ search degrades to at shortlist = corpus.
    */
  private lazy val bqBatchSql: String =
    s"WITH ${qvSql("")} " +
      "SELECT query_id, vec_id, d2, rank FROM (" +
      "SELECT q.qid AS query_id, e.vec_id, " +
      s"CAST(${d2Sql("e.q", "q.qv")} AS BIGINT) AS d2, " +
      s"row_number() OVER (PARTITION BY q.qid ORDER BY ${d2Sql("e.q", "q.qv")}, e.vec_id) AS rank " +
      "FROM v e, (SELECT vec_id AS qid, q AS qv FROM v WHERE vec_id < 5) q " +
      "WHERE e.vec_id <> q.qid) WHERE rank <= 5 ORDER BY query_id, rank"

  /** One BQ code CTE over the shared `px` per-dim table against a stats
    * CTE `st` (bit-63 via the −2^63 literal, as in [[bqCommonSql]]).
    */
  private def bqCodesSqlOver(name: String, st: String,
                             pxWhere: String = ""): String =
    s"$name AS (SELECT vec_id, CAST(sum(CASE WHEN $st.n * px.x > $st.s THEN " +
      "(CASE WHEN px.i = 63 THEN -9223372036854775808 ELSE (1::BIGINT << CAST(px.i AS INTEGER)) END) " +
      s"ELSE 0 END) AS BIGINT) AS code FROM px JOIN $st USING (i)$pxWhere GROUP BY 1)"

  /** q241: codes under the pre-append (80%) model vs a fresh full-corpus
    * model — the exact bit-flip drift spectrum.
    */
  private lazy val bqDriftSql: String =
    s"WITH ${qvSql("")}, " +
      "px AS (SELECT vec_id, generate_subscripts(q, 1) - 1 AS i, unnest(q) AS x FROM v), " +
      "cutn AS (SELECT CAST(count(*) * 4 // 5 AS BIGINT) AS c FROM v), " +
      "stf AS (SELECT i, CAST(sum(x) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n FROM px GROUP BY 1), " +
      "stb AS (SELECT i, CAST(sum(x) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n FROM px " +
      "WHERE vec_id < (SELECT c FROM cutn) GROUP BY 1), " +
      bqCodesSqlOver("cf", "stf") + ", " +
      bqCodesSqlOver("cb", "stb") + ", " +
      "fl AS (SELECT cf.vec_id, CAST(bit_count(xor(cf.code, cb.code)) AS BIGINT) AS flips " +
      "FROM cf JOIN cb ON cf.vec_id = cb.vec_id) " +
      "SELECT CAST(count(*) AS BIGINT) AS n_vectors, " +
      "CAST(sum(flips) AS BIGINT) AS sum_flipped_bits, " +
      "CAST(sum(flips) * 1000000 // (count(*) * 64) AS BIGINT) AS bit_flip_rate_x1e6, " +
      "CAST(count(*) FILTER (WHERE flips > 0) * 1000000 // count(*) AS BIGINT) AS frac_changed_x1e6 " +
      "FROM fl"

  /** q238: BQ recall@10 vs the exhaustive integer-L2² top-10. */
  private lazy val bqRecallSql: String =
    bqCommonSql(50, 10) +
      ", ext AS (SELECT vec_id FROM (SELECT v.vec_id, " +
      s"row_number() OVER (ORDER BY ${d2Sql("v.q", "qq.qq")}, v.vec_id) AS rn " +
      "FROM v CROSS JOIN qq WHERE v.vec_id <> 0) WHERE rn <= 10) " +
      "SELECT CAST(count(rr.vec_id) AS BIGINT) AS n_hits, " +
      "CAST(count(rr.vec_id) * 100000 AS BIGINT) AS recall_x1e6 " +
      "FROM ext LEFT JOIN rr ON ext.vec_id = rr.vec_id"

  /** Quantized-vector CTE: floor(x·1024 + 0.5) per element as BIGINT. */
  private def qvSql(where: String): String =
    "v AS (SELECT vec_id, [CAST(floor(x*1024.0 + 0.5) AS BIGINT) " +
      s"for x in CAST(embedding AS DOUBLE[])] AS q FROM embeddings$where)"

  /** Integer squared-L2 over two spliced list expressions. */
  private def d2Sql(a: String, b: String): String =
    s"list_sum([($a[i]-$b[i])*($a[i]-$b[i]) for i in range(1, len($a)+1)])"

  /** Integer dot product over two spliced list expressions. */
  private def dotSqlL(a: String, b: String): String =
    s"list_sum([$a[i]*$b[i] for i in range(1, len($a)+1)])"

  /** One assignment CTE a$i: argmin cell over centroid CTE `cents`. */
  private def assignSql(i: Int, cents: String): String =
    s"a$i AS (SELECT vec_id, q, cid FROM (SELECT v.vec_id, v.q, c.cid, " +
      s"row_number() OVER (PARTITION BY v.vec_id ORDER BY ${d2Sql("v.q", "c.c")}, c.cid) AS rn " +
      s"FROM v CROSS JOIN $cents c) WHERE rn = 1)"

  /** One update pair m$i/c$i: truncating integer means over a$i, empty
    * cells keep `prev`'s centroid.
    */
  private def updateSql(i: Int, prev: String): String =
    s"m$i AS (SELECT cid, pos, CAST(sum(x) AS BIGINT) // CAST(count(*) AS BIGINT) AS mi " +
      s"FROM (SELECT cid, generate_subscripts(q, 1) AS pos, unnest(q) AS x FROM a$i) GROUP BY 1, 2), " +
      s"c$i AS (SELECT $prev.cid, COALESCE(m.c, $prev.c) AS c FROM $prev " +
      s"LEFT JOIN (SELECT cid, list(mi ORDER BY pos) AS c FROM m$i GROUP BY 1) m ON $prev.cid = m.cid)"

  /** Unrolled 2-iteration Lloyd's over CTE `v`, final centroids in c2. */
  private def kmeansSql(k: Int): String =
    s"c0 AS (SELECT vec_id AS cid, q AS c FROM v WHERE vec_id < $k), " +
      assignSql(1, "c0") + ", " + updateSql(1, "c0") + ", " +
      assignSql(2, "c1") + ", " + updateSql(2, "c1")

  private lazy val ivfRecallSql: String =
    s"WITH ${qvSql("")}, ${kmeansSql(8)}, ${assignSql(3, "c2")}, " +
      "p AS (SELECT vec_id AS query_id, q AS qq FROM v WHERE vec_id < 5), " +
      "pc AS (SELECT query_id, cid FROM (SELECT p.query_id, c.cid, " +
      s"row_number() OVER (PARTITION BY p.query_id ORDER BY ${d2Sql("p.qq", "c.c")}, c.cid) AS rn " +
      "FROM p CROSS JOIN c2 c) WHERE rn <= 3), " +
      "apx AS (SELECT query_id, vec_id FROM (SELECT pc.query_id, a3.vec_id, " +
      s"row_number() OVER (PARTITION BY pc.query_id ORDER BY ${d2Sql("a3.q", "p.qq")}, a3.vec_id) AS rn " +
      "FROM pc JOIN a3 ON pc.cid = a3.cid JOIN p ON p.query_id = pc.query_id " +
      "WHERE a3.vec_id <> pc.query_id) WHERE rn <= 5), " +
      "ext AS (SELECT query_id, vec_id FROM (SELECT p.query_id, v.vec_id, " +
      s"row_number() OVER (PARTITION BY p.query_id ORDER BY ${d2Sql("v.q", "p.qq")}, v.vec_id) AS rn " +
      "FROM p CROSS JOIN v WHERE v.vec_id <> p.query_id) WHERE rn <= 5) " +
      "SELECT e.query_id, CAST(count(a.vec_id) AS BIGINT) AS n_hits, " +
      "CAST(count(a.vec_id) * 200000 AS BIGINT) AS recall_x1e6 " +
      "FROM ext e LEFT JOIN apx a ON e.query_id = a.query_id AND e.vec_id = a.vec_id " +
      "GROUP BY 1 ORDER BY 1"

  /** Tag-parameterized twins of [[assignSql]]/[[updateSql]]/[[kmeansSql]]
    * — q236 trains TWO models (pre-append corpus vs full) in one
    * statement, so the CTE names need a prefix and the corpus relation
    * is a parameter. Init = k lowest ids of the RELATION (ORDER BY +
    * LIMIT, not `vec_id < k` — the base relation may be a filtered
    * subset), matching `PortableAnn.train`'s orderBy-limit init.
    */
  private def assignSqlT(tag: String, i: Int, vrel: String,
                         cents: String): String =
    s"${tag}a$i AS (SELECT vec_id, q, cid FROM (SELECT t.vec_id, t.q, c.cid, " +
      s"row_number() OVER (PARTITION BY t.vec_id ORDER BY ${d2Sql("t.q", "c.c")}, c.cid) AS rn " +
      s"FROM $vrel t CROSS JOIN $cents c) WHERE rn = 1)"

  private def updateSqlT(tag: String, i: Int, prev: String): String =
    s"${tag}m$i AS (SELECT cid, pos, CAST(sum(x) AS BIGINT) // CAST(count(*) AS BIGINT) AS mi " +
      s"FROM (SELECT cid, generate_subscripts(q, 1) AS pos, unnest(q) AS x FROM ${tag}a$i) GROUP BY 1, 2), " +
      s"${tag}c$i AS (SELECT $prev.cid, COALESCE(m.c, $prev.c) AS c FROM $prev " +
      s"LEFT JOIN (SELECT cid, list(mi ORDER BY pos) AS c FROM ${tag}m$i GROUP BY 1) m ON $prev.cid = m.cid)"

  private def kmeansSqlT(tag: String, vrel: String, k: Int): String =
    s"${tag}c0 AS (SELECT vec_id AS cid, q AS c FROM $vrel ORDER BY vec_id LIMIT $k), " +
      assignSqlT(tag, 1, vrel, s"${tag}c0") + ", " +
      updateSqlT(tag, 1, s"${tag}c0") + ", " +
      assignSqlT(tag, 2, vrel, s"${tag}c1") + ", " +
      updateSqlT(tag, 2, s"${tag}c1")

  /** q236: two unrolled k-means chains (pre-append 80% corpus `vb` →
    * bc2; full corpus → ac2), the FULL corpus assigned to each, then
    * per-phase fixed-point drift stats — the Spark side verbatim.
    */
  private lazy val ivfDriftSql: String = {
    def phase(tag: String, label: String): String = {
      val g = s"${tag}g"
      s"SELECT '$label' AS phase, " +
        s"(SELECT CAST(count(*) AS BIGINT) FROM $g) AS n_vectors, " +
        s"(SELECT CAST(sum(d2) // count(*) AS BIGINT) FROM $g) AS mean_d2, " +
        s"(SELECT CAST(min(d2) AS BIGINT) FROM " +
        s"(SELECT d2, sum(cnt) OVER (ORDER BY d2) AS cum FROM " +
        s"(SELECT d2, count(*) AS cnt FROM $g GROUP BY 1)) " +
        s"WHERE cum * 10 >= (SELECT count(*) * 9 FROM $g)) AS p90_d2, " +
        s"(SELECT CAST(max(cn) AS BIGINT) FROM " +
        s"(SELECT count(*) AS cn FROM $g GROUP BY cid)) AS max_cell_n, " +
        s"(SELECT CAST((SELECT max(cn) FROM (SELECT count(*) AS cn FROM $g GROUP BY cid)) " +
        s"* 8 * 1000000 // count(*) AS BIGINT) FROM $g) AS skew_x1e6"
    }
    def assigned(tag: String, cents: String): String =
      s"${tag}g AS (SELECT vec_id, cid, d2 FROM (SELECT v.vec_id, c.cid, " +
        s"${d2Sql("v.q", "c.c")} AS d2, " +
        s"row_number() OVER (PARTITION BY v.vec_id ORDER BY ${d2Sql("v.q", "c.c")}, c.cid) AS rn " +
        s"FROM v CROSS JOIN $cents c) WHERE rn = 1)"
    s"WITH ${qvSql("")}, " +
      "vb AS (SELECT vec_id, q FROM v WHERE vec_id < " +
      "(SELECT CAST(count(*) * 4 // 5 AS BIGINT) FROM v)), " +
      kmeansSqlT("b", "vb", 8) + ", " +
      kmeansSqlT("f", "v", 8) + ", " +
      assigned("b", "bc2") + ", " + assigned("f", "fc2") + " " +
      phase("b", "before_retrain") + " UNION ALL " +
      phase("f", "after_retrain") + " ORDER BY phase"
  }

  /** Per-subspace assignment CTE pa$i over `sub`, codebook CTE `books`. */
  private def pqAssignSql(i: Int, books: String): String =
    s"pa$i AS (SELECT vec_id, s, sq, cid FROM (SELECT t.vec_id, t.s, t.sq, b.cid, " +
      s"row_number() OVER (PARTITION BY t.vec_id, t.s ORDER BY ${d2Sql("t.sq", "b.c")}, b.cid) AS rn " +
      s"FROM sub t JOIN $books b ON t.s = b.s) WHERE rn = 1)"

  private def pqUpdateSql(i: Int, prev: String): String =
    s"pm$i AS (SELECT s, cid, pos, CAST(sum(x) AS BIGINT) // CAST(count(*) AS BIGINT) AS mi " +
      s"FROM (SELECT s, cid, generate_subscripts(sq, 1) AS pos, unnest(sq) AS x FROM pa$i) GROUP BY 1, 2, 3), " +
      s"b$i AS (SELECT $prev.s, $prev.cid, COALESCE(m.c, $prev.c) AS c FROM $prev " +
      s"LEFT JOIN (SELECT s, cid, list(mi ORDER BY pos) AS c FROM pm$i GROUP BY 1, 2) m " +
      s"ON $prev.s = m.s AND $prev.cid = m.cid)"

  /** Shared PQ CTE chain (q88/q218): quantized subvectors, 2-iteration
    * jointly-unrolled codebook training, corpus encoding, the vec-0
    * query's ADC lookup table as a relational join, and the ADC
    * shortlist (ties → lowest id).
    */
  private lazy val pqCommonSql: String =
    s"WITH ${qvSql("")}, " +
      "sub AS (SELECT vec_id, CAST(r.s AS INT) AS s, " +
      "q[CAST(r.s*8+1 AS INT):CAST(r.s*8+8 AS INT)] AS sq FROM v CROSS JOIN range(8) r(s)), " +
      "b0 AS (SELECT s, vec_id AS cid, sq AS c FROM sub WHERE vec_id < 16), " +
      pqAssignSql(1, "b0") + ", " + pqUpdateSql(1, "b0") + ", " +
      pqAssignSql(2, "b1") + ", " + pqUpdateSql(2, "b1") + ", " +
      "enc AS (SELECT vec_id, s, cid FROM (SELECT t.vec_id, t.s, b.cid, " +
      s"row_number() OVER (PARTITION BY t.vec_id, t.s ORDER BY ${d2Sql("t.sq", "b.c")}, b.cid) AS rn " +
      "FROM sub t JOIN b2 b ON t.s = b.s) WHERE rn = 1), " +
      s"qs AS (SELECT s, sq FROM sub WHERE vec_id = 0), " +
      s"lut AS (SELECT b.s, b.cid, ${d2Sql("q.sq", "b.c")} AS ld FROM b2 b JOIN qs q ON b.s = q.s), " +
      "adc AS (SELECT e.vec_id, CAST(sum(l.ld) AS BIGINT) AS adc FROM enc e " +
      "JOIN lut l ON e.s = l.s AND e.cid = l.cid WHERE e.vec_id <> 0 GROUP BY 1), " +
      "short AS (SELECT vec_id FROM adc ORDER BY adc, vec_id LIMIT 50), " +
      "qq AS (SELECT q FROM v WHERE vec_id = 0)"

  /** q88: the ADC-shortlisted, exactly-reranked PQ output itself — ids
    * and exact integer L2² distances.
    */
  private lazy val pqAnnSql: String =
    pqCommonSql +
      s" SELECT vec_id, CAST(d AS BIGINT) AS d2 FROM (SELECT v.vec_id, ${d2Sql("v.q", "qq.q")} AS d " +
      "FROM v JOIN short USING (vec_id) CROSS JOIN qq) ORDER BY d, vec_id LIMIT 10"

  private lazy val pqRecallSql: String =
    pqCommonSql + ", " +
      s"apx AS (SELECT vec_id FROM (SELECT v.vec_id, ${d2Sql("v.q", "qq.q")} AS d " +
      "FROM v JOIN short USING (vec_id) CROSS JOIN qq) ORDER BY d, vec_id LIMIT 10), " +
      s"ext AS (SELECT vec_id FROM (SELECT v.vec_id, ${d2Sql("v.q", "qq.q")} AS d " +
      "FROM v CROSS JOIN qq WHERE v.vec_id <> 0) ORDER BY d, vec_id LIMIT 10) " +
      "SELECT CAST(count(a.vec_id) AS BIGINT) AS n_hits, " +
      "CAST(count(a.vec_id) * 100000 AS BIGINT) AS recall_x1e6 " +
      "FROM ext e LEFT JOIN apx a ON e.vec_id = a.vec_id"

  /** q46: the probe-limited IVF output itself — unrolled integer
    * k-means, per-query 3-of-8 probe lists, (d², id)-ranked top-5 with
    * exact integer distances.
    */
  private lazy val ivfAnnSql: String =
    s"WITH ${qvSql("")}, ${kmeansSql(8)}, ${assignSql(3, "c2")}, " +
      "p AS (SELECT vec_id AS query_id, q AS qq FROM v WHERE vec_id < 5), " +
      "pc AS (SELECT query_id, cid FROM (SELECT p.query_id, c.cid, " +
      s"row_number() OVER (PARTITION BY p.query_id ORDER BY ${d2Sql("p.qq", "c.c")}, c.cid) AS rn " +
      "FROM p CROSS JOIN c2 c) WHERE rn <= 3) " +
      "SELECT query_id, vec_id, d2, rank FROM (SELECT pc.query_id, a3.vec_id, " +
      s"CAST(${d2Sql("a3.q", "p.qq")} AS BIGINT) AS d2, " +
      s"row_number() OVER (PARTITION BY pc.query_id ORDER BY ${d2Sql("a3.q", "p.qq")}, a3.vec_id) AS rank " +
      "FROM pc JOIN a3 ON pc.cid = a3.cid JOIN p ON p.query_id = pc.query_id " +
      "WHERE a3.vec_id <> pc.query_id) WHERE rank <= 5 ORDER BY query_id, rank"

  /** q138: the clustered SemDeDup decisions themselves — same-cell
    * lower-id close-neighbor counts and the per-vector keep bit, over the
    * unrolled integer k-means cells.
    */
  private lazy val semdedupClusteredSql: String =
    s"WITH ${qvSql("")}, ${kmeansSql(8)}, ${assignSql(3, "c2")}, " +
      s"nrm AS (SELECT vec_id, cid, q, ${dotSqlL("q", "q")} AS n2 FROM a3), " +
      s"cd AS (SELECT a.vec_id AS ia, b.vec_id AS ib, ${dotSqlL("a.q", "b.q")} AS dp, " +
      "a.n2 AS na2, b.n2 AS nb2 FROM nrm a JOIN nrm b ON a.cid = b.cid AND a.vec_id < b.vec_id), " +
      "dr AS (SELECT ib AS vid, CAST(count(*) AS BIGINT) AS n_close_lower " +
      "FROM cd WHERE dp > 0 AND 25*dp*dp >= 4*na2*nb2 GROUP BY 1) " +
      "SELECT v.vec_id, CAST(COALESCE(dr.n_close_lower, 0) AS BIGINT) AS n_close_lower, " +
      "CAST(CASE WHEN dr.vid IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept " +
      "FROM v LEFT JOIN dr ON v.vec_id = dr.vid ORDER BY v.vec_id"

  private lazy val sqRecallSql: String =
    s"WITH ${qvSql("")}, " +
      "st AS (SELECT pos, min(x) AS mn, max(x) - min(x) AS dd " +
      "FROM (SELECT generate_subscripts(q, 1) AS pos, unnest(q) AS x FROM v) GROUP BY 1), " +
      "ex AS (SELECT vec_id, generate_subscripts(q, 1) AS pos, unnest(q) AS x FROM v WHERE vec_id <> 0), " +
      "qd AS (SELECT generate_subscripts(q, 1) AS pos, unnest(q) AS qx FROM v WHERE vec_id = 0), " +
      "terms AS (SELECT e.vec_id, (255*s.mn + (CASE WHEN s.dd = 0 THEN 0 " +
      "ELSE LEAST(255, GREATEST(0, (510*(e.x - s.mn) + s.dd) // (2*s.dd))) END)*s.dd - 255*q.qx) AS p " +
      "FROM ex e JOIN st s USING (pos) JOIN qd q USING (pos)), " +
      "adc AS (SELECT vec_id, CAST(sum(p*p) AS BIGINT) AS adc FROM terms GROUP BY 1), " +
      "short AS (SELECT vec_id FROM adc ORDER BY adc, vec_id LIMIT 50), " +
      "qq AS (SELECT q FROM v WHERE vec_id = 0), " +
      s"apx AS (SELECT vec_id FROM (SELECT v.vec_id, ${d2Sql("v.q", "qq.q")} AS d " +
      "FROM v JOIN short USING (vec_id) CROSS JOIN qq) ORDER BY d, vec_id LIMIT 10), " +
      s"ext AS (SELECT vec_id FROM (SELECT v.vec_id, ${d2Sql("v.q", "qq.q")} AS d " +
      "FROM v CROSS JOIN qq WHERE v.vec_id <> 0) ORDER BY d, vec_id LIMIT 10) " +
      "SELECT CAST(count(a.vec_id) AS BIGINT) AS n_hits, " +
      "CAST(count(a.vec_id) * 100000 AS BIGINT) AS recall_x1e6 " +
      "FROM ext e LEFT JOIN apx a ON e.vec_id = a.vec_id"

  private lazy val semdedupContainSql: String =
    s"WITH ${qvSql(" WHERE vec_id < 2000")}, ${kmeansSql(8)}, ${assignSql(3, "c2")}, " +
      s"nrm AS (SELECT vec_id, cid, q, ${dotSqlL("q", "q")} AS n2 FROM a3), " +
      s"cd AS (SELECT a.vec_id AS ia, b.vec_id AS ib, ${dotSqlL("a.q", "b.q")} AS dp, " +
      "a.n2 AS na2, b.n2 AS nb2 FROM nrm a JOIN nrm b ON a.cid = b.cid AND a.vec_id < b.vec_id), " +
      "cdrop AS (SELECT DISTINCT ib FROM cd WHERE dp > 0 AND 25*dp*dp >= 4*na2*nb2), " +
      s"ed AS (SELECT a.vec_id AS ia, b.vec_id AS ib, ${dotSqlL("a.q", "b.q")} AS dp, " +
      "a.n2 AS na2, b.n2 AS nb2 FROM nrm a JOIN nrm b ON a.vec_id < b.vec_id), " +
      "edrop AS (SELECT DISTINCT ib FROM ed WHERE dp > 0 AND 25*dp*dp >= 4*na2*nb2) " +
      "SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_vectors, " +
      "(SELECT CAST(count(*) AS BIGINT) FROM cdrop) AS n_drops_clustered, " +
      "(SELECT CAST(count(*) AS BIGINT) FROM edrop) AS n_drops_exhaustive, " +
      "(SELECT CAST(count(*) AS BIGINT) FROM cdrop WHERE ib NOT IN (SELECT ib FROM edrop)) AS n_violations, " +
      "CASE WHEN (SELECT count(*) FROM edrop) = 0 THEN CAST(1000000 AS BIGINT) " +
      "ELSE CAST((SELECT count(*) FROM cdrop) * 1000000 // (SELECT count(*) FROM edrop) AS BIGINT) END " +
      "AS containment_x1e6"
}
