package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-point (integer) twins of the approximate ANN paths, built so the
  * WHOLE pipeline — Lloyd's k-means training included — is exactly
  * restatable in DuckDB SQL. This is what turns the approximate paths'
  * recall into a driver-visible, hash-checked metric (the round-5 gate's
  * only `no_oracle` rows): float k-means can't be oracled because
  * aggregation order perturbs low bits and can flip an argmin, but after
  * quantizing every embedding to integers (`floor(x·1024 + 0.5)` — one
  * IEEE multiply+add, bit-identical in any engine) every distance,
  * centroid mean (truncating integer division, the same toward-zero rule
  * as DuckDB's `//`), argmin tie-break, and rank is exact integer math
  * whose result is independent of execution order.
  *
  * Same algorithm family and plan shapes as [[IvfIndex]] / [[PqIndex]] /
  * [[Similarity.semanticDedup]] (first-k init, argmin-struct assignment,
  * posexplode centroid update, broadcast probe join, rank window) — the
  * configs under audit (q46 / q88 / q138) are mirrored by the recall
  * queries q217/q218/q219.
  *
  * Overflow headroom: quantized values are ≤ scale·max|x|; the sharpest
  * product used is 25·dot² ≤ 25·(d·q²)² — safe in a signed 64-bit long up
  * to |x| ≈ 10 at scale 1024, d = 64 (the embeddings tables are
  * unit-normalized, |x| < 1).
  */
object PortableAnn {

  /** Per-element quantization: floor(x·1024 + 0.5) as long. */
  def quant(emb: Column): Column =
    transform(emb, x => floor(x.cast("double") * lit(1024.0) + lit(0.5)))

  /** Integer squared-L2 distance between two array<long> columns —
    * codegen'd ([[graft.functions.LongDist2Expr]]); the HOF form below is
    * the cross-check twin.
    */
  def dist2(a: Column, b: Column): Column =
    graft.functions.LongVectorExprs.dist2(a, b)

  /** Integer dot product between two array<long> columns (codegen'd). */
  def dotL(a: Column, b: Column): Column =
    graft.functions.LongVectorExprs.dot(a, b)

  /** HOF twins of [[dist2]]/[[dotL]] — slower (lambda frame per element),
    * kept for cross-validation in PortableAnnSpec.
    */
  private[graft] def dist2Hof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, x) => acc + x)
  private[graft] def dotLHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  final case class QModel(centroids: Array[Array[Long]]) {
    def k: Int = centroids.length
  }

  /** Argmin centroid index by integer L2², ties → lowest index (the
    * struct ordering (dist, cell) makes the tie-break explicit).
    */
  def bestCell(qv: Column, model: QModel): Column = {
    val scored = model.centroids.zipWithIndex.toIndexedSeq.map { case (c, i) =>
      struct(dist2(qv, typedLit(c.toSeq)).as("dist"), lit(i).as("cell"))
    }
    array_min(array(scored: _*)).getField("cell")
  }

  /** Integer L2² to the NEAREST centroid — the quantization error the
    * drift audit (q236) aggregates: rising distance-to-assigned-centroid
    * under appends is exactly the signal that the cell structure no
    * longer reflects the corpus and `retrainCompact` is due.
    */
  def bestDist2(qv: Column, model: QModel): Column =
    least(model.centroids.toIndexedSeq
      .map(c => dist2(qv, typedLit(c.toSeq))): _*)

  /** Integer Lloyd's: init = quantized vectors of the k lowest ids;
    * update = per-dimension truncating integer mean (empty cells keep
    * their centroid). Long sums are order-independent, so the result is
    * identical however Spark partitions the corpus — and identical to the
    * unrolled SQL restatement.
    */
  def train(df: DataFrame, idCol: String, qvCol: String,
            k: Int, iters: Int): QModel = {
    var cents = df.orderBy(col(idCol)).limit(k)
      .select(col(qvCol)).collect()
      .map(_.getSeq[Long](0).toArray)
    (0 until iters).foreach { _ =>
      val assigned = df.select(col(qvCol),
        bestCell(col(qvCol), QModel(cents)).as("cell"))
      val sums = assigned
        .select(col("cell"), posexplode(col(qvCol)).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
        .collect()
      cents = cents.zipWithIndex.map { case (old, c) =>
        val dims = sums.filter(_.getInt(0) == c)
        if (dims.isEmpty) old
        else {
          val arr = old.clone()
          dims.foreach(r => arr(r.getInt(1)) = r.getLong(2) / r.getLong(3))
          arr
        }
      }
    }
    QModel(cents)
  }

  /** The nprobe nearest cells per query (integer distances, ties →
    * lowest cell).
    */
  private def probeCells(qq: Column, model: QModel, nprobe: Int): Column = {
    val scored = model.centroids.zipWithIndex.toIndexedSeq.map { case (c, i) =>
      struct(dist2(qq, typedLit(c.toSeq)).as("dist"), lit(i).as("cell"))
    }
    slice(transform(array_sort(array(scored: _*)), s => s.getField("cell")),
      1, nprobe)
  }

  /** IVF search over quantized vectors: same plan shape as
    * [[IvfIndex.search]] (broadcast probe join + rank window), ranked by
    * integer L2² ascending, ties → lowest id.
    */
  def ivfSearch(queries: DataFrame, corpus: DataFrame, idCol: String,
                qvCol: String, model: QModel, nprobe: Int,
                topK: Int): DataFrame = {
    val assigned = corpus.withColumn("cell", bestCell(col(qvCol), model))
    val q = queries
      .select(col(idCol).as("query_id"), col(qvCol).as("__qq"))
      .withColumn("cell", explode(probeCells(col("__qq"), model, nprobe)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("d"), col(idCol))
    assigned.join(broadcast(q), Seq("cell"))
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol),
        dist2(col(qvCol), col("__qq")).as("d"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
  }

  /** Exhaustive integer-L2 top-k per query (the recall denominator):
    * broadcast the (bounded) query set over the corpus, rank window.
    */
  def exactTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                qvCol: String, topK: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(qvCol).as("__qq"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("d"), col(idCol))
    corpus.crossJoin(broadcast(q))
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol),
        dist2(col(qvCol), col("__qq")).as("d"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
  }

  /** Per-subspace integer codebooks (PQ), trained JOINTLY like
    * [[PqIndex.train]]: every iteration assigns all m subspaces in one
    * projection and updates every codebook from ONE
    * groupBy((subspace, cell, pos)) shuffle — iterations cost one job
    * each regardless of m (the per-subspace formulation paid m×iters
    * collect rounds: measured 4.2 vs 2.6 s warm on q218). Results are
    * IDENTICAL to per-subspace training — same first-k init, same
    * argmin, same truncating integer means — so the unrolled
    * per-subspace SQL oracle is unaffected.
    */
  def pqTrain(df: DataFrame, idCol: String, qvCol: String,
              m: Int, subDim: Int, k: Int, iters: Int): Array[QModel] = {
    val init = df.orderBy(col(idCol)).limit(k)
      .select(col(qvCol)).collect()
      .map(_.getSeq[Long](0).toArray)
    val books: Array[Array[Array[Long]]] =
      Array.tabulate(m)(s => init.map(_.slice(s * subDim, (s + 1) * subDim)))
    (0 until iters).foreach { _ =>
      val models = books.map(b => QModel(b.map(_.clone())))
      val sub = (col("pos") / lit(subDim)).cast("int")
      val sums = df
        .select(col(qvCol), pqCodes(col(qvCol), models, subDim).as("cells"))
        .select(col("cells"), posexplode(col(qvCol)).as(Seq("pos", "x")))
        .select(sub.as("s"), col("pos"),
          element_at(col("cells"), sub + 1).as("cell"), col("x"))
        .groupBy(col("s"), col("cell"), col("pos"))
        .agg(sum(col("x")).as("sm"), count(lit(1)).as("n"))
        .collect()
      // cells with no members keep their centroid (same as train())
      sums.foreach { r =>
        val s = r.getInt(0)
        books(s)(r.getInt(1))(r.getInt(2) - s * subDim) =
          r.getLong(3) / r.getLong(4)
      }
    }
    books.map(QModel(_))
  }

  /** Past this many total codebook entries (subspaces × cells) the
    * literal-argmin expression's codegen tree cost dominates the scan —
    * the same regime split as [[IvfIndex]]'s MaxLiteralCells, measured
    * there at 19 s vs 1.5 s; the PQ configs in use (8×16 = 128 entries,
    * each a sliced dist2 tree) sit well past it.
    */
  private val MaxLiteralPqEntries = 32

  /** PQ code array: per-subspace argmin codebook entry. Literal
    * expression below [[MaxLiteralPqEntries]]; above it a closure UDF
    * with IDENTICAL integer arithmetic and tie rule (argmin by
    * (dist², cell), lowest cell wins — strict `<` keeps the first
    * minimum) — exact Long math is order-fixed, so the two regimes are
    * bit-identical (pinned in PortableAnnSpec) and the SQL oracle is
    * unaffected.
    */
  def pqCodes(qv: Column, books: Array[QModel], subDim: Int): Column =
    if (books.length * books.headOption.map(_.k).getOrElse(0)
        <= MaxLiteralPqEntries)
      pqCodesLiteral(qv, books, subDim)
    else {
      val cents: Array[Array[Array[Long]]] = books.map(_.centroids)
      val f = udf { v: Seq[Long] =>
        // null vector -> null codes (the rpProject convention; the
        // literal expression form also nulls out — dist2(null) is null)
        if (v == null) null
        else pqCodesLocal(v, cents, subDim)
      }
      f(qv)
    }

  /** Driver-twin of the closure branch (also its body): per-subspace
    * argmin with strict `<` — first (lowest) cell wins, matching
    * [[bestCell]]'s (dist, cell) struct-min tie rule; slice semantics
    * match `slice` + LongDist2Expr's min-length loop.
    */
  private def pqCodesLocal(v: Seq[Long], cents: Array[Array[Array[Long]]],
                           subDim: Int): Array[Int] = {
    val m = cents.length
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val off = s * subDim
      val book = cents(s)
      var best = 0
      var bestD = Long.MaxValue
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        val n = math.min(subDim, math.min(cent.length,
          math.max(v.length - off, 0)))
        var d = 0L
        var i = 0
        while (i < n) {
          val x = v(off + i) - cent(i)
          d += x * x
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    out
  }

  /** The literal-expression twin of [[pqCodes]] — the cross-check oracle
    * form (bit-equality pinned in PortableAnnSpec, null vectors
    * included). The isNotNull gate is load-bearing: without it a null
    * vector's per-subspace array_min compares structs whose dist field
    * is null (nulls-first struct ordering) and silently yields cell 0
    * instead of null — the closure branch's null→null is the intended
    * semantic for both regimes.
    */
  private[graft] def pqCodesLiteral(qv: Column, books: Array[QModel],
                                    subDim: Int): Column =
    when(qv.isNotNull, array(books.zipWithIndex.map { case (b, s) =>
      bestCell(slice(qv, s * subDim + 1, subDim), b)
    }.toIndexedSeq: _*))

  /** ADC + exact-rerank search over quantized vectors for ONE query
    * (mirrors [[PqIndex.searchWithRerank]]): the per-subspace lookup
    * table is integer L2² of the query's subvector to each code centroid;
    * the ADC shortlist (ties → lowest id) is reranked by full integer
    * L2². In SQL the lut becomes a relational join against the codebook
    * CTE — same numbers.
    */
  def pqSearchWithRerank(corpus0: DataFrame, idCol: String, qvCol: String,
                         books: Array[QModel], query: Array[Long],
                         subDim: Int, shortlist: Int, topK: Int): DataFrame = {
    // a null vector has no codes (null, both regimes) and no distance —
    // it is unsearchable, and letting its null ADC/d2 reach an ascending
    // orderBy would rank it FIRST (Spark sorts nulls first); drop it
    val corpus = corpus0.filter(col(qvCol).isNotNull)
    val lut: Array[Array[Long]] = books.zipWithIndex.map { case (b, s) =>
      val qs = query.slice(s * subDim, (s + 1) * subDim)
      b.centroids.map { c =>
        var d = 0L
        var i = 0
        while (i < subDim) { val x = qs(i) - c(i); d += x * x; i += 1 }
        d
      }
    }
    val adc = books.indices.map { s =>
      element_at(typedLit(lut(s).toSeq), col("__code")(s) + 1)
    }.reduce(_ + _)
    val cand = corpus
      .withColumn("__code", pqCodes(col(qvCol), books, subDim))
      .select(col(idCol), adc.as("adc"))
      .orderBy(col("adc"), col(idCol))
      .limit(shortlist)
    corpus.join(cand.select(idCol), Seq(idCol), "left_semi")
      .select(col(idCol),
        dist2(col(qvCol), typedLit(query.toSeq)).as("d"))
      .orderBy(col("d"), col(idCol))
      .limit(topK)
  }

  /** Portable SQ8 model over quantized vectors: per-dimension integer
    * min and range (max − min). min/max of longs are order-independent,
    * so training is exactly restatable — one d-row aggregate.
    */
  def sqTrain(df: DataFrame, qvCol: String): (Array[Long], Array[Long]) = {
    val stats = df
      .select(posexplode(col(qvCol)).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    (stats.map(_._2), stats.map(s => s._3 - s._2))
  }

  /** SQ8 search for one query in pure integer arithmetic (mirrors
    * [[SqIndex.searchWithRerank]]): code c = round((v−mn)·255/Δ)
    * computed as clamp₀²⁵⁵((510·(v−mn) + Δ) / (2Δ)). For in-range v
    * (v ∈ [mn, mn+Δ], i.e. train corpus ⊇ search corpus) the operands
    * are non-negative, truncating division equals floor, the clamp is a
    * no-op, and the rounding is exact and engine-portable. The clamp
    * covers vectors OUTSIDE the trained range (rows scored after
    * [[sqTrain]] ran on an older corpus): a negative numerator truncates
    * toward zero on the JVM but floors in SQL's `//` — both land ≤ 0 and
    * clamp to the same 0, and above-range values clamp to 255 on both
    * engines, so codes stay bit-identical cross-engine (the guarantee
    * this class exists for). The byte-scan distance is kept in
    * ×255-scaled integers (Σ(255·mn + c·Δ − 255·q)² — same ordering as
    * the dequantized float distance, zero rounding); the shortlist is
    * then exactly reranked on the quantized vectors.
    */
  def sqSearchWithRerank(corpus: DataFrame, idCol: String, qvCol: String,
                         mins: Array[Long], deltas: Array[Long],
                         query: Array[Long], shortlist: Int,
                         topK: Int): DataFrame = {
    val adc = udf { v: Seq[Long] =>
      var d = 0L
      var i = 0
      while (i < v.length) {
        val delta = deltas(i)
        val c = if (delta == 0L) 0L
          else math.max(0L, math.min(255L,
            (510L * (v(i) - mins(i)) + delta) / (2L * delta)))
        val t = 255L * mins(i) + c * delta - 255L * query(i)
        d += t * t
        i += 1
      }
      d
    }
    val cand = corpus
      .select(col(idCol), adc(col(qvCol)).as("adc"))
      .orderBy(col("adc"), col(idCol))
      .limit(shortlist)
    corpus.join(cand.select(idCol), Seq(idCol), "left_semi")
      .select(col(idCol), dist2(col(qvCol), typedLit(query.toSeq)).as("d"))
      .orderBy(col("d"), col(idCol))
      .limit(topK)
  }

  /** Per-dimension (n, sums) of the quantized corpus — the BINARY
    * quantization threshold WITHOUT a division: bit j of a vector is
    * `n·x_j > sum_j` (x_j above the per-dim mean), exact integer math
    * both engines evaluate identically (a divided mean would need a
    * truncation-rule match; multiplying through by n > 0 needs none).
    * One d-row aggregate, order-independent long sums.
    */
  def bqTrain(df: DataFrame, qvCol: String): (Long, Array[Long]) = {
    val rows = df
      .select(posexplode(col(qvCol)).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    require(rows.nonEmpty,
      s"bqTrain: empty corpus (no non-null '$qvCol' vectors) — no " +
        "threshold model can be trained")
    // every dimension must have seen every vector: null or ragged vectors
    // give per-dim counts that differ, and threading ONE n through the
    // `n·x > Σx` test would silently diverge from the per-dim-count SQL
    // restatement (the bqCommonSql `st` CTE)
    val n = rows.head._3
    require(rows.forall(_._3 == n),
      "bqTrain: ragged or partially-null vectors — per-dimension counts " +
        s"differ (${rows.map(_._3).distinct.mkString(",")}); codes would " +
        "diverge from the SQL restatement")
    (n, rows.map(_._2))
  }

  /** The 64-dim sign code packed into ONE long (the d = 64 tables make
    * the packing exact — 8 bytes per vector, a 64× compression of the
    * quantized form): bit j set iff n·x_j > sum_j. Bit 63's addend is
    * `1L << 63` = Long.MinValue — adding it NEVER overflows (the other
    * 63 bits sum to < 2^63, so every partial sum stays in range, which
    * also keeps ANSI mode happy), and the SQL restatement uses the
    * literal −2^63 because DuckDB's `<< 63` range-errors. Addition of
    * disjoint-bit values equals bitwise OR, so the signed long IS the
    * bit pattern on both engines.
    */
  def bqCode(qv: Column, n: Long, sums: Array[Long]): Column =
    sums.indices.map { j =>
      when(lit(n) * element_at(qv, j + 1) > lit(sums(j)), lit(1L << j))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  /** Driver-side [[bqCode]] twin for a query vector. */
  def bqPack(v: Array[Long], n: Long, sums: Array[Long]): Long = {
    var code = 0L
    var j = 0
    while (j < sums.length) {
      if (n * v(j) > sums(j)) code += (1L << j)
      j += 1
    }
    code
  }

  /** Hamming distance between two packed codes — `bit_count(xor)`, both
    * Spark builtins (codegen'd; no UDF in the scan).
    */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Hamming-shortlist + exact-rerank search for one query (the binary-
    * quantization rung UNDER SQ8 on the ANN ladder — Lucene/FAISS's BQ
    * idea), the IN-MEMORY one-shot form: codes are recomputed from the
    * quantized vectors inside the scan, so this reads the full vector
    * table — right for a single ad-hoc query, wrong for query-many. The
    * write-once/query-many path is [[BqIndex]], which persists the
    * (id, code) table — 8 bytes per vector, 64× fewer pre-rank bytes,
    * ~8 GB per 10⁹ vectors (cacheable where the vectors are not) — and
    * is row-identical to this (pinned in BqIndexSpec; q90 vs q237 share
    * one oracle). The top-`shortlist` by (hamming, id) — a
    * TakeOrderedAndProject, never a global sort — is exactly reranked by
    * integer L2². Shortlist = corpus degrades to exact brute force, the
    * graceful-degradation property the PQ/SQ siblings carry. Every step
    * is deterministic (ties → lowest id) and integer, so unlike PQ/SQ's
    * recall-only gates the APPROXIMATE OUTPUT itself hash-checks against
    * SQL (q237).
    */
  def bqSearchWithRerank(corpus: DataFrame, idCol: String, qvCol: String,
                         n: Long, sums: Array[Long], query: Array[Long],
                         shortlist: Int, topK: Int): DataFrame = {
    val qcode = bqPack(query, n, sums)
    val cand = corpus
      .select(col(idCol),
        hamming(bqCode(col(qvCol), n, sums), lit(qcode)).as("h"))
      .orderBy(col("h"), col(idCol))
      .limit(shortlist)
    corpus.join(cand.select(idCol), Seq(idCol), "left_semi")
      .select(col(idCol), dist2(col(qvCol), typedLit(query.toSeq)).as("d2"))
      .orderBy(col("d2"), col(idCol))
      .limit(topK)
  }

  /** Integer cosine-threshold predicate cos(a,b) ≥ num/den, exact:
    * dot > 0 AND den²·dot² ≥ num²·‖a‖²·‖b‖². (cos ≥ τ > 0 requires
    * dot > 0, after which squaring is monotone.)
    */
  def cosGe(dot: Column, na2: Column, nb2: Column,
            num: Long, den: Long): Column =
    dot > 0 && lit(den * den) * dot * dot >= lit(num * num) * na2 * nb2

  /** Deterministic ±1 Johnson–Lindenstrauss sign matrix: sign(j, i) =
    * +1 iff the low bit of md5_low64("rp:j:i") is set (the engine-
    * portable hash convention q25 pins) — so the matrix restates in
    * DuckDB as `md5_number_lower('rp:'||j||':'||i) % 2`. Achlioptas
    * (2001) showed ±1 entries satisfy the JL lemma like Gaussians:
    * E[‖Sx‖²] = outDims·‖x‖², concentration O(1/√outDims).
    */
  def rpSigns(outDims: Int, d: Int): Array[Array[Int]] =
    Array.tabulate(outDims, d)((j, i) =>
      if ((DedupOps.md5Low64Token(s"rp:$j:$i") & 1L) == 1L) 1 else -1)

  /** Project quantized vectors through a ±1 sign matrix:
    * y(j) = Σ_i sign(j,i)·x(i), exact Long arithmetic. A map-only scan —
    * the matrix ships once in the closure (outDims×d ints), nothing
    * shuffles; the loop form keeps codegen trees small (the PQ lesson).
    */
  def rpProject(qv: Column, signs: Array[Array[Int]]): Column = {
    val f = udf { x: Seq[Long] =>
      if (x == null) null
      else {
        val d = math.min(x.length, signs(0).length)
        val out = new Array[Long](signs.length)
        var j = 0
        while (j < signs.length) {
          val row = signs(j)
          var s = 0L; var i = 0
          while (i < d) { s += row(i) * x(i); i += 1 }
          out(j) = s; j += 1
        }
        out
      }
    }
    f(qv)
  }

  /** Triplet mining for contrastive training data: per anchor, the
    * `negK` NEAREST vectors with a DIFFERENT label (hard negatives — the
    * most confusable wrong-label examples, the ones a triplet/InfoNCE
    * batch should contain) and the single FARTHEST vector with the SAME
    * label (hardest positive). Completes [[Similarity.hardNegatives]]
    * (q118, negative-only, rounded float cosine) into full triplet
    * construction in exact integer L2² over quantized vectors,
    * ties → lowest id, so the whole selection restates in SQL.
    *
    * Plan: the bounded anchor set broadcasts over ONE corpus scan; the
    * rank windows partition on query_id (anchors × corpus rows split
    * across ≤|anchors| partitions). At 100 TB the exhaustive scan is the
    * recall baseline — the production path swaps it for [[ivfSearch]]'s
    * probe join (label logic and ranking unchanged), which this mirrors.
    */
  /** The 100 TB path for [[hardExamples]]'s negatives: candidates come
    * from the anchor's `nprobe` nearest IVF cells instead of the whole
    * corpus (the q46/q217 probe-join shape), then the same wrong-label
    * filter and (d², id) ranking. Recall vs the exhaustive selection is
    * what q225 hash-checks.
    */
  def ivfHardNegatives(anchors: DataFrame, corpus: DataFrame, idCol: String,
                       qvCol: String, labelCol: String, model: QModel,
                       nprobe: Int, negK: Int): DataFrame = {
    val assigned = corpus.withColumn("cell", bestCell(col(qvCol), model))
    val q = anchors
      .select(col(idCol).as("query_id"), col(qvCol).as("__qq"),
        col(labelCol).as("anchor_label"))
      .withColumn("cell", explode(probeCells(col("__qq"), model, nprobe)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("d"), col(idCol))
    assigned.join(broadcast(q), Seq("cell"))
      .filter(col(idCol) =!= col("query_id") &&
        col(labelCol) =!= col("anchor_label"))
      .select(col("query_id"), col(idCol),
        dist2(col(qvCol), col("__qq")).as("d"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= negK)
  }

  def hardExamples(anchors: DataFrame, corpus: DataFrame, idCol: String,
                   qvCol: String, labelCol: String, negK: Int): DataFrame = {
    val q = anchors.select(col(idCol).as("query_id"),
      col(qvCol).as("__qq"), col(labelCol).as("anchor_label"))
    val scored = corpus.crossJoin(broadcast(q))
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col("anchor_label"), col(idCol),
        col(labelCol), dist2(col(qvCol), col("__qq")).as("d2"))
    val wNeg = Window.partitionBy(col("query_id"))
      .orderBy(col("d2"), col(idCol))
    val wPos = Window.partitionBy(col("query_id"))
      .orderBy(col("d2").desc, col(idCol))
    val negs = scored.filter(col(labelCol) =!= col("anchor_label"))
      .withColumn("rank", row_number().over(wNeg).cast("long"))
      .filter(col("rank") <= negK)
      .withColumn("kind", lit("neg"))
    val pos = scored.filter(col(labelCol) === col("anchor_label"))
      .withColumn("rank", row_number().over(wPos).cast("long"))
      .filter(col("rank") <= 1)
      .withColumn("kind", lit("pos"))
    negs.union(pos)
  }
}
