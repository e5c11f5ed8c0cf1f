package graft.queries

import graft.{QDef, Tables}
import graft.operators.{ContentExtraction, DedupOps, ExtractionRules, GraphOps, Relational}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Extraction-tier dispatch, citation-graph semantics (closed-world filter,
  * graph expansion join), rollup subtotals, and sketch-based distinct
  * counting.
  */
object GraphQueries {

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  val defs: Seq[QDef] = Seq(

    // S14/S15: 4-tier extraction dispatcher over synthetic per-tier
    // candidates derived deterministically from documents.
    QDef("q41_extraction_tiers",
      (s, d) => {
        val tiers = t(s, d, "documents").select(
          col("doc_id"),
          when(col("n_chars") >= 400, col("text")).as("html"),
          when(col("n_chars") >= 250, substring(col("text"), 1, 300)).as("grobid"),
          when(col("n_chars") >= 220, substring(col("text"), 1, 220)).as("rx"),
          substring(col("text"), 1, 120).as("abst"),
          when(col("doc_id") % 3 === 0, substring(col("text"), 1, 40)).as("tldr"))
        ContentExtraction.extract(tiers, col("html"), col("grobid"),
          col("rx"), col("abst"), col("tldr"))
          .select(col("doc_id"), col("extraction_method"), col("content_quality"),
            col("has_intro"), col("intro_length"), col("status"),
            md5(col("introduction")).as("intro_md5"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH tiers AS (SELECT doc_id,
             |  CASE WHEN n_chars >= 400 THEN text END AS html,
             |  CASE WHEN n_chars >= 250 THEN substr(text, 1, 300) END AS grobid,
             |  CASE WHEN n_chars >= 220 THEN substr(text, 1, 220) END AS rx,
             |  substr(text, 1, 120) AS abst,
             |  CASE WHEN doc_id % 3 = 0 THEN substr(text, 1, 40) END AS tldr
             |  FROM documents),
             |flags AS (SELECT *,
             |  html IS NOT NULL AND length(html) >= 200 AS html_ok,
             |  grobid IS NOT NULL AND length(grobid) BETWEEN 200 AND 15000 AS grobid_ok,
             |  rx IS NOT NULL AND length(rx) BETWEEN 200 AND 15000 AS rx_ok,
             |  abst IS NOT NULL AND length(abst) > 50 AS abs_ok
             |  FROM tiers),
             |ext AS (SELECT doc_id,
             |  CASE WHEN html_ok THEN html WHEN grobid_ok THEN grobid
             |       WHEN rx_ok THEN rx
             |       WHEN abs_ok THEN (CASE WHEN tldr IS NOT NULL
             |            THEN abst || ' Summary: ' || tldr ELSE abst END)
             |       WHEN tldr IS NOT NULL THEN tldr END AS introduction,
             |  CASE WHEN html_ok THEN 'arxiv_html' WHEN grobid_ok THEN 'grobid'
             |       WHEN rx_ok THEN 'pymupdf_regex'
             |       WHEN abs_ok OR tldr IS NOT NULL THEN 'abstract_tldr'
             |       END AS extraction_method,
             |  CASE WHEN html_ok OR grobid_ok THEN 'high'
             |       WHEN rx_ok THEN 'medium'
             |       WHEN abs_ok OR tldr IS NOT NULL THEN 'low'
             |       END AS content_quality
             |  FROM flags)
             |SELECT doc_id, extraction_method, content_quality,
             |introduction IS NOT NULL AS has_intro,
             |CAST(coalesce(length(introduction), 0) AS BIGINT) AS intro_length,
             |CASE WHEN introduction IS NOT NULL
             |     THEN 'success_' || extraction_method ELSE 'failed' END AS status,
             |md5(introduction) AS intro_md5
             |FROM ext ORDER BY doc_id""".stripMargin)),

    // S11-S13 parse rules + S14/S15 dispatch, end to end: synthesize
    // reference-shaped RAW payloads (ArXiv-HTML section, GROBID-TEI div,
    // PDF page text with numbered headers) from documents, parse each tier
    // with ExtractionRules, then gate-chain. The corpus has no markup
    // metacharacters (probed), so the oracle can state each rule's result
    // in plain SQL — a hash match checks both the parsers and the chain.
    QDef("q128_extraction_rules",
      (s, d) => {
        val raw = t(s, d, "documents").select(
          col("doc_id"),
          when(col("doc_id") % 4 === 0, concat(
            lit("<html><body><section id=\"S1\"><p>"), col("text"),
            lit("</p></section></body></html>")))
            .when(col("doc_id") % 4 === 1, concat(
              lit("<html><body><section><h2>Introduction</h2><p>"), col("text"),
              lit("</p></section></body></html>")))
            .as("html_raw"),
          when(col("doc_id") % 4 === 2, concat(
            lit("<TEI><text><body><div type=\"introduction\"><p>"), col("text"),
            lit("</p></div></body></text></TEI>"))).as("tei_raw"),
          when(col("doc_id") % 4 === 3, concat(
            lit("Title page\n1. Introduction\n"), col("text"),
            lit("\n2. Methods\nrest of paper"))).as("pdf_raw"),
          substring(col("text"), 1, 120).as("abst"),
          when(col("doc_id") % 3 === 0, substring(col("text"), 1, 40)).as("tldr"))
        ExtractionRules.extractFromRaw(raw, col("html_raw"),
          col("tei_raw"), col("pdf_raw"), col("abst"), col("tldr"))
          .select(col("doc_id"), col("extraction_method"), col("content_quality"),
            col("has_intro"), col("intro_length"), col("status"),
            md5(col("introduction")).as("intro_md5"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH f AS (SELECT doc_id, text, length(text) AS n,
             |    substr(text, 1, 120) AS abst,
             |    CASE WHEN doc_id % 3 = 0 THEN substr(text, 1, 40) END AS tldr
             |  FROM documents),
             |g AS (SELECT *,
             |    (doc_id % 4 = 0 OR doc_id % 4 = 1) AND n > 200 AS html_ok,
             |    doc_id % 4 = 2 AND n > 200 AND n <= 15000 AS tei_ok,
             |    doc_id % 4 = 3 AND n > 200 AND n < 15000 AS pdf_ok,
             |    length(abst) > 50 AS abs_ok
             |  FROM f),
             |ext AS (SELECT doc_id,
             |    CASE WHEN html_ok OR tei_ok OR pdf_ok THEN text
             |         WHEN abs_ok THEN (CASE WHEN tldr IS NOT NULL
             |              THEN abst || ' Summary: ' || tldr ELSE abst END)
             |         WHEN tldr IS NOT NULL THEN tldr END AS introduction,
             |    CASE WHEN html_ok THEN 'arxiv_html' WHEN tei_ok THEN 'grobid'
             |         WHEN pdf_ok THEN 'pymupdf_regex'
             |         WHEN abs_ok OR tldr IS NOT NULL THEN 'abstract_tldr'
             |         END AS extraction_method,
             |    CASE WHEN html_ok OR tei_ok THEN 'high'
             |         WHEN pdf_ok THEN 'medium'
             |         WHEN abs_ok OR tldr IS NOT NULL THEN 'low'
             |         END AS content_quality
             |  FROM g)
             |SELECT doc_id, extraction_method, content_quality,
             |introduction IS NOT NULL AS has_intro,
             |CAST(coalesce(length(introduction), 0) AS BIGINT) AS intro_length,
             |CASE WHEN introduction IS NOT NULL
             |     THEN 'success_' || extraction_method ELSE 'failed' END AS status,
             |md5(introduction) AS intro_md5
             |FROM ext ORDER BY doc_id""".stripMargin)),

    // F3/J3: closed-world reference filter — per-order part lists filtered
    // to a universe (parts with p_size < 25), shuffle-side semi-join.
    QDef("q42_closed_world",
      (s, d) => {
        val base = t(s, d, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(sort_array(collect_set(col("l_partkey").cast("string"))).as("parts"))
        val universe = t(s, d, "part").filter(col("p_size") < 25)
          .select(col("p_partkey").cast("string").as("p_partkey"))
        Relational.closedWorldFilter(base, "l_orderkey", "parts", universe, "p_partkey")
          .select(col("l_orderkey"),
            concat_ws(",", col("parts")).as("kept_csv"),
            size(col("parts")).cast("long").as("n_kept"))
          .orderBy(col("l_orderkey"))
      },
      Some("""WITH base AS (SELECT l_orderkey,
             |  list_distinct(list(CAST(l_partkey AS VARCHAR))) AS parts
             |  FROM lineitem GROUP BY 1),
             |uni AS (SELECT list(DISTINCT CAST(p_partkey AS VARCHAR)) AS ul
             |        FROM part WHERE p_size < 25)
             |SELECT l_orderkey,
             |coalesce(array_to_string(list_sort(list_intersect(parts, ul)), ','), '') AS kept_csv,
             |CAST(coalesce(len(list_intersect(parts, ul)), 0) AS BIGINT) AS n_kept
             |FROM base, uni ORDER BY l_orderkey""".stripMargin)),

    // J5: citation-graph-expansion shape — large-large join
    // (orders ⋈ lineitem, AQE-planned) then per-node distinct neighbors.
    QDef("q43_graph_expand",
      (s, d) => t(s, d, "orders")
        .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(countDistinct(col("l_suppkey")).cast("long").as("n_suppliers"),
          count(lit(1)).cast("long").as("n_edges"))
        .orderBy(col("o_custkey")),
      Some("""SELECT o_custkey,
             |CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
             |count(*) AS n_edges
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Rollup subtotals (beyond the reference — free with Catalyst).
    QDef("q44_rollup",
      (s, d) => t(s, d, "customer")
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).cast("long").as("n"),
          round(sum(col("c_acctbal")), 2).as("sum_bal"),
          grouping_id().cast("long").as("gid"))
        .orderBy(col("gid"), col("r_name"), col("n_name")),
      Some("""SELECT r_name, n_name, count(*) AS n,
             |round(sum(c_acctbal), 2) AS sum_bal,
             |CAST(grouping_id(r_name, n_name) AS BIGINT) AS gid
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY ROLLUP (r_name, n_name)
             |ORDER BY gid, r_name, n_name""".stripMargin)),

    // TPC-H Q4 shape: EXISTS with an inequality correlation — planned as a
    // left-semi join with a non-equi condition.
    QDef("q56_exists_inequality",
      (s, d) => {
        val o = t(s, d, "orders")
        val li = t(s, d, "lineitem")
        o.join(li,
            o("o_orderkey") === li("l_orderkey") &&
              li("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAYS"),
            "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).cast("long").as("n"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, count(*) AS n FROM orders
             |WHERE EXISTS (SELECT 1 FROM lineitem
             |  WHERE l_orderkey = o_orderkey
             |    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // TPC-H Q13 shape: left outer join + two-level aggregation (orders-per-
    // customer distribution including zero-order customers).
    QDef("q57_outer_join_dist",
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).cast("long").as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).cast("long").as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc),
      Some("""SELECT c_count, count(*) AS custdist FROM (
             |  SELECT c_custkey, count(o_orderkey) AS c_count
             |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |  GROUP BY 1)
             |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin)),

    // TPC-H Q17 shape: correlated scalar subquery (avg per part),
    // expressed decorrelated in the DataFrame API (groupBy + join — the
    // rewrite Catalyst itself applies); oracle keeps the correlated form.
    QDef("q58_correlated_avg",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val avgQ = li.groupBy(col("l_partkey").as("p_key"))
          .agg(avg(col("l_quantity")).as("avg_qty"))
        li.join(broadcast(avgQ), col("l_partkey") === col("p_key"))
          .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
          .agg(round(sum(col("l_extendedprice")), 2).as("total_price"),
            count(lit(1)).cast("long").as("n"))
      },
      Some("""SELECT round(sum(l_extendedprice), 2) AS total_price,
             |count(*) AS n
             |FROM lineitem l1
             |WHERE l_quantity < 0.5 * (SELECT avg(l_quantity) FROM lineitem l2
             |                          WHERE l2.l_partkey = l1.l_partkey)""".stripMargin)),

    // SQL front-end: the same engine surface through spark.sql over temp
    // views (the reference had no SQL at all; Catalyst gives it free).
    QDef("q59_sql_frontend",
      (s, d) => {
        t(s, d, "nation").createOrReplaceTempView("g_nation")
        t(s, d, "customer").createOrReplaceTempView("g_customer")
        s.sql("""SELECT n_name, count(*) AS n,
                 round(avg(c_acctbal), 6) AS avg_bal
                 FROM g_customer JOIN g_nation ON c_nationkey = n_nationkey
                 GROUP BY n_name ORDER BY n_name""")
      },
      Some("""SELECT n_name, count(*) AS n, round(avg(c_acctbal), 6) AS avg_bal
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // HLL sketch vs exact distinct. The raw estimate is engine-specific
    // (Spark's HLL++ ≠ DuckDB's HLL), so the oracle-checkable statement is
    // the sketch's CONTRACT, not its value: exact counts hash-match, and
    // the estimate sits within 3× the requested rsd (0.02 → ±6%; HLL++
    // error is ~1·rsd typical, 3·rsd is a ~3σ bound, deterministic for
    // fixed data since the sketch itself is deterministic). The oracle
    // states the flags as literals — a drifting sketch flips them to
    // false and fails the hash.
    QDef("q45_approx_distinct",
      (s, d) => t(s, d, "lineitem").agg(
        countDistinct(col("l_partkey")).cast("long").as("exact_parts"),
        countDistinct(col("l_orderkey")).cast("long").as("exact_orders"),
        (abs(approx_count_distinct(col("l_partkey"), rsd = 0.02)
            .cast("double") / countDistinct(col("l_partkey")) - 1.0) <= 0.06)
          .as("parts_within_tol"),
        (abs(approx_count_distinct(col("l_orderkey"), rsd = 0.02)
            .cast("double") / countDistinct(col("l_orderkey")) - 1.0) <= 0.06)
          .as("orders_within_tol")),
      Some("""SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
             |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
             |  TRUE AS parts_within_tol, TRUE AS orders_within_tol
             |FROM lineitem""".stripMargin)),

    // Dedup-group resolution: exact n-gram Jaccard pairs (q24's edges) →
    // connected components via iterative min-label propagation; the oracle
    // computes the same transitive closure with a recursive CTE. Component
    // id = minimum doc_id in the group (deterministic both sides).
    QDef("q69_dedup_components",
      (s, d) => {
        val pairs = DedupOps.ngramJaccardPairs(t(s, d, "documents"),
          "doc_id", "text", n = 3, threshold = 0.5)
        GraphOps.connectedComponents(pairs, "id_a", "id_b")
          .select(col("id").as("doc_id"), col("component"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
             |            FROM documents),
             |sh AS (SELECT doc_id, unnest(list_distinct(
             |         [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
             |          for i in range(1, greatest(len(toks) - 1, 1))])) AS s
             |       FROM t),
             |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
             |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
             |      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             |      GROUP BY 1, 2),
             |pairs AS (SELECT id_a, id_b FROM (
             |    SELECT id_a, id_b, CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS j
             |    FROM p JOIN sz sa ON p.id_a = sa.doc_id
             |           JOIN sz sb ON p.id_b = sb.doc_id)
             |  WHERE j >= 0.5),
             |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
             |          UNION SELECT id_b, id_a FROM pairs),
             |nodes AS (SELECT DISTINCT a AS id FROM edges),
             |reach(id, r) AS (SELECT id, id FROM nodes
             |  UNION SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id)
             |SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS component
             |FROM reach GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Canonical selection over near-dup clusters: q69's components, but the
    // SURVIVOR is the highest-quality doc (fixed-point quality argmax,
    // doc_id tie-break) — production dedup keeps the best copy, not the
    // lowest id. Rank window is component-keyed (no global sort).
    QDef("q146_canonical_selection",
      (s, d) => {
        val docsDf = t(s, d, "documents")
        val pairs = DedupOps.ngramJaccardPairs(docsDf, "doc_id", "text",
          n = 3, threshold = 0.5)
        val comp = GraphOps.connectedComponents(pairs, "id_a", "id_b")
          .select(col("id").as("doc_id"), col("component"))
        val joined = comp.join(
          docsDf.select(col("doc_id"),
            graft.functions.TextFns.qualityScore(col("text")).as("q")),
          Seq("doc_id"))
        val w = Window.partitionBy(col("component"))
          .orderBy(col("q").desc, col("doc_id"))
        val keeper = joined.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("component"), col("doc_id").as("keeper"),
            col("q").as("keeper_quality"))
        joined.groupBy(col("component"))
          .agg(count(lit(1)).cast("long").as("n_docs"))
          .join(keeper, Seq("component"))
          .orderBy(col("component"))
      },
      Some(s"""WITH RECURSIVE t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
             |            FROM documents),
             |sh AS (SELECT doc_id, unnest(list_distinct(
             |         [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
             |          for i in range(1, greatest(len(toks) - 1, 1))])) AS s
             |       FROM t),
             |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
             |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
             |      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             |      GROUP BY 1, 2),
             |pairs AS (SELECT id_a, id_b FROM (
             |    SELECT id_a, id_b, CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS j
             |    FROM p JOIN sz sa ON p.id_a = sa.doc_id
             |           JOIN sz sb ON p.id_b = sb.doc_id)
             |  WHERE j >= 0.5),
             |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
             |          UNION SELECT id_b, id_a FROM pairs),
             |nodes AS (SELECT DISTINCT a AS id FROM edges),
             |reach(id, r) AS (SELECT id, id FROM nodes
             |  UNION SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
             |comp AS (SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS component
             |         FROM reach GROUP BY 1),
             |q AS (SELECT doc_id,
             |  CAST(floor((least(1.0, n_chars_d / 500.0) * 0.4
             |    + (CASE WHEN n_chars_d > 0 THEN alpha / n_chars_d ELSE 0.0 END) * 0.3
             |    + least(1.0, (CASE WHEN toks > 0 THEN stops / toks ELSE 0.0 END) * 3.0) * 0.3) * 100 * 10000 + 0.5) AS BIGINT) AS q
             |  FROM (SELECT doc_id,
             |    CAST(length(text) AS DOUBLE) AS n_chars_d,
             |    CAST(len(regexp_extract_all(text, '[a-zA-Z]')) AS DOUBLE) AS alpha,
             |    CAST(len(regexp_extract_all(text, '[^ ]+')) AS DOUBLE) AS toks,
             |    CAST(len(regexp_extract_all(lower(text), '\\b${graft.functions.TextFns.stopwords.mkString("(", "|", ")")}\\b')) AS DOUBLE) AS stops
             |  FROM documents)),
             |jq AS (SELECT comp.component, comp.doc_id, q.q
             |       FROM comp JOIN q ON comp.doc_id = q.doc_id)
             |SELECT component, n_docs, keeper, keeper_quality FROM (
             |  SELECT component,
             |    count(*) OVER (PARTITION BY component) AS n_docs,
             |    doc_id AS keeper, q AS keeper_quality,
             |    row_number() OVER (PARTITION BY component ORDER BY q DESC, doc_id) AS rn
             |  FROM jq)
             |WHERE rn = 1 ORDER BY component""".stripMargin)),

    // PageRank over the customer→supplier trade graph, 5 fixed rounds —
    // the principled version of the reference's citation-importance score
    // (q33's log-citation heuristic). Supplier ids offset so the two key
    // spaces can't collide.
    QDef("q85_pagerank",
      (s, d) => {
        val edges = t(s, d, "orders")
          .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("src"),
            (col("l_suppkey") + 10000000L).as("dst"))
        GraphOps.pageRank(edges, "src", "dst", iters = 5)
          .select(col("id"), round(col("rank"), 6).as("rank"))
          .orderBy(col("id"))
      },
      Some("""WITH e AS (SELECT DISTINCT o_custkey AS src, l_suppkey + 10000000 AS dst
             |           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
             |n AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
             |dg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
             |ed AS (SELECT e.src, e.dst, dg.deg FROM e JOIN dg USING (src)),
             |r0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS rank FROM n),
             |r1 AS (SELECT n.id, 0.15 + 0.85 * coalesce(c.s, 0) AS rank FROM n LEFT JOIN
             |       (SELECT dst AS id, sum(r.rank / ed.deg) AS s FROM ed JOIN r0 r ON ed.src = r.id GROUP BY 1) c USING (id)),
             |r2 AS (SELECT n.id, 0.15 + 0.85 * coalesce(c.s, 0) AS rank FROM n LEFT JOIN
             |       (SELECT dst AS id, sum(r.rank / ed.deg) AS s FROM ed JOIN r1 r ON ed.src = r.id GROUP BY 1) c USING (id)),
             |r3 AS (SELECT n.id, 0.15 + 0.85 * coalesce(c.s, 0) AS rank FROM n LEFT JOIN
             |       (SELECT dst AS id, sum(r.rank / ed.deg) AS s FROM ed JOIN r2 r ON ed.src = r.id GROUP BY 1) c USING (id)),
             |r4 AS (SELECT n.id, 0.15 + 0.85 * coalesce(c.s, 0) AS rank FROM n LEFT JOIN
             |       (SELECT dst AS id, sum(r.rank / ed.deg) AS s FROM ed JOIN r3 r ON ed.src = r.id GROUP BY 1) c USING (id)),
             |r5 AS (SELECT n.id, 0.15 + 0.85 * coalesce(c.s, 0) AS rank FROM n LEFT JOIN
             |       (SELECT dst AS id, sum(r.rank / ed.deg) AS s FROM ed JOIN r4 r ON ed.src = r.id GROUP BY 1) c USING (id))
             |SELECT id, round(rank, 6) AS rank FROM r5 ORDER BY id""".stripMargin)),

    // End-to-end near-dup PURGE: pairs → components → keep the minimum doc
    // of each group, drop the rest of the corpus' dup mass. One summary row
    // (the per-doc keep set is the q69 component table minus keepers).
    QDef("q77_dedup_purge",
      (s, d) => {
        val corpus = t(s, d, "documents")
        val pairs = DedupOps.ngramJaccardPairs(corpus, "doc_id", "text",
          n = 3, threshold = 0.5)
        val comps = GraphOps.connectedComponents(pairs, "id_a", "id_b")
        val removed = comps.filter(col("id") =!= col("component"))
        corpus.agg(count(lit(1)).cast("long").as("n_docs"))
          .crossJoin(comps.agg(
            count(lit(1)).cast("long").as("n_dup_nodes"),
            countDistinct(col("component")).cast("long").as("n_groups")))
          .crossJoin(removed.agg(
            count(lit(1)).cast("long").as("n_removed")))
          .withColumn("n_survivors", col("n_docs") - col("n_removed"))
      },
      Some("""WITH RECURSIVE t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
             |            FROM documents),
             |sh AS (SELECT doc_id, unnest(list_distinct(
             |         [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
             |          for i in range(1, greatest(len(toks) - 1, 1))])) AS s
             |       FROM t),
             |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
             |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
             |      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             |      GROUP BY 1, 2),
             |pairs AS (SELECT id_a, id_b FROM (
             |    SELECT id_a, id_b, CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS j
             |    FROM p JOIN sz sa ON p.id_a = sa.doc_id
             |           JOIN sz sb ON p.id_b = sb.doc_id)
             |  WHERE j >= 0.5),
             |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
             |          UNION SELECT id_b, id_a FROM pairs),
             |nodes AS (SELECT DISTINCT a AS id FROM edges),
             |reach(id, r) AS (SELECT id, id FROM nodes
             |  UNION SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
             |comps AS (SELECT id, min(r) AS component FROM reach GROUP BY 1)
             |SELECT (SELECT count(*) FROM documents) AS n_docs,
             |  count(*) AS n_dup_nodes,
             |  CAST(count(DISTINCT component) AS BIGINT) AS n_groups,
             |  CAST(sum(CASE WHEN id <> component THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
             |  (SELECT count(*) FROM documents)
             |    - CAST(sum(CASE WHEN id <> component THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors
             |FROM comps""".stripMargin)),

    // Synchronous label propagation (3 deterministic rounds, ties to the
    // smallest label): density-driven communities on the trade graph —
    // the source/community clustering step connectedComponents (pure
    // reachability) cannot express. Oracle unrolls the same 3 rounds
    // (the q85 pattern); per round one neighbor-label shuffle + a
    // node-keyed rank window over the label-diversity-bounded aggregate.
    QDef("q215_label_propagation",
      (s, d) => {
        val edges = t(s, d, "orders")
          .join(t(s, d, "lineitem"),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("src"),
            (col("l_suppkey") + 10000000L).as("dst"))
          .distinct()
        GraphOps.labelPropagation(edges, "src", "dst", rounds = 3)
          .orderBy(col("id"))
      },
      Some("""WITH e AS (SELECT DISTINCT o_custkey AS src, l_suppkey + 10000000 AS dst
             |           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
             |u AS (SELECT src AS a, dst AS b FROM e UNION SELECT dst, src FROM e),
             |l0 AS (SELECT DISTINCT a AS id FROM u),
             |r1 AS (SELECT id, label FROM (
             |    SELECT id, label, row_number() OVER (PARTITION BY id ORDER BY n DESC, label) AS rn
             |    FROM (SELECT u.a AS id, l.label, count(*) AS n
             |          FROM u JOIN (SELECT id, id AS label FROM l0) l ON u.b = l.id
             |          GROUP BY 1, 2))
             |  WHERE rn = 1),
             |r2 AS (SELECT id, label FROM (
             |    SELECT id, label, row_number() OVER (PARTITION BY id ORDER BY n DESC, label) AS rn
             |    FROM (SELECT u.a AS id, l.label, count(*) AS n
             |          FROM u JOIN r1 l ON u.b = l.id GROUP BY 1, 2))
             |  WHERE rn = 1),
             |r3 AS (SELECT id, label FROM (
             |    SELECT id, label, row_number() OVER (PARTITION BY id ORDER BY n DESC, label) AS rn
             |    FROM (SELECT u.a AS id, l.label, count(*) AS n
             |          FROM u JOIN r2 l ON u.b = l.id GROUP BY 1, 2))
             |  WHERE rn = 1)
             |SELECT id, label FROM r3 ORDER BY id""".stripMargin)),

    // Degree assortativity (Newman 2002): Pearson correlation of endpoint
    // degrees over the symmetrized edge list — do high-degree customers
    // trade with high-degree suppliers or the opposite (disassortative,
    // the typical bipartite trade shape). Two keyed aggregates + one
    // corr; edges shuffle once for degrees, once for the endpoint join.
    QDef("q213_assortativity",
      (s, d) => {
        val e = t(s, d, "orders")
          .join(t(s, d, "lineitem"),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("a"),
            (col("l_suppkey") + 10000000L).as("b"))
          .distinct()
        val und = e.union(e.select(col("b").as("a"), col("a").as("b")))
        val deg = und.groupBy(col("a"))
          .agg(count(lit(1)).cast("double").as("deg"))
        und
          .join(deg.select(col("a"), col("deg").as("da")), Seq("a"))
          .join(deg.select(col("a").as("b"), col("deg").as("db")), Seq("b"))
          .agg((count(lit(1)) / 2).cast("long").as("n_edges"),
            round(corr(col("da"), col("db")), 6).as("assortativity"))
      },
      Some("""WITH e AS (SELECT DISTINCT o_custkey AS a, l_suppkey + 10000000 AS b
             |           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
             |u AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
             |d AS (SELECT a, CAST(count(*) AS DOUBLE) AS deg FROM u GROUP BY 1)
             |SELECT CAST(count(*) // 2 AS BIGINT) AS n_edges,
             |  round(corr(da.deg, db.deg), 6) AS assortativity
             |FROM u JOIN d da ON u.a = da.a JOIN d db ON u.b = db.a""".stripMargin)),

    // Dup-cluster SIZE histogram — the dedup-policy evidence q77's single
    // summary row hides: how many clusters of each size exist and how many
    // docs they hold (size 1 = the untouched singleton mass). Same exact
    // pairs → components machinery; the histogram is a component-count
    // aggregate, so everything past the pair join is dup-bounded.
    QDef("q205_dup_cluster_histogram",
      (s, d) => {
        val corpus = t(s, d, "documents")
        val pairs = DedupOps.ngramJaccardPairs(corpus, "doc_id", "text",
          n = 3, threshold = 0.5)
        val comps = GraphOps.connectedComponents(pairs, "id_a", "id_b")
        val hist = comps.groupBy(col("component"))
          .agg(count(lit(1)).as("sz"))
          .groupBy(col("sz").cast("long").as("cluster_size"))
          .agg(count(lit(1)).cast("long").as("n_clusters"))
        val singletons = corpus.agg(count(lit(1)).as("n"))
          .crossJoin(comps.agg(count(lit(1)).as("dup")))
          .select(lit(1L).as("cluster_size"),
            (col("n") - col("dup")).cast("long").as("n_clusters"))
        hist.unionByName(singletons)
          .groupBy(col("cluster_size"))
          .agg(sum(col("n_clusters")).cast("long").as("n_clusters"))
          .withColumn("n_docs",
            (col("cluster_size") * col("n_clusters")).cast("long"))
          .orderBy(col("cluster_size"))
      },
      Some("""WITH RECURSIVE t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
             |            FROM documents),
             |sh AS (SELECT doc_id, unnest(list_distinct(
             |         [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
             |          for i in range(1, greatest(len(toks) - 1, 1))])) AS s
             |       FROM t),
             |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
             |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
             |      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             |      GROUP BY 1, 2),
             |pairs AS (SELECT id_a, id_b FROM (
             |    SELECT id_a, id_b, CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS j
             |    FROM p JOIN sz sa ON p.id_a = sa.doc_id
             |           JOIN sz sb ON p.id_b = sb.doc_id)
             |  WHERE j >= 0.5),
             |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
             |          UNION SELECT id_b, id_a FROM pairs),
             |nodes AS (SELECT DISTINCT a AS id FROM edges),
             |reach(id, r) AS (SELECT id, id FROM nodes
             |  UNION SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
             |comps AS (SELECT id, min(r) AS component FROM reach GROUP BY 1),
             |csz AS (SELECT component, count(*) AS sz FROM comps GROUP BY 1),
             |hist AS (SELECT sz AS cluster_size, count(*) AS n_clusters FROM csz GROUP BY 1
             |         UNION ALL
             |         SELECT 1, (SELECT count(*) FROM documents) - (SELECT count(*) FROM comps))
             |SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
             |  CAST(sum(n_clusters) AS BIGINT) AS n_clusters,
             |  CAST(cluster_size * sum(n_clusters) AS BIGINT) AS n_docs
             |FROM hist GROUP BY cluster_size ORDER BY 1""".stripMargin)),

    // Exact triangle count on the co-purchase graph (parts linked when
    // co-ordered in ≥2 distinct orders). The engine uses degree
    // orientation ([[GraphOps.triangleCount]]) so hub vertices can't blow
    // up the wedge join; the oracle is the textbook a<b<c three-way
    // self-join.
    QDef("q116_triangle_count",
      (s, d) => {
        // pair generation is local to each order (collect_set + nested
        // transform), NOT a fact-fact self-join: one shuffle on the order
        // key, then one on the pair — orders have few distinct parts, so
        // the local k² is trivial while a 600k×600k self-join is not
        val edges = t(s, d, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(collect_set(col("l_partkey")).as("ps"))
          .select(explode(expr(
            "filter(flatten(transform(ps, x -> transform(ps, y -> struct(x, y))))," +
              " p -> p.x < p.y)")).as("p"))
          .groupBy(col("p.x").as("x"), col("p.y").as("y"))
          .agg(count(lit(1)).as("n_orders"))
          .filter(col("n_orders") >= 2)
        GraphOps.triangleCount(edges, "x", "y")
      },
      Some("""WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |e AS (SELECT a.l_partkey AS x, b.l_partkey AS y
             |      FROM lp a JOIN lp b
             |        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             |      GROUP BY 1, 2 HAVING count(*) >= 2)
             |SELECT (SELECT count(*) FROM e) AS n_edges,
             |  (SELECT count(*) FROM e e1
             |   JOIN e e2 ON e2.x = e1.x AND e2.y > e1.y
             |   JOIN e e3 ON e3.x = e1.y AND e3.y = e2.y) AS n_triangles""".stripMargin)),

    // Association-rule mining (market-basket, FP-growth's output at the
    // pairwise level): co-ordered part pairs with support ≥ 3 orders →
    // both rule directions with confidence and lift. The transaction pass
    // shuffles once on the order key (local pair expansion); item
    // frequencies join back from a tiny aggregate.
    QDef("q120_assoc_rules",
      (s, d) => {
        val lp = t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_partkey")).distinct()
        val nOrders = lp.agg(
          countDistinct(col("l_orderkey")).as("n_orders"))
        val freq = lp.groupBy(col("l_partkey")).agg(count(lit(1)).as("n_item"))
        val pairs = lp.groupBy(col("l_orderkey"))
          .agg(collect_set(col("l_partkey")).as("ps"))
          .select(explode(expr(
            "filter(flatten(transform(ps, x -> transform(ps, y -> struct(x, y))))," +
              " p -> p.x < p.y)")).as("p"))
          .groupBy(col("p.x").as("x"), col("p.y").as("y"))
          .agg(count(lit(1)).as("n_pair"))
          .filter(col("n_pair") >= 3)
        // both directions of every surviving pair
        val rules = pairs.select(col("x").as("lhs"), col("y").as("rhs"), col("n_pair"))
          .unionByName(pairs.select(col("y").as("lhs"), col("x").as("rhs"), col("n_pair")))
        rules
          .join(freq.select(col("l_partkey").as("lhs"), col("n_item").as("n_lhs")), Seq("lhs"))
          .join(freq.select(col("l_partkey").as("rhs"), col("n_item").as("n_rhs")), Seq("rhs"))
          .crossJoin(broadcast(nOrders))
          .select(col("lhs"), col("rhs"), col("n_pair").cast("long").as("n_pair"),
            floor(col("n_pair") * 1000000.0 / col("n_lhs") + 0.5)
              .cast("long").as("confidence_x1e6"),
            floor(col("n_pair") * col("n_orders") * 10000.0
              / (col("n_lhs") * col("n_rhs")) + 0.5).cast("long").as("lift_x1e4"))
          .orderBy(col("lhs"), col("rhs"))
      },
      Some("""WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM lp),
             |freq AS (SELECT l_partkey, count(*) AS n_item FROM lp GROUP BY 1),
             |pairs AS (SELECT a.l_partkey AS x, b.l_partkey AS y, count(*) AS n_pair
             |          FROM lp a JOIN lp b
             |            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             |          GROUP BY 1, 2 HAVING count(*) >= 3),
             |rules AS (SELECT x AS lhs, y AS rhs, n_pair FROM pairs
             |          UNION ALL SELECT y, x, n_pair FROM pairs)
             |SELECT lhs, rhs, CAST(n_pair AS BIGINT) AS n_pair,
             |CAST(floor(n_pair * 1000000.0 / fl.n_item + 0.5) AS BIGINT) AS confidence_x1e6,
             |CAST(floor(n_pair * n.n_orders * 10000.0 / (fl.n_item * fr.n_item) + 0.5) AS BIGINT) AS lift_x1e4
             |FROM rules
             |JOIN freq fl ON rules.lhs = fl.l_partkey
             |JOIN freq fr ON rules.rhs = fr.l_partkey
             |CROSS JOIN n
             |ORDER BY lhs, rhs""".stripMargin)),

    // 80-core of the co-purchase graph (any co-order links two parts; the
    // previous ≥2-order/3-core setting peeled to EMPTY at bench scale, so
    // the query measured loop overhead, not the operator — VERDICT r2).
    // k=80 peels 5 real rounds and keeps ~93% of vertices at sf0.01 AND
    // sf0.1. The engine iterates to the true data-dependent fixed point;
    // the oracle unrolls 12 peel rounds in SQL — peeling is idempotent
    // once converged, so any unroll ≥ the actual depth (5 here) is the
    // exact fixed point, and a depth beyond 12 would surface as a hash
    // mismatch rather than a silent wrong answer.
    QDef("q121_kcore",
      (s, d) => {
        val lp = t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_partkey")).distinct()
        val edges = lp.groupBy(col("l_orderkey"))
          .agg(collect_set(col("l_partkey")).as("ps"))
          .select(explode(expr(
            "filter(flatten(transform(ps, x -> transform(ps, y -> struct(x, y))))," +
              " p -> p.x < p.y)")).as("p"))
          .select(col("p.x").as("x"), col("p.y").as("y"))
          .distinct()
        GraphOps.kCore(edges, "x", "y", k = 80)
          .orderBy(col("v"))
      },
      Some(kcoreOracleSql(k = 80, rounds = 12))),

    // Leakage-free split assignment: the split hash runs over the q69
    // near-dup COMPONENT key (singletons hash as themselves = q80's rule),
    // so no near-dup pair can straddle train/test — assignment-side
    // closure of the hole q159 audits. Oracle: recursive-CTE components
    // + the same md5 first-hex-char split rule.
    QDef("q183_group_split",
      (s, d) => graft.operators.DataSelection.leakageFreeSplit(
          t(s, d, "documents"), "doc_id", "text", n = 3, threshold = 0.5)
        .orderBy(col("doc_id")),
      Some(s"""WITH RECURSIVE t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
             |            FROM documents),
             |sh AS (SELECT doc_id, unnest(list_distinct(
             |         [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
             |          for i in range(1, greatest(len(toks) - 1, 1))])) AS s
             |       FROM t),
             |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
             |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
             |      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             |      GROUP BY 1, 2),
             |pairs AS (SELECT id_a, id_b FROM (
             |    SELECT id_a, id_b, CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS j
             |    FROM p JOIN sz sa ON p.id_a = sa.doc_id
             |           JOIN sz sb ON p.id_b = sb.doc_id)
             |  WHERE j >= 0.5),
             |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
             |          UNION SELECT id_b, id_a FROM pairs),
             |nodes AS (SELECT DISTINCT a AS id FROM edges),
             |reach(id, r) AS (SELECT id, id FROM nodes
             |  UNION SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
             |comp AS (SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS component
             |         FROM reach GROUP BY 1),
             |g AS (SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS group_key
             |      FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id),
             |h AS (SELECT doc_id, group_key,
             |        substr(md5(CAST(group_key AS VARCHAR)), 1, 1) AS hx FROM g)
             |SELECT doc_id, group_key,
             |  CASE WHEN hx BETWEEN '0' AND '9' OR hx IN ('a', 'b') THEN 'train'
             |       WHEN hx IN ('c', 'd') THEN 'val' ELSE 'test' END AS split
             |FROM h ORDER BY doc_id""".stripMargin)),

    // Transitive-contamination closure: direct-overlap seeds (docs
    // sharing ≥3 distinct 4-grams with a doc_id%7 pseudo-benchmark slice;
    // q79's rule with a wider slice so the walk is exercised) walked
    // ≤3 hops outward through q24's exact near-dup pairs — min hop per
    // reached doc. Catches the paraphrase-of-a-paraphrase tail direct
    // decontamination misses; frontier BFS, each round joins only the
    // newest (dup-bounded) frontier. Oracle: recursive-CTE min-hop BFS
    // over the same seed rule and pair set.
    QDef("q185_taint_hops",
      (s, d) => {
        val ds = t(s, d, "documents")
        val edges = DedupOps.ngramJaccardPairs(ds, "doc_id", "text",
          n = 3, threshold = 0.5)
        val seeds = DedupOps.decontaminate(ds, "doc_id", "text", 4,
            col("doc_id") % 7 === 0)
          .filter(col("n_shared_grams") >= 3L)
          .select(col("doc_id"))
        GraphOps.minHopFrom(seeds, edges, "id_a", "id_b", maxHops = 3)
          .select(col("id").as("doc_id"), col("hop"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH RECURSIVE t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
             |            FROM documents),
             |sh AS (SELECT doc_id, unnest(list_distinct(
             |         [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
             |          for i in range(1, greatest(len(toks) - 1, 1))])) AS s
             |       FROM t),
             |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
             |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
             |      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             |      GROUP BY 1, 2),
             |pairs AS (SELECT id_a, id_b FROM (
             |    SELECT id_a, id_b, CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS j
             |    FROM p JOIN sz sa ON p.id_a = sa.doc_id
             |           JOIN sz sb ON p.id_b = sb.doc_id)
             |  WHERE j >= 0.5),
             |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
             |          UNION SELECT id_b, id_a FROM pairs),
             |g4 AS (SELECT DISTINCT doc_id, array_to_string(list_slice(toks, i, i+3), ' ') AS g
             |       FROM t, UNNEST(range(1, len(toks)-2)) AS u(i)),
             |bench AS (SELECT DISTINCT g FROM g4 WHERE doc_id % 7 = 0),
             |seeds AS (SELECT c.doc_id FROM g4 c JOIN bench b USING (g)
             |          WHERE c.doc_id % 7 <> 0 GROUP BY 1 HAVING count(*) >= 3),
             |walk(id, hop) AS (
             |  SELECT doc_id, 0 FROM seeds
             |  UNION
             |  SELECT e.b, walk.hop + 1 FROM walk JOIN edges e ON e.a = walk.id
             |  WHERE walk.hop < 3)
             |SELECT id AS doc_id, CAST(min(hop) AS BIGINT) AS hop
             |FROM walk GROUP BY 1 ORDER BY 1""".stripMargin))
  )

  /** Unrolled simultaneous-peeling k-core in plain SQL (the oracle for
    * q121). Each round: degrees over the surviving edge set → keep
    * vertices with deg ≥ k → restrict edges to kept×kept (JOIN form — the
    * IN-subquery form goes superlinear in DuckDB past ~10 rounds).
    * MATERIALIZED pins each round's CTE so the chain can't be inlined
    * exponentially. 12 rounds = 2.4× the measured peel depth (5 at both
    * sf0.01 and sf0.1); a deeper-than-unrolled graph surfaces as a hash
    * MISMATCH, never a silent pass.
    */
  private def kcoreOracleSql(k: Int, rounds: Int): String = {
    val sb = new StringBuilder(
      """WITH lp AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e0 AS MATERIALIZED (SELECT a.l_partkey AS x, b.l_partkey AS y
        |  FROM lp a JOIN lp b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2)""".stripMargin)
    (1 to rounds).foreach { i =>
      sb.append(s""",
        |k$i AS MATERIALIZED (SELECT v FROM (
        |    SELECT x AS v FROM e${i - 1} UNION ALL SELECT y FROM e${i - 1})
        |  GROUP BY 1 HAVING count(*) >= $k),
        |e$i AS MATERIALIZED (SELECT e.x, e.y FROM e${i - 1} e
        |  JOIN k$i ka ON e.x = ka.v JOIN k$i kb ON e.y = kb.v)""".stripMargin)
    }
    sb.append(s"""
      |SELECT v, CAST(count(*) AS BIGINT) AS deg
      |FROM (SELECT x AS v FROM e$rounds UNION ALL SELECT y FROM e$rounds)
      |GROUP BY 1 ORDER BY v""".stripMargin)
    sb.toString
  }
}
