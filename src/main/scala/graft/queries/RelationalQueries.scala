package graft.queries

import graft.{QDef, Tables}
import graft.operators.{DedupOps, Layout, Profiling, Relational}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator surface (SURVEY.md §2.4–§2.8) exercised over the
  * driver's TPC-H-ish testdata, each with a DuckDB oracle.
  *
  * Determinism rules used throughout (the driver hash-compares):
  *  - every computed column is aliased identically in Spark and SQL;
  *  - double aggregates are rounded (sums→2dp, avgs/ratios→6dp) so that
  *    summation-order FP noise can't flip the hash;
  *  - any LIMIT is preceded by a total order with a unique tie-break key.
  */
object RelationalQueries {

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  /** TPC-H Q1-shaped pricing summary: the reference's grouped-stats family
    * (A1/A8/A19) over lineitem. One hash-aggregate pass, map-side partial
    * aggregation; ~6 groups regardless of scale.
    */
  def pricingSummary(li: DataFrame): DataFrame =
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).cast("long").as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val defs: Seq[QDef] = Seq(
    QDef("q01_pricing_summary",
      (s, d) => pricingSummary(t(s, d, "lineitem")),
      Some("""SELECT l_returnflag, l_linestatus,
             |round(sum(l_quantity), 2) AS sum_qty,
             |round(sum(l_extendedprice), 2) AS sum_base_price,
             |round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             |round(avg(l_quantity), 6) AS avg_qty,
             |round(avg(l_discount), 6) AS avg_disc,
             |count(*) AS count_order
             |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // A1/A2: group-mean slices (mean citationCount by domain → mean
    // o_totalprice by o_orderpriority), ordered desc like the MetricFrame.
    QDef("q02_group_mean_slices",
      (s, d) => t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(round(avg(col("o_totalprice")), 6).as("avg_total"),
             count(lit(1)).cast("long").as("n"))
        .orderBy(col("avg_total").desc, col("o_orderpriority")),
      Some("""SELECT o_orderpriority, round(avg(o_totalprice), 6) AS avg_total,
             |count(*) AS n FROM orders GROUP BY 1
             |ORDER BY avg_total DESC, o_orderpriority""".stripMargin)),

    // A6: value_counts + global share.
    QDef("q03_value_counts",
      (s, d) => Profiling.valueCounts(t(s, d, "events"), "event_type"),
      Some("""SELECT event_type, n, round(n / sum(n) OVER (), 6) AS share
             |FROM (SELECT event_type, count(*) AS n FROM events GROUP BY 1)
             |ORDER BY n DESC, event_type""".stripMargin)),

    // A7: per-column missing profile, one row.
    QDef("q04_missing_profile",
      (s, d) => Profiling.missingProfile(t(s, d, "documents")),
      Some("""SELECT count(*) AS n_rows,
             |count(*) - count(doc_id) AS doc_id_nulls,
             |count(*) - count(text) AS text_nulls,
             |count(*) - count(lang) AS lang_nulls,
             |count(*) - count(source) AS source_nulls,
             |count(*) - count(n_chars) AS n_chars_nulls
             |FROM documents""".stripMargin)),

    // A8: numeric stats (min/max exact, avg/std rounded).
    QDef("q05_numeric_stats",
      (s, d) => Profiling.numericStats(t(s, d, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount")),
      Some("""SELECT
             |min(l_quantity) AS l_quantity_min, max(l_quantity) AS l_quantity_max,
             |round(avg(l_quantity), 6) AS l_quantity_avg,
             |round(stddev_samp(l_quantity), 6) AS l_quantity_std,
             |min(l_extendedprice) AS l_extendedprice_min,
             |max(l_extendedprice) AS l_extendedprice_max,
             |round(avg(l_extendedprice), 6) AS l_extendedprice_avg,
             |round(stddev_samp(l_extendedprice), 6) AS l_extendedprice_std,
             |min(l_discount) AS l_discount_min, max(l_discount) AS l_discount_max,
             |round(avg(l_discount), 6) AS l_discount_avg,
             |round(stddev_samp(l_discount), 6) AS l_discount_std
             |FROM lineitem""".stripMargin)),

    // F1: keep-first dedup via explicit priority window (earliest order per
    // customer, orderkey tie-break) — oracle-stable survivor choice.
    QDef("q06_dedup_keepfirst",
      (s, d) => Relational.dedupKeepFirst(
          t(s, d, "orders").select("o_custkey", "o_orderkey", "o_orderdate"),
          Seq("o_custkey"), Seq(col("o_orderdate"), col("o_orderkey")))
        .orderBy(col("o_custkey")),
      Some("""SELECT o_custkey, o_orderkey, o_orderdate FROM (
             |  SELECT o_custkey, o_orderkey, o_orderdate,
             |    row_number() OVER (PARTITION BY o_custkey
             |                       ORDER BY o_orderdate, o_orderkey) AS rn
             |  FROM orders) WHERE rn = 1 ORDER BY o_custkey""".stripMargin)),

    // J1/J4: fact→dim enrichment chain. Dims are broadcast (reference did
    // dict lookups); at 100 TB the orders side streams, dims stay broadcast.
    QDef("q07_join_enrich",
      (s, d) => t(s, d, "orders")
        .join(broadcast(t(s, d, "customer")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).cast("long").as("n_orders"),
             round(sum(col("o_totalprice")), 2).as("sum_total"))
        .orderBy(col("r_name"), col("n_name")),
      Some("""SELECT r_name, n_name, count(*) AS n_orders,
             |round(sum(o_totalprice), 2) AS sum_total
             |FROM orders
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // F2/J2: anti join — customers with no orders (reference: skip papers
    // already in the DB).
    QDef("q08_anti_join",
      (s, d) => Relational.antiJoin(
          t(s, d, "customer").select("c_custkey", "c_name"),
          t(s, d, "orders").select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    // F3/J3 shape: semi join — parts that appear in lineitem.
    QDef("q09_semi_join",
      (s, d) => Relational.semiJoin(
          t(s, d, "part").select("p_partkey", "p_name"),
          t(s, d, "lineitem").select(col("l_partkey").as("p_partkey")),
          Seq("p_partkey"))
        .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey, p_name FROM part
             |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
             |ORDER BY p_partkey""".stripMargin)),

    // O3: top-k by measure with unique tie-break; planned as
    // TakeOrderedAndProject (no global sort).
    QDef("q10_topk_customers",
      (s, d) => Relational.topK(
          t(s, d, "orders").groupBy(col("o_custkey"))
            .agg(round(sum(col("o_totalprice")), 2).as("sum_total"),
                 count(lit(1)).cast("long").as("n_orders")),
          10, col("sum_total").desc, col("o_custkey").asc),
      Some("""SELECT o_custkey, round(sum(o_totalprice), 2) AS sum_total,
             |count(*) AS n_orders FROM orders GROUP BY 1
             |ORDER BY sum_total DESC, o_custkey LIMIT 10""".stripMargin)),

    // F6/A13: validity predicates + completeness/validity quality score.
    QDef("q11_quality_score",
      (s, d) => Profiling.qualityScore(t(s, d, "orders"),
        yearCol = "o_orderdate", minYear = 1992, maxYear = 1998,
        nonNegCol = "o_totalprice"),
      Some("""SELECT n_rows, n_missing_cells, n_bad_year, n_negative,
             |round((1 - n_missing_cells / (n_rows * 6.0)) * 100, 6) AS completeness,
             |round(((2.0 * n_rows - (n_bad_year + n_negative)) / (2.0 * n_rows)) * 100, 6) AS validity,
             |round((round((1 - n_missing_cells / (n_rows * 6.0)) * 100, 6)
             |     + round(((2.0 * n_rows - (n_bad_year + n_negative)) / (2.0 * n_rows)) * 100, 6)) / 2.0, 6) AS overall_quality
             |FROM (SELECT count(*) AS n_rows,
             |  CAST(6 * count(*) - count(o_orderkey) - count(o_custkey)
             |    - count(o_orderstatus) - count(o_totalprice) - count(o_orderdate)
             |    - count(o_orderpriority) AS BIGINT) AS n_missing_cells,
             |  CAST(sum(CASE WHEN year(o_orderdate) < 1992 OR year(o_orderdate) > 1998
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_year,
             |  CAST(sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative
             |FROM orders)""".stripMargin)),

    // TPC-H Q6 shape: selective scan + single aggregate. Filters land in
    // PushedFilters (verified in plan audit).
    QDef("q50_tpch_q6",
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1997-01-01") &&
          col("l_discount").between(0.03, 0.07) &&
          col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
          count(lit(1)).cast("long").as("n")),
      Some("""SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
             |count(*) AS n FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |  AND l_shipdate < TIMESTAMP '1997-01-01'
             |  AND l_discount BETWEEN 0.03 AND 0.07
             |  AND l_quantity < 24""".stripMargin)),

    // TPC-H Q3 shape: selective fact-fact join + grouped top-k revenue.
    QDef("q51_tpch_q3",
      (s, d) => t(s, d, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < lit("1998-01-01"))
        .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") >= lit("1996-06-01"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10),
      Some("""SELECT l_orderkey, o_orderdate, o_orderpriority,
             |round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1998-01-01'
             |  AND l_shipdate >= TIMESTAMP '1996-06-01'
             |GROUP BY 1, 2, 3 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)),

    // TPC-H Q5 shape: the full snowflake join with a regional filter.
    QDef("q52_tpch_q5",
      (s, d) => t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "supplier")),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1998-01-01"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("r_name"), col("revenue").desc, col("n_name")),
      Some("""SELECT r_name, n_name,
             |round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate < TIMESTAMP '1998-01-01'
             |GROUP BY 1, 2 ORDER BY r_name, revenue DESC, n_name""".stripMargin)),

    // U-family set ops: INTERSECT / EXCEPT over derived key sets.
    QDef("q49_set_ops",
      (s, d) => {
        val o = t(s, d, "orders").filter(col("o_orderstatus") === "O")
          .select("o_custkey").distinct()
        val f = t(s, d, "orders").filter(col("o_orderstatus") === "F")
          .select("o_custkey").distinct()
        o.intersect(f).withColumn("tag", lit("both"))
          .unionByName(o.except(f).withColumn("tag", lit("o_only")))
          .orderBy(col("tag"), col("o_custkey"))
      },
      Some("""SELECT o_custkey, 'both' AS tag FROM (
             |  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
             |  INTERSECT
             |  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
             |UNION ALL
             |SELECT o_custkey, 'o_only' AS tag FROM (
             |  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
             |  EXCEPT
             |  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
             |ORDER BY tag, o_custkey""".stripMargin)),

    // U1: union across drifting schemas (reference: processed files gain
    // columns over time) — missing columns become nulls, counted here.
    QDef("q53_union_drift",
      (s, d) => {
        val a = t(s, d, "documents").select(col("doc_id"), col("lang"))
        val b = t(s, d, "documents").select(col("doc_id"), col("source"), col("n_chars"))
        Relational.unionAll(Seq(a, b)).agg(
          count(lit(1)).cast("long").as("n_rows"),
          count(col("lang")).cast("long").as("n_lang"),
          count(col("source")).cast("long").as("n_source"),
          count(col("n_chars")).cast("long").as("n_chars_present"))
      },
      Some("""SELECT count(*) AS n_rows,
             |count(lang) AS n_lang, count(source) AS n_source,
             |count(n_chars) AS n_chars_present
             |FROM (SELECT doc_id, lang FROM documents
             |      UNION ALL BY NAME
             |      SELECT doc_id, source, n_chars FROM documents)""".stripMargin)),

    // §2.9 date/time scalar surface: month bucketing + quarter.
    QDef("q54_date_buckets",
      (s, d) => t(s, d, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
          quarter(col("o_orderdate")).cast("long").as("qtr"))
        .agg(count(lit(1)).cast("long").as("n"),
          round(sum(col("o_totalprice")), 2).as("sum_total"))
        .orderBy(col("month")),
      Some("""SELECT strftime(o_orderdate, '%Y-%m') AS month,
             |CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
             |count(*) AS n, round(sum(o_totalprice), 2) AS sum_total
             |FROM orders GROUP BY 1, 2 ORDER BY month""".stripMargin)),

    // A9: duplicate audit by content hash.
    QDef("q12_duplicate_audit",
      (s, d) => Profiling.duplicateAudit(
        t(s, d, "documents").withColumn("text_hash", md5(col("text"))), "text_hash"),
      Some("""SELECT count(*) AS n_rows,
             |CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique,
             |count(*) - CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_dup
             |FROM documents""".stripMargin)),

    // arg-max/arg-min per group in a single aggregation pass (max_by/min_by,
    // no window/sort). Ordering key is the exact integer
    // round(value*100)*1e9 + event_id — `value` is a 2dp quantity, so the
    // key is tie-broken by id and bit-identical in both engines (DuckDB
    // arg_max only orders by scalars, not structs).
    QDef("q71_argmax_events",
      (s, d) => {
        val key = round(col("value") * 100).cast("long") * lit(1000000000L) +
          col("event_id")
        t(s, d, "events")
          .groupBy(col("event_type"))
          .agg(
            max_by(col("event_id"), key).as("top_event_id"),
            round(max(col("value")), 2).as("max_value"),
            min_by(col("event_id"), key).as("bottom_event_id"),
            round(min(col("value")), 2).as("min_value"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type,
             |arg_max(event_id, CAST(round(value * 100) AS BIGINT) * 1000000000 + event_id) AS top_event_id,
             |round(max(value), 2) AS max_value,
             |arg_min(event_id, CAST(round(value * 100) AS BIGINT) * 1000000000 + event_id) AS bottom_event_id,
             |round(min(value), 2) AS min_value
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Non-equi interval join via bin bucketing: 50 irregular overlapping
    // price bands (derived from p_size so boundaries are exact doubles)
    // probed by part prices. Planned as an equi-join on the bin id — never
    // a nested-loop — so it scales with rows, not bands × rows.
    QDef("q82_interval_join",
      (s, d) => {
        val bands = t(s, d, "part").select(col("p_size")).distinct()
          .withColumn("lo", lit(898.0) + col("p_size") * 2.0)
          .withColumn("hi", col("lo") + 3.0 + (col("p_size") % 4) * 2.5)
        val probe = t(s, d, "part").select(col("p_partkey"), col("p_retailprice"))
        Relational.binnedIntervalJoin(probe, "p_retailprice", bands, "lo", "hi",
            binWidth = 5.0)
          .groupBy(col("p_size"))
          .agg(count(lit(1)).cast("long").as("n_in_band"),
            round(sum(col("p_retailprice")), 2).as("sum_price"))
          .orderBy(col("p_size"))
      },
      Some("""WITH bands AS (SELECT p_size, 898.0 + p_size * 2.0 AS lo,
             |  898.0 + p_size * 2.0 + 3.0 + (p_size % 4) * 2.5 AS hi
             |  FROM (SELECT DISTINCT p_size FROM part)),
             |j AS (SELECT b.p_size, p.p_retailprice FROM part p JOIN bands b
             |  ON p.p_retailprice BETWEEN b.lo AND b.hi)
             |SELECT p_size, count(*) AS n_in_band, round(sum(p_retailprice), 2) AS sum_price
             |FROM j GROUP BY 1 ORDER BY 1""".stripMargin)),

    // MERGE a deterministic changeset (updates + inserts + deletes) into the
    // orders snapshot — the upsert path every incremental pipeline needs
    // (reference: ON CONFLICT batch upload, here with full merge semantics).
    QDef("q84_merge_upsert",
      (s, d) => {
        val snap = t(s, d, "orders")
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
        val upd = snap.filter(col("o_orderkey") % 10 === 0)
          .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
            round(col("o_totalprice") + 1, 2).as("o_totalprice"))
        val ins = snap.filter(col("o_orderkey") % 13 === 0)
          .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
            lit("N").as("o_orderstatus"),
            round(col("o_totalprice"), 2).as("o_totalprice"))
        val del = snap.filter(col("o_orderkey") % 37 === 0).select("o_orderkey")
        Relational.mergeUpsert(snap, upd.unionByName(ins), "o_orderkey", del)
          .select(col("o_orderkey"), col("o_orderstatus").as("status"),
            round(col("o_totalprice"), 2).as("totalprice"), col("action"))
          .orderBy(col("o_orderkey"))
      },
      Some("""WITH upd AS (SELECT o_orderkey, 'U' AS o_orderstatus, round(o_totalprice + 1, 2) AS o_totalprice
             |             FROM orders WHERE o_orderkey % 10 = 0),
             |ins AS (SELECT o_orderkey + 100000000 AS o_orderkey, 'N' AS o_orderstatus,
             |               round(o_totalprice, 2) AS o_totalprice
             |        FROM orders WHERE o_orderkey % 13 = 0),
             |src AS (SELECT * FROM upd UNION ALL SELECT * FROM ins),
             |del AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 37 = 0),
             |m AS (SELECT coalesce(s.o_orderkey, t.o_orderkey) AS o_orderkey,
             |  CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus ELSE t.o_orderstatus END AS status,
             |  round(CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice ELSE t.o_totalprice END, 2) AS totalprice,
             |  CASE WHEN t.o_orderkey IS NULL THEN 'insert'
             |       WHEN s.o_orderkey IS NOT NULL THEN 'update' ELSE 'keep' END AS action
             |  FROM orders t FULL JOIN src s ON t.o_orderkey = s.o_orderkey)
             |SELECT * FROM m WHERE o_orderkey NOT IN (SELECT o_orderkey FROM del)
             |ORDER BY o_orderkey""".stripMargin)),

    // Exact percentile grid per group (Spark's exact `percentile` uses the
    // same linear interpolation as DuckDB's quantile_cont).
    QDef("q89_percentile_grid",
      (s, d) => {
        val ps = t(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75, 0.9))")
            .as("ps"))
        ps.select(col("l_returnflag"),
            round(element_at(col("ps"), 1), 4).as("p25"),
            round(element_at(col("ps"), 2), 4).as("p50"),
            round(element_at(col("ps"), 3), 4).as("p75"),
            round(element_at(col("ps"), 4), 4).as("p90"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
             |round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
             |round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
             |round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
             |round(quantile_cont(l_extendedprice, 0.90), 4) AS p90
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // GROUPING SETS (completing the rollup q44 / cube q60 family): exactly
    // the three aggregation levels the caller asks for, one Expand pass.
    QDef("q95_grouping_sets",
      (s, d) => t(s, d, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderstatus")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).cast("long").as("n"),
          round(sum(col("o_totalprice")), 2).as("sum_total"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("sum_total"))
        .orderBy(col("status"), col("priority")),
      Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
             |       coalesce(o_orderpriority, 'ALL') AS priority,
             |       count(*) AS n, round(sum(o_totalprice), 2) AS sum_total
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
             |ORDER BY status, priority""".stripMargin)),

    // Ordered string aggregation (listagg) with deterministic element order.
    QDef("q96_string_agg",
      (s, d) => t(s, d, "customer")
        .filter(col("c_custkey") % 100 === 0)
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_nationkey"))
        .agg(concat_ws(",", array_sort(collect_list(col("c_name")))).as("names"),
          count(lit(1)).cast("long").as("n"))
        .orderBy(col("n_nationkey")),
      Some("""SELECT n_nationkey, string_agg(c_name, ',' ORDER BY c_name) AS names,
             |CAST(count(*) AS BIGINT) AS n
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |WHERE c_custkey % 100 = 0
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // TPC-H Q4 shape: EXISTS decorrelated to a left-semi join with an
    // inequality residual — the semi side never duplicates order rows, so
    // the count is per-order regardless of matching lineitem multiplicity.
    QDef("q104_tpch_q4",
      (s, d) => t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01") &&
          col("o_orderdate") < lit("1997-04-01"))
        .join(t(s, d, "lineitem"),
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).cast("long").as("order_count"))
        .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority, count(*) AS order_count
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
             |  AND o_orderdate < TIMESTAMP '1997-04-01'
             |  AND EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // TPC-H Q10 shape: returned-item revenue per customer over a quarter,
    // top 20. Fact-fact join shuffles on the order key; customer + nation
    // stay broadcast; top-k is TakeOrderedAndProject.
    QDef("q105_tpch_q10",
      (s, d) => t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1998-01-01") &&
          col("o_orderdate") < lit("1998-04-01"))
        .join(t(s, d, "lineitem").filter(col("l_returnflag") === "R"),
          col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"), col("c_acctbal"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20),
      Some("""SELECT c_custkey, c_name, n_name, c_acctbal,
             |round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
             |FROM orders
             |JOIN lineitem ON o_orderkey = l_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |WHERE o_orderdate >= TIMESTAMP '1998-01-01'
             |  AND o_orderdate < TIMESTAMP '1998-04-01'
             |  AND l_returnflag = 'R'
             |GROUP BY 1, 2, 3, 4 ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)),

    // TPC-H Q14 shape: conditional-revenue ratio (promo share) over one
    // month. part is broadcast; the ratio is one global aggregate.
    QDef("q106_promo_revenue",
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-06-01") &&
          col("l_shipdate") < lit("1997-07-01"))
        .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
        .agg(round(
          sum(when(col("p_type") === "PROMO",
            col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(0.0))
            * 100.0 /
            sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 6)
          .as("promo_pct")),
      Some("""SELECT round(
             |  sum(CASE WHEN p_type = 'PROMO'
             |      THEN l_extendedprice * (1 - l_discount) ELSE 0 END) * 100.0 /
             |  sum(l_extendedprice * (1 - l_discount)), 6) AS promo_pct
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE l_shipdate >= TIMESTAMP '1997-06-01'
             |  AND l_shipdate < TIMESTAMP '1997-07-01'""".stripMargin)),

    // TPC-H Q18 shape: large-volume orders (HAVING over a fact aggregate,
    // then re-join the fact). The quantity aggregate is a map-side-combined
    // shuffle on l_orderkey; the HAVING survivor set is tiny and broadcasts
    // back against orders/customer.
    QDef("q107_tpch_q18",
      (s, d) => {
        val big = t(s, d, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(sum(col("l_quantity")).as("sum_qty"))
          .filter(col("sum_qty") > 250)
        t(s, d, "orders")
          .join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_orderdate"), col("o_totalprice"),
            round(col("sum_qty"), 2).as("sum_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      },
      Some("""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
             |round(sum_qty, 2) AS sum_qty
             |FROM (SELECT l_orderkey, sum(l_quantity) AS sum_qty
             |      FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 250) big
             |JOIN orders ON o_orderkey = big.l_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin)),

    // TPC-H Q19 shape: disjunctive multi-attribute predicates (brand ×
    // size-range × quantity-range OR-arms). The whole disjunction stays
    // inside one codegen'd filter after a broadcast join — no union of
    // three scans.
    QDef("q108_tpch_q19",
      (s, d) => t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 35) &&
            col("l_quantity").between(20, 30)))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"),
          count(lit(1)).cast("long").as("n")),
      Some("""SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             |count(*) AS n
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
             |       AND l_quantity BETWEEN 1 AND 11)
             |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
             |       AND l_quantity BETWEEN 10 AND 20)
             |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
             |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin)),

    // TPC-H Q22 shape: scalar-subquery threshold + anti join. The global
    // average is one tiny aggregate (crossJoin-broadcast), the anti side is
    // the recent-orders key set.
    QDef("q109_tpch_q22",
      (s, d) => {
        val c = t(s, d, "customer")
        val avgBal = c.filter(col("c_acctbal") > 0)
          .agg(avg(col("c_acctbal")).as("avg_bal"))
        val recent = t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("2000-01-01"))
          .select(col("o_custkey"))
        c.crossJoin(broadcast(avgBal))
          .filter(col("c_acctbal") > col("avg_bal"))
          .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).cast("long").as("n_cust"),
            round(sum(col("c_acctbal")), 2).as("sum_bal"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment, count(*) AS n_cust,
             |round(sum(c_acctbal), 2) AS sum_bal
             |FROM customer
             |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
             |  AND NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey
             |                    AND o_orderdate >= TIMESTAMP '2000-01-01')
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // TPC-H Q7 shape: bi-national trade volume by year. Both nation dims
    // broadcast under different aliases; the fact-fact join shuffles once
    // on the order key.
    QDef("q110_tpch_q7",
      (s, d) => {
        val n1 = t(s, d, "nation")
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
        val n2 = t(s, d, "nation")
          .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
        t(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01") &&
            col("l_shipdate") < lit("1998-01-01"))
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
          .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
          .filter((col("supp_nation") === "FRANCE" && col("cust_nation") === "GERMANY") ||
            (col("supp_nation") === "GERMANY" && col("cust_nation") === "FRANCE"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).cast("long").as("l_year"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"))
          .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      },
      Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             |year(l_shipdate) AS l_year,
             |round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation n1 ON s_nationkey = n1.n_nationkey
             |JOIN nation n2 ON c_nationkey = n2.n_nationkey
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |  AND l_shipdate < TIMESTAMP '1998-01-01'
             |  AND ((n1.n_name = 'FRANCE' AND n2.n_name = 'GERMANY')
             |    OR (n1.n_name = 'GERMANY' AND n2.n_name = 'FRANCE'))
             |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),

    // TPC-H Q21 shape (adapted to available columns): suppliers that are
    // the SOLE 'R'-flag supplier in multi-supplier orders. Instead of the
    // textbook double EXISTS (two correlated fact probes), both conditions
    // come from ONE per-order aggregate pass — same result, one shuffle.
    QDef("q111_sole_fault_supplier",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val perOrder = li.groupBy(col("l_orderkey"))
          .agg(countDistinct(col("l_suppkey")).as("n_supp"),
            countDistinct(when(col("l_returnflag") === "R", col("l_suppkey")))
              .as("n_r_supp"))
          .filter(col("n_supp") >= 2 && col("n_r_supp") === 1)
        li.filter(col("l_returnflag") === "R")
          .join(perOrder, Seq("l_orderkey"))
          .select(col("l_orderkey"), col("l_suppkey")).distinct()
          .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_name"))
          .agg(count(lit(1)).cast("long").as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(20)
      },
      Some("""SELECT s_name, count(*) AS numwait FROM (
             |  SELECT DISTINCT l.l_orderkey, l.l_suppkey
             |  FROM lineitem l
             |  JOIN (SELECT l_orderkey,
             |          count(DISTINCT l_suppkey) AS n_supp,
             |          count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_r_supp
             |        FROM lineitem GROUP BY 1) po
             |    ON l.l_orderkey = po.l_orderkey
             |  WHERE l.l_returnflag = 'R' AND po.n_supp >= 2 AND po.n_r_supp = 1)
             |JOIN supplier ON l_suppkey = s_suppkey
             |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin)),

    // TPC-H Q15 shape: top supplier(s) by windowed revenue — the max is a
    // window over the (tiny) per-supplier aggregate, not a second scan.
    QDef("q112_top_supplier",
      (s, d) => {
        val rev = t(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01") &&
            col("l_shipdate") < lit("1997-04-01"))
          .groupBy(col("l_suppkey"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("total_revenue"))
        rev.withColumn("max_rev",
            max(col("total_revenue")).over(Window.partitionBy()))
          .filter(col("total_revenue") === col("max_rev"))
          .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
          .orderBy(col("s_suppkey"))
      },
      Some("""WITH rev AS (
             |  SELECT l_suppkey,
             |    round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
             |  FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             |    AND l_shipdate < TIMESTAMP '1997-04-01'
             |  GROUP BY 1)
             |SELECT s_suppkey, s_name, total_revenue
             |FROM rev JOIN supplier ON l_suppkey = s_suppkey
             |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
             |ORDER BY s_suppkey""".stripMargin)),

    // 2-D skyline (Pareto frontier): parts not dominated on (size ↑,
    // price ↓). Naive form is the O(n²) NOT-EXISTS self-join the oracle
    // runs; the engine reduces to a per-size min (tiny) + one running min
    // over the size domain, then a broadcast join back — O(n) + O(|sizes|),
    // no self-join at any scale.
    QDef("q115_skyline",
      (s, d) => {
        val parts = t(s, d, "part")
        val perSize = parts.groupBy(col("p_size"))
          .agg(min(col("p_retailprice")).as("size_min"))
        // strictly-greater-size running min: order sizes desc, frame
        // excludes the current row
        val w = Window.partitionBy().orderBy(col("p_size").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val frontier = perSize
          .withColumn("gt_min", min(col("size_min")).over(w))
        parts.join(broadcast(frontier), Seq("p_size"))
          .filter(col("p_retailprice") === col("size_min") &&
            (col("gt_min").isNull || col("p_retailprice") < col("gt_min")))
          .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
          .orderBy(col("p_size"), col("p_partkey"))
      },
      Some("""SELECT p_partkey, p_size, p_retailprice FROM part p
             |WHERE NOT EXISTS (
             |  SELECT 1 FROM part q
             |  WHERE q.p_size >= p.p_size AND q.p_retailprice <= p.p_retailprice
             |    AND (q.p_size > p.p_size OR q.p_retailprice < p.p_retailprice))
             |ORDER BY p_size, p_partkey""".stripMargin)),

    // Key-skew audit: the shuffle-planning report (top-key share + Gini of
    // the per-key load) you run BEFORE picking salting/AQE settings on a
    // new key. The window runs over the per-key count table (≪ events);
    // for billions of keys, q136 bins the Lorenz curve instead (the scale
    // path); this exact form is its accuracy baseline.
    QDef("q119_skew_audit",
      (s, d) => {
        val cnt = t(s, d, "events").groupBy(col("user_id"))
          .agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy().orderBy(col("cnt"), col("user_id"))
        cnt.withColumn("rn", row_number().over(w))
          .agg(count(lit(1)).cast("long").as("n_keys"),
            sum(col("cnt")).cast("long").as("n_events"),
            max(col("cnt")).cast("long").as("max_cnt"),
            floor(max(col("cnt")) * 1000000.0 / sum(col("cnt")) + 0.5)
              .cast("long").as("top_share_x1e6"),
            floor((lit(2.0) * sum(col("rn") * col("cnt"))
                / (count(lit(1)) * sum(col("cnt")))
              - (count(lit(1)) + lit(1.0)) / count(lit(1))) * 1000000.0 + 0.5)
              .cast("long").as("gini_x1e6"))
      },
      Some("""WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
             |r AS (SELECT cnt, row_number() OVER (ORDER BY cnt, user_id) AS rn FROM c)
             |SELECT CAST(count(*) AS BIGINT) AS n_keys,
             |CAST(sum(cnt) AS BIGINT) AS n_events,
             |CAST(max(cnt) AS BIGINT) AS max_cnt,
             |CAST(floor(max(cnt) * 1000000.0 / sum(cnt) + 0.5) AS BIGINT) AS top_share_x1e6,
             |CAST(floor((2.0 * sum(rn * cnt) / (count(*) * sum(cnt))
             |  - (count(*) + 1.0) / count(*)) * 1000000.0 + 0.5) AS BIGINT) AS gini_x1e6
             |FROM r""".stripMargin)),

    // Chi-square independence test (source × lang contingency): the
    // "is this categorical pair actually correlated" check behind
    // composition dashboards. One groupBy for cells; marginals come from
    // windows over the (tiny) cell table, never a second scan.
    QDef("q124_chi2_independence",
      (s, d) => {
        val cells = t(s, d, "documents")
          .groupBy(col("source"), col("lang"))
          .agg(count(lit(1)).cast("double").as("o"))
        val w = Window.partitionBy()
        val wr = Window.partitionBy(col("source"))
        val wc = Window.partitionBy(col("lang"))
        cells
          .withColumn("rt", sum(col("o")).over(wr))
          .withColumn("ct", sum(col("o")).over(wc))
          .withColumn("tot", sum(col("o")).over(w))
          .withColumn("e", col("rt") * col("ct") / col("tot"))
          .agg(
            floor(sum(pow(col("o") - col("e"), 2) / col("e")) * 10000 + 0.5)
              .cast("long").as("chi2_x1e4"),
            ((countDistinct(col("source")) - 1) *
              (countDistinct(col("lang")) - 1)).cast("long").as("dof"),
            sum(col("o")).cast("long").as("n_docs"))
      },
      Some("""WITH cells AS (SELECT source, lang, CAST(count(*) AS DOUBLE) AS o
             |  FROM documents GROUP BY 1, 2),
             |m AS (SELECT *, sum(o) OVER (PARTITION BY source) AS rt,
             |  sum(o) OVER (PARTITION BY lang) AS ct, sum(o) OVER () AS tot
             |  FROM cells)
             |SELECT CAST(floor(sum(pow(o - rt * ct / tot, 2) / (rt * ct / tot)) * 10000 + 0.5) AS BIGINT) AS chi2_x1e4,
             |CAST((count(DISTINCT source) - 1) * (count(DISTINCT lang) - 1) AS BIGINT) AS dof,
             |CAST(sum(o) AS BIGINT) AS n_docs
             |FROM m""".stripMargin)),

    // Wide→long unpivot (melt) — the inverse of the q31/q37 pivots, via
    // the native `Dataset.unpivot` (plans as a single Expand, one pass).
    QDef("q126_unpivot_metrics",
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(round(sum(col("l_quantity")), 2).as("m_qty"),
          round(sum(col("l_extendedprice")), 2).as("m_price"),
          round(sum(col("l_tax")), 2).as("m_tax"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("m_qty"), col("m_price"), col("m_tax")),
          "metric", "value")
        .orderBy(col("l_returnflag"), col("metric")),
      Some("""WITH wide AS (SELECT l_returnflag,
             |  round(sum(l_quantity), 2) AS m_qty,
             |  round(sum(l_extendedprice), 2) AS m_price,
             |  round(sum(l_tax), 2) AS m_tax
             |  FROM lineitem GROUP BY 1)
             |SELECT l_returnflag, metric, value
             |FROM (UNPIVOT wide ON m_qty, m_price, m_tax
             |      INTO NAME metric VALUE value)
             |ORDER BY l_returnflag, metric""".stripMargin)),

    // TPC-H Q13 shape: customer order-count distribution — LEFT OUTER join
    // (zero-order customers must appear at c_count=0) into a histogram of
    // counts. Two shuffles: the outer join keyed on custkey, then the tiny
    // count-of-counts aggregate.
    QDef("q132_tpch_q13",
      (s, d) => {
        val counts = t(s, d, "customer")
          .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
        counts.groupBy(col("c_count").cast("long").as("c_count"))
          .agg(count(lit(1)).cast("long").as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""SELECT c_count, count(*) AS custdist FROM (
             |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
             |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |  GROUP BY 1)
             |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin)),

    // TPC-H Q8 shape: national market share — NATION_9's share of PROMO-part
    // volume sold into ASIA, per order year. Dimension chain (part filter,
    // supplier, customer, both nation legs, region) broadcasts; the only
    // large-large join is orders ⋈ lineitem (AQE-planned).
    QDef("q133_tpch_q8",
      (s, d) => {
        val n = t(s, d, "nation")
        val asiaNations = n
          .join(broadcast(t(s, d, "region").filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey").as("cust_nk"))
        val vol = t(s, d, "lineitem")
          .join(broadcast(t(s, d, "part").filter(col("p_type") === "PROMO")
            .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, d, "customer")
            .select(col("c_custkey"), col("c_nationkey"))),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(asiaNations), col("c_nationkey") === col("cust_nk"))
          .join(broadcast(t(s, d, "supplier")
            .select(col("s_suppkey"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n.select(col("n_nationkey").as("supp_nk"),
            col("n_name").as("supp_nation"))),
            col("s_nationkey") === col("supp_nk"))
          .select(year(col("o_orderdate")).cast("long").as("o_year"),
            (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("volume"),
            col("supp_nation"))
        vol.groupBy(col("o_year"))
          .agg(round(
            sum(when(col("supp_nation") === "NATION_9", col("volume"))
              .otherwise(lit(0.0))) / sum(col("volume")), 6).as("mkt_share"))
          .orderBy(col("o_year"))
      },
      Some("""WITH vol AS (
             |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             |    l_extendedprice * (1 - l_discount) AS volume,
             |    n2.n_name AS supp_nation
             |  FROM lineitem
             |  JOIN part ON p_partkey = l_partkey AND p_type = 'PROMO'
             |  JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
             |  JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN nation n2 ON s_nationkey = n2.n_nationkey)
             |SELECT o_year,
             |round(sum(CASE WHEN supp_nation = 'NATION_9' THEN volume ELSE 0 END)
             |      / sum(volume), 6) AS mkt_share
             |FROM vol GROUP BY 1 ORDER BY 1""".stripMargin)),

    // TPC-H Q17 shape: small-quantity-order revenue — the per-part average
    // is a correlated scalar in the spec; here it is ONE aggregate over the
    // brand's lineitems (semi-joined first, so the avg table is brand-sized)
    // broadcast back onto the probe. l_quantity is integral, so the
    // 0.2×avg boundary is bit-identical across engines.
    QDef("q134_tpch_q17",
      (s, d) => {
        val brandParts = t(s, d, "part")
          .filter(col("p_brand") === "Brand#23").select(col("p_partkey"))
        val li = t(s, d, "lineitem")
          .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
        val avgQ = li.groupBy(col("l_partkey").as("avg_pk"))
          .agg(avg(col("l_quantity")).as("avg_q"))
        li.join(broadcast(avgQ), col("l_partkey") === col("avg_pk"))
          .filter(col("l_quantity") < lit(0.2) * col("avg_q"))
          .agg(round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"),
            count(lit(1)).cast("long").as("n_small"))
      },
      Some("""WITH li AS (SELECT l_partkey, l_quantity, l_extendedprice
             |  FROM lineitem JOIN part ON l_partkey = p_partkey
             |  WHERE p_brand = 'Brand#23'),
             |a AS (SELECT l_partkey, avg(l_quantity) AS avg_q FROM li GROUP BY 1)
             |SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
             |count(*) AS n_small
             |FROM li JOIN a USING (l_partkey)
             |WHERE l_quantity < 0.2 * avg_q""".stripMargin)),

    // q119's 100 TB path, implemented: the exact-rank Gini needs a global
    // row_number over ALL per-key counts (key-count-sized window — fine at
    // bench scale, fatal at billions of keys). Here the Lorenz curve is
    // BINNED: counts bucket into 64 fixed-width bins (bin index monotone
    // in count), the grouped-data Gini runs over ≤64 rows, and every
    // window in the plan is bin-sized. The binning is deterministic, so
    // the oracle replicates it exactly; closeness to q119's exact Gini is
    // pinned in RelationalQueriesSpec.
    QDef("q136_skew_audit_binned",
      (s, d) => {
        val bins = 64
        val cnt = t(s, d, "events").groupBy(col("user_id"))
          .agg(count(lit(1)).cast("double").as("cnt"))
        val mx = cnt.agg(max(col("cnt")).as("mx"))
        val binned = cnt.crossJoin(broadcast(mx))
          .withColumn("bin", least(lit(bins - 1L),
            floor(col("cnt") * bins / (col("mx") + 1)).cast("long")))
          .groupBy(col("bin"))
          .agg(count(lit(1)).cast("double").as("k_b"), sum(col("cnt")).as("m_b"))
        val tot = Window.partitionBy()
        val cum = Window.orderBy(col("bin"))
          .rowsBetween(Window.unboundedPreceding, -1)
        binned
          .withColumn("p", col("k_b") / sum(col("k_b")).over(tot))
          .withColumn("l", col("m_b") / sum(col("m_b")).over(tot))
          .withColumn("lprev", coalesce(sum(col("l")).over(cum), lit(0.0)))
          .agg(count(lit(1)).cast("long").as("n_bins_used"),
            sum(col("k_b")).cast("long").as("n_keys"),
            sum(col("m_b")).cast("long").as("n_events"),
            floor((lit(1.0) -
              sum(col("p") * (lit(2.0) * col("lprev") + col("l"))))
              * 1000000.0 + 0.5).cast("long").as("gini_x1e6"))
      },
      Some("""WITH c AS (SELECT user_id, CAST(count(*) AS DOUBLE) AS cnt
             |          FROM events GROUP BY 1),
             |mx AS (SELECT max(cnt) AS mx FROM c),
             |b AS (SELECT least(63, CAST(floor(cnt * 64 / (mx + 1)) AS BIGINT)) AS bin,
             |        CAST(count(*) AS DOUBLE) AS k_b, sum(cnt) AS m_b
             |      FROM c, mx GROUP BY 1),
             |s AS (SELECT *, k_b / sum(k_b) OVER () AS p,
             |        m_b / sum(m_b) OVER () AS l FROM b),
             |s2 AS (SELECT *, coalesce(sum(l) OVER (ORDER BY bin
             |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lprev
             |       FROM s)
             |SELECT CAST(count(*) AS BIGINT) AS n_bins_used,
             |CAST(sum(k_b) AS BIGINT) AS n_keys,
             |CAST(sum(m_b) AS BIGINT) AS n_events,
             |CAST(floor((1.0 - sum(p * (2.0 * lprev + l))) * 1000000.0 + 0.5) AS BIGINT) AS gini_x1e6
             |FROM s2""".stripMargin)),

    // Bloom-pruned semi join: the sketch prunes the big side BEFORE its
    // shuffle; the exact semi join on survivors removes false positives,
    // so the result is provably identical to the plain semi join — which
    // is exactly what the oracle runs.
    QDef("q152_bloom_prune",
      (s, d) => Relational.bloomPrunedSemiJoin(
          t(s, d, "customer"), "c_custkey", t(s, d, "orders"), "o_custkey")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).cast("long").as("n_customers"),
          round(sum(col("c_acctbal")), 2).as("total_acctbal"))
        .orderBy(col("c_mktsegment")),
      Some("""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
             |  round(sum(c_acctbal), 2) AS total_acctbal
             |FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Blocked fuzzy record linkage over part names, run on the
    // DISTINCT-NAME DICTIONARY with row multiplicities — the scale-honest
    // form: values repeat massively (64 distinct names over the whole
    // table here), so pair generation over raw rows is quadratic in the
    // repetition while the dictionary is vocabulary-sized. Block on the
    // first name token, verify with banded Levenshtein; dist ≥ 1 keeps
    // the fuzzy matches only (exact duplicates are q26's job).
    QDef("q153_fuzzy_blocked_pairs",
      (s, d) => {
        val dict = t(s, d, "part").groupBy(col("p_name"))
          .agg(count(lit(1)).cast("long").as("n"))
        DedupOps.blockedFuzzyPairs(dict, "p_name", "p_name",
            split(col("p_name"), " ").getItem(0), maxDist = 3)
          .filter(col("dist") >= 1)
          .select(col("id_a").as("name_a"), col("id_b").as("name_b"), col("dist"))
          .join(dict.select(col("p_name").as("name_a"), col("n").as("n_a")), Seq("name_a"))
          .join(dict.select(col("p_name").as("name_b"), col("n").as("n_b")), Seq("name_b"))
          .select(col("name_a"), col("name_b"), col("n_a"), col("n_b"), col("dist"))
          .orderBy(col("name_a"), col("name_b"))
      },
      Some("""WITH d AS (SELECT p_name, CAST(count(*) AS BIGINT) AS n
             |           FROM part GROUP BY 1)
             |SELECT a.p_name AS name_a, b.p_name AS name_b, a.n AS n_a, b.n AS n_b,
             |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
             |FROM d a JOIN d b
             |  ON split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
             | AND a.p_name < b.p_name
             |WHERE abs(length(a.p_name) - length(b.p_name)) <= 3
             |  AND levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 3
             |ORDER BY name_a, name_b""".stripMargin)),

    // k-anonymity audit over a quasi-identifier generalization ladder:
    // for each QI level (full (nation, segment), then each single-column
    // generalization) report the worst-case k (smallest equivalence
    // class), class count, and the row fraction in classes below k=10 —
    // the release-risk numbers a privacy review asks for before training
    // data leaves the curation boundary. One grouping-sets shuffle
    // produces every level's class sizes; the per-level rollup is
    // level-count-sized (tiny).
    QDef("q156_kanonymity",
      (s, d) => t(s, d, "customer")
        .groupingSets(
          Seq(Seq(col("c_nationkey"), col("c_mktsegment")),
            Seq(col("c_nationkey")), Seq(col("c_mktsegment"))),
          col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).cast("long").as("k"))
        .select(
          when(col("c_nationkey").isNotNull && col("c_mktsegment").isNotNull,
              "nation+segment")
            .when(col("c_nationkey").isNotNull, "nation")
            .otherwise("segment").as("qi_level"),
          col("k"))
        .groupBy(col("qi_level"))
        .agg(count(lit(1)).cast("long").as("n_classes"),
          min(col("k")).as("min_k"),
          sum(when(col("k") < 10, col("k")).otherwise(0L)).cast("long")
            .as("rows_below_k10"),
          round(sum(when(col("k") < 10, col("k")).otherwise(0L))
            .cast("double") / sum(col("k")), 6).as("frac_below_k10"))
        .orderBy(col("qi_level")),
      Some("""WITH cls AS (
             |  SELECT CASE WHEN c_nationkey IS NOT NULL AND c_mktsegment IS NOT NULL
             |              THEN 'nation+segment'
             |              WHEN c_nationkey IS NOT NULL THEN 'nation'
             |              ELSE 'segment' END AS qi_level,
             |         CAST(count(*) AS BIGINT) AS k
             |  FROM customer
             |  GROUP BY GROUPING SETS ((c_nationkey, c_mktsegment),
             |                          (c_nationkey), (c_mktsegment)))
             |SELECT qi_level, count(*) AS n_classes, min(k) AS min_k,
             |  CAST(sum(CASE WHEN k < 10 THEN k ELSE 0 END) AS BIGINT)
             |    AS rows_below_k10,
             |  round(sum(CASE WHEN k < 10 THEN k ELSE 0 END)
             |    / CAST(sum(k) AS DOUBLE), 6) AS frac_below_k10
             |FROM cls GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- Round 5: the remaining TPC-H query shapes, adapted to the
    // driver schema (no partsupp table, no commit/receipt dates): the
    // lineitem (l_partkey, l_suppkey) pairs stand in for partsupp, with
    // min unit price as the supply-cost proxy. What each adaptation
    // preserves is the PLAN SHAPE the original exercises.

    // TPC-H Q2 shape: min-cost supplier per part within a region —
    // correlated-min subquery decorrelated to a per-part window. One
    // shuffle by part; region/nation dims broadcast; the window min
    // replaces TPC-H's correlated scalar subquery (Catalyst would
    // otherwise rewrite it to the same aggregate+join).
    QDef("q169_tpch_q2",
      (s, d) => {
        val sc = t(s, d, "lineitem")
          .groupBy(col("l_partkey").as("partkey"), col("l_suppkey").as("suppkey"))
          .agg(min(col("l_extendedprice") / col("l_quantity")).as("cost"))
        val asia = t(s, d, "supplier")
          .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, d, "region").filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
        val w = Window.partitionBy(col("partkey"))
        sc.join(asia, col("suppkey") === col("s_suppkey"))
          .withColumn("mincost", min(col("cost")).over(w))
          .filter(col("cost") === col("mincost"))
          .join(t(s, d, "part").filter(col("p_size") <= 10),
            col("partkey") === col("p_partkey"))
          .select(col("s_suppkey"), col("s_name"), col("n_name"),
            col("p_partkey"), col("p_name"), col("s_acctbal"),
            round(col("cost"), 6).as("cost"))
          .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
            col("p_partkey"), col("s_suppkey"))
          .limit(100)
      },
      Some("""WITH sc AS (SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             |              min(l_extendedprice / l_quantity) AS cost
             |            FROM lineitem GROUP BY 1, 2),
             |asia AS (SELECT s_suppkey, s_name, s_acctbal, n_name
             |         FROM supplier JOIN nation ON s_nationkey = n_nationkey
             |         JOIN region ON n_regionkey = r_regionkey
             |         WHERE r_name = 'ASIA'),
             |ia AS (SELECT sc.partkey, sc.cost, asia.s_suppkey, asia.s_name,
             |              asia.s_acctbal, asia.n_name
             |       FROM sc JOIN asia ON sc.suppkey = asia.s_suppkey),
             |m AS (SELECT partkey, min(cost) AS mincost FROM ia GROUP BY 1)
             |SELECT ia.s_suppkey, ia.s_name, ia.n_name, p.p_partkey, p.p_name,
             |       ia.s_acctbal, round(ia.cost, 6) AS cost
             |FROM ia JOIN m ON ia.partkey = m.partkey AND ia.cost = m.mincost
             |JOIN part p ON p.p_partkey = ia.partkey
             |WHERE p.p_size <= 10
             |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, s_suppkey
             |LIMIT 100""".stripMargin)),

    // TPC-H Q9 shape: profit by (nation, ship year) over a name-filtered
    // part slice — the 4-way join + two-key rollup; supply cost proxied by
    // 10% of retail price. Part/supplier joins shuffle on their keys,
    // nation broadcasts, the rollup key space is nations × years (tiny).
    QDef("q170_tpch_q9",
      (s, d) => t(s, d, "lineitem")
        .join(t(s, d, "part").filter(col("p_name").contains("red")),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), year(col("l_shipdate")).as("o_year"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
          - col("p_retailprice") * col("l_quantity") * lit(0.1)), 2).as("profit"))
        .orderBy(col("nation"), col("o_year").desc),
      Some("""SELECT n_name AS nation, CAST(year(l_shipdate) AS INTEGER) AS o_year,
             |  round(sum(l_extendedprice * (1 - l_discount)
             |    - p_retailprice * l_quantity * 0.1), 2) AS profit
             |FROM lineitem
             |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin)),

    // TPC-H Q11 shape: per-part inventory value within one nation, kept
    // only when above a fraction of the nation's total — the
    // global-scalar-subquery group filter. The total is a 1-row broadcast;
    // the 0.001 cutoff sits far from FP summation noise for non-adversarial
    // price data (both engines round group values to 2dp).
    QDef("q171_tpch_q11",
      (s, d) => {
        val v = t(s, d, "lineitem")
          .join(t(s, d, "supplier").filter(col("s_nationkey") === 3),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("l_partkey").as("partkey"))
          .agg(sum(col("l_extendedprice") * col("l_quantity")).as("value"))
        v.crossJoin(broadcast(v.agg(sum(col("value")).as("tot"))))
          .filter(col("value") > col("tot") * 0.001)
          .select(col("partkey"), round(col("value"), 2).as("value"))
          .orderBy(col("value").desc, col("partkey"))
      },
      Some("""WITH v AS (SELECT l_partkey AS partkey,
             |             sum(l_extendedprice * l_quantity) AS value
             |           FROM lineitem
             |           JOIN supplier ON l_suppkey = s_suppkey
             |           WHERE s_nationkey = 3
             |           GROUP BY 1)
             |SELECT partkey, round(value, 2) AS value FROM v
             |WHERE value > (SELECT sum(value) * 0.001 FROM v)
             |ORDER BY value DESC, partkey""".stripMargin)),

    // TPC-H Q16 shape: distinct-supplier counts per part attribute,
    // excluding flagged suppliers — NOT IN over a non-null key is the
    // broadcast anti-join (negative account balance stands in for the
    // complaint-comment filter).
    QDef("q172_tpch_q16",
      (s, d) => t(s, d, "lineitem")
        .join(broadcast(t(s, d, "supplier").filter(col("s_acctbal") < 0)
            .select(col("s_suppkey"))),
          col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(t(s, d, "part").filter(col("p_brand") =!= "Brand#1"
            && col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).cast("long").as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size")),
      Some("""SELECT p_brand, p_type, p_size,
             |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
             |FROM lineitem
             |JOIN part ON l_partkey = p_partkey
             |WHERE p_brand <> 'Brand#1'
             |  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
             |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
             |                        WHERE s_acctbal < 0)
             |GROUP BY 1, 2, 3
             |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)),

    // TPC-H Q20 shape: suppliers holding a dominant share (>15% — shares
    // dilute as SF grows more suppliers per part; 15% yields rows at every
    // verified SF) of some part's shipped quantity — nested aggregate +
    // semi-join chain. The share test runs as q*100 > tq*15: quantities
    // are integer-valued, so the scaled comparison is EXACT in both
    // engines (0.15*tq would put ties on an FP boundary).
    QDef("q173_tpch_q20",
      (s, d) => {
        val pq = t(s, d, "lineitem")
          .groupBy(col("l_partkey").as("partkey"), col("l_suppkey").as("suppkey"))
          .agg(sum(col("l_quantity")).as("q"))
        val dominant = pq
          .withColumn("tq", sum(col("q")).over(Window.partitionBy(col("partkey"))))
          .filter(col("q") * 100 > col("tq") * 15)
          .select(col("suppkey")).distinct()
        t(s, d, "supplier")
          .join(dominant, col("s_suppkey") === col("suppkey"), "left_semi")
          .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"), col("n_name"))
          .orderBy(col("s_suppkey"))
      },
      Some("""WITH pq AS (SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             |              sum(l_quantity) AS q
             |            FROM lineitem GROUP BY 1, 2),
             |tot AS (SELECT partkey, sum(q) AS tq FROM pq GROUP BY 1),
             |dom AS (SELECT DISTINCT suppkey FROM pq
             |        JOIN tot USING (partkey) WHERE q * 100 > tq * 15)
             |SELECT s_suppkey, s_name, n_name
             |FROM supplier JOIN dom ON s_suppkey = dom.suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |ORDER BY s_suppkey""".stripMargin)),

    // Z-order (Morton) layout stats over the (partkey, suppkey) plane:
    // per-slice row count + min/max of BOTH keys — the footer-stats table
    // a 100 TB layout decision reads (a z-sorted file covers a bounded
    // rectangle stack, so selective predicates on EITHER key skip most
    // files; LayoutSpec asserts the pruning win). Slicing is value-based
    // (equal z-width), never a global-order ntile — no single-partition
    // stage; the one scalar (max z) is a 1-row broadcast. The oracle
    // recomputes the 16-bit interleave from the SAME generated SQL
    // fragment the engine uses.
    QDef("q174_zorder_stats",
      (s, d) => Layout.zSliceStats(
        t(s, d, "lineitem"), "l_partkey", "l_suppkey", nSlices = 64),
      Some(s"""WITH z AS (SELECT l_partkey, l_suppkey,
             |  ${Layout.zValueSql("l_partkey", "l_suppkey")} AS zv
             |  FROM lineitem),
             |m AS (SELECT max(zv) AS zmax FROM z)
             |SELECT CAST(floor(zv * 64 / (zmax + 1)) AS BIGINT) AS slice,
             |  CAST(count(*) AS BIGINT) AS n,
             |  min(l_partkey) AS min_l_partkey,
             |  max(l_partkey) AS max_l_partkey,
             |  min(l_suppkey) AS min_l_suppkey,
             |  max(l_suppkey) AS max_l_suppkey
             |FROM z, m GROUP BY 1 ORDER BY slice""".stripMargin)),

    // AQP estimate audit: exact group sums next to the Horvitz-Thompson
    // estimate a deterministic 10% md5-hash sample yields, with relative
    // error — the evidence table a sampled-serving layer quotes. The
    // oracle reproduces sample membership row-for-row via
    // md5_number_lower's low 16 bits.
    QDef("q180_sample_estimate",
      (s, d) => Profiling.hashSampleEstimate(t(s, d, "lineitem"),
          concat_ws("-", col("l_orderkey"), col("l_linenumber")),
          "l_returnflag", "l_quantity", permille = 100)
        .orderBy(col("l_returnflag")),
      Some("""WITH l AS (SELECT l_returnflag, l_quantity,
             |  (md5_number_lower(l_orderkey::VARCHAR || '-' || l_linenumber::VARCHAR)
             |   % 65536) % 1000 < 100 AS inn
             |  FROM lineitem)
             |SELECT l_returnflag,
             |  CAST(count(*) AS BIGINT) AS n_exact,
             |  round(sum(l_quantity), 2) AS sum_exact,
             |  CAST(sum(CASE WHEN inn THEN 1 ELSE 0 END) AS BIGINT) AS n_sample,
             |  round(sum(CASE WHEN inn THEN l_quantity ELSE 0 END) * 10.0, 2) AS est_sum,
             |  round(abs(round(sum(CASE WHEN inn THEN l_quantity ELSE 0 END) * 10.0, 2)
             |            - round(sum(l_quantity), 2))
             |        / round(sum(l_quantity), 2), 6) AS rel_err
             |FROM l GROUP BY 1 ORDER BY 1""".stripMargin)),

    // l-diversity audit (Machanavajjhala et al. 2007), completing q156's
    // privacy ladder: k-anonymity bounds re-identification, but a class
    // where every member shares one sensitive value still leaks it —
    // distinct-l per equivalence class is the guard. Same one-shuffle
    // grouping-sets spine as q156; the sensitive attribute here is the
    // market segment, the QI ladder nation → nation+balance-band.
    QDef("q181_ldiversity",
      (s, d) => t(s, d, "customer")
        .withColumn("balband", floor(col("c_acctbal") / 2000).cast("long"))
        .groupingSets(
          Seq(Seq(col("c_nationkey")), Seq(col("c_nationkey"), col("balband"))),
          col("c_nationkey"), col("balband"))
        .agg(countDistinct(col("c_mktsegment")).cast("long").as("l"),
          count(lit(1)).cast("long").as("k"))
        .select(
          when(col("balband").isNotNull, "nation+balband")
            .otherwise("nation").as("qi_level"),
          col("l"), col("k"))
        .groupBy(col("qi_level"))
        .agg(count(lit(1)).cast("long").as("n_classes"),
          min(col("l")).as("min_l"),
          sum(when(col("l") < 3, 1L).otherwise(0L)).cast("long")
            .as("classes_below_l3"),
          sum(when(col("l") < 3, col("k")).otherwise(0L)).cast("long")
            .as("rows_below_l3"),
          round(sum(when(col("l") < 3, col("k")).otherwise(0L))
            .cast("double") / sum(col("k")), 6).as("frac_below_l3"))
        .orderBy(col("qi_level")),
      Some("""WITH c2 AS (SELECT c_nationkey, c_mktsegment,
             |              CAST(floor(c_acctbal / 2000) AS BIGINT) AS balband
             |            FROM customer),
             |cls AS (
             |  SELECT CASE WHEN balband IS NOT NULL THEN 'nation+balband'
             |              ELSE 'nation' END AS qi_level,
             |         CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS l,
             |         CAST(count(*) AS BIGINT) AS k
             |  FROM c2
             |  GROUP BY GROUPING SETS ((c_nationkey), (c_nationkey, balband)))
             |SELECT qi_level, count(*) AS n_classes, min(l) AS min_l,
             |  CAST(sum(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS classes_below_l3,
             |  CAST(sum(CASE WHEN l < 3 THEN k ELSE 0 END) AS BIGINT)
             |    AS rows_below_l3,
             |  round(sum(CASE WHEN l < 3 THEN k ELSE 0 END)
             |    / CAST(sum(k) AS DOUBLE), 6) AS frac_below_l3
             |FROM cls GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
