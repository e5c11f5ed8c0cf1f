package graft.queries

import graft.{QDef, Tables}
import graft.operators.{Sessionization, Temporal}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Event-time windowing surface over the `events` table: running
  * aggregates, gap sessionization, tumbling/sliding windows, pivoted
  * hour×type counts, JSON prop extraction, volume-anomaly scoring.
  */
object WindowQueries {

  private def ev(s: SparkSession, d: String) = Tables(s, d, "events")

  val defs: Seq[QDef] = Seq(

    // Running aggregates per user (row_number / running sum / lag).
    QDef("q27_running_agg",
      (s, d) => Sessionization.runningAgg(ev(s, d), "user_id", "ts",
          "event_id", "value")
        .orderBy(col("user_id"), col("rn")),
      Some("""SELECT user_id, ts, event_id, value,
             |row_number() OVER w AS rn,
             |round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_sum,
             |lag(value, 1) OVER w AS prev_value
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |ORDER BY user_id, rn""".stripMargin)),

    // Gap-based sessionization (30-minute inactivity gap).
    QDef("q28_sessionize",
      (s, d) => Sessionization.sessionize(ev(s, d), "user_id", "ts",
          "event_id", "value", gapSeconds = 1800)
        .orderBy(col("user_id"), col("session_id")),
      Some("""SELECT user_id, session_id, count(*) AS n_events,
             |min(ts) AS session_start, max(ts) AS session_end,
             |round(sum(value), 2) AS sum_value
             |FROM (SELECT user_id, ts, value,
             |  CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
             |  FROM (SELECT user_id, ts, event_id, value,
             |    CASE WHEN prev IS NULL OR epoch_us(ts) - prev > 1800000000
             |         THEN 1 ELSE 0 END AS new_session
             |    FROM (SELECT user_id, ts, event_id, value,
             |      lag(epoch_us(ts), 1) OVER (PARTITION BY user_id
             |        ORDER BY ts, event_id) AS prev
             |    FROM events)))
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Tumbling 1-hour windows by event type (batch twin of the streaming
    // query in graft.streaming).
    QDef("q29_tumbling_window",
      (s, d) => Sessionization.tumbling(ev(s, d), "ts", "1 hour",
          Seq("event_type"), "value")
        .orderBy(col("window_start"), col("event_type")),
      Some("""SELECT date_trunc('hour', ts) AS window_start, event_type,
             |count(*) AS n, round(sum(value), 2) AS sum_value
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Sliding 1-hour windows every 30 minutes (each event in 2 windows).
    QDef("q30_sliding_window",
      (s, d) => ev(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes")
          .getField("start").as("window_start"))
        .agg(count(lit(1)).cast("long").as("n"),
          round(sum(col("value")), 2).as("sum_value"))
        .orderBy(col("window_start")),
      Some("""SELECT window_start, count(*) AS n, round(sum(value), 2) AS sum_value
             |FROM (
             |  SELECT make_timestamp(epoch_us(ts) - epoch_us(ts) % 1800000000) AS window_start, value FROM events
             |  UNION ALL
             |  SELECT make_timestamp(epoch_us(ts) - epoch_us(ts) % 1800000000 - 1800000000) AS window_start, value FROM events)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // A14 pivot: hour-of-day × event_type counts.
    QDef("q31_hour_type_pivot",
      (s, d) => ev(s, d)
        .groupBy(hour(col("ts")).cast("long").as("hour"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)).cast("long"))
        .na.fill(0L, Seq("click", "error", "purchase", "signup", "view"))
        .orderBy(col("hour")),
      Some("""SELECT CAST(hour(ts) AS BIGINT) AS hour,
             |count(*) FILTER (event_type = 'click') AS click,
             |count(*) FILTER (event_type = 'error') AS error,
             |count(*) FILTER (event_type = 'purchase') AS purchase,
             |count(*) FILTER (event_type = 'signup') AS signup,
             |count(*) FILTER (event_type = 'view') AS view
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // P5/P14 JSON boundary: extract props.k and aggregate per type.
    QDef("q32_json_props",
      (s, d) => ev(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(round(avg(col("k")), 6).as("avg_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"),
          count(lit(1)).cast("long").as("n"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type,
             |round(avg(k), 6) AS avg_k, min(k) AS min_k, max(k) AS max_k,
             |count(*) AS n
             |FROM (SELECT event_type,
             |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // CUBE subtotals over event dimensions (beyond the reference — free
    // with Catalyst, same Expand-based plan family as rollup).
    QDef("q60_cube",
      (s, d) => ev(s, d)
        .withColumn("day", to_date(col("ts")))
        .cube(col("day"), col("event_type"))
        .agg(count(lit(1)).cast("long").as("n"),
          round(sum(col("value")), 2).as("sum_value"),
          grouping_id().cast("long").as("gid"))
        .orderBy(col("gid"), col("day"), col("event_type")),
      Some("""SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n,
             |round(sum(value), 2) AS sum_value,
             |CAST(grouping_id(CAST(ts AS DATE), event_type) AS BIGINT) AS gid
             |FROM events
             |GROUP BY CUBE (CAST(ts AS DATE), event_type)
             |ORDER BY gid, day, event_type""".stripMargin)),

    // Exact distinct users per tumbling window (count-distinct under
    // event-time bucketing; the HLL variant is q45's sketch).
    QDef("q61_window_distinct",
      (s, d) => ev(s, d)
        .groupBy(window(col("ts"), "6 hours").getField("start").as("window_start"))
        .agg(countDistinct(col("user_id")).cast("long").as("n_users"),
          count(lit(1)).cast("long").as("n_events"))
        .orderBy(col("window_start")),
      Some("""SELECT make_timestamp(epoch_us(ts) // 21600000000 * 21600000000) AS window_start,
             |CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
             |count(*) AS n_events
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // A10: daily volume anomaly vs trailing-10-day history. The window is
    // global but operates on the tiny per-day aggregate (≤ O(days) rows).
    QDef("q40_volume_anomaly",
      (s, d) => Sessionization.volumeAnomaly(ev(s, d), "ts",
          lookback = 10, zThreshold = 2.5)
        .orderBy(col("day")),
      Some("""SELECT day, n, round(hist_avg, 4) AS hist_avg,
             |round(hist_std, 4) AS hist_std, round(z, 4) AS z,
             |coalesce(abs(z), 0) > 2.5 AS is_anomaly
             |FROM (SELECT day, n, hist_avg, hist_std,
             |  CASE WHEN hist_std IS NOT NULL AND hist_std > 0
             |       THEN (n - hist_avg) / hist_std END AS z
             |  FROM (SELECT day, n,
             |    avg(n) OVER w AS hist_avg,
             |    stddev_samp(n) OVER w AS hist_std
             |    FROM (SELECT CAST(ts AS DATE) AS day, count(*) AS n
             |          FROM events GROUP BY 1)
             |    WINDOW w AS (ORDER BY day ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)))
             |ORDER BY day""".stripMargin)),

    // As-of join: each click attributed to the user's latest view at or
    // before it (point-in-time attribution). Spark side is Temporal.asofJoin
    // (union + carry-forward window, one shuffle); the oracle is DuckDB's
    // native ASOF LEFT JOIN.
    QDef("q68_asof_attribution",
      (s, d) => {
        val e = ev(s, d)
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        val views = e.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts").as("view_ts"),
            col("event_id").as("view_id"), col("value").as("view_value"))
        Temporal.asofJoin(clicks, views, "user_id", "ts", "view_ts",
            rightTie = Some("view_id"))
          .select(col("event_id"), col("user_id"), col("ts"),
            col("view_id"), col("view_ts"),
            round(col("value") - col("view_value"), 2).as("value_delta"))
          .orderBy(col("event_id"))
      },
      Some("""WITH clicks AS (SELECT event_id, user_id, ts, value
             |                FROM events WHERE event_type = 'click'),
             |views AS (SELECT user_id, ts AS view_ts, event_id AS view_id,
             |                 value AS view_value
             |          FROM events WHERE event_type = 'view')
             |SELECT c.event_id, c.user_id, c.ts, v.view_id, v.view_ts,
             |round(c.value - v.view_value, 2) AS value_delta
             |FROM clicks c ASOF LEFT JOIN views v
             |  ON c.user_id = v.user_id AND c.ts >= v.view_ts
             |ORDER BY c.event_id""".stripMargin)),

    // Weekly cohort retention: cohort = user's first active week; cell =
    // distinct users from that cohort active k weeks later. Two key-local
    // aggregations — the min-week profile broadcast-joins back onto events.
    QDef("q72_retention_cohorts",
      (s, d) => {
        val weekly = ev(s, d)
          .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
          .distinct()
        val cohorts = weekly.groupBy("user_id")
          .agg(min(col("week")).as("cohort_week"))
        weekly.join(broadcast(cohorts), Seq("user_id"))
          .groupBy(col("cohort_week"),
            ((unix_timestamp(col("week")) - unix_timestamp(col("cohort_week")))
              / 604800L).cast("long").as("week_offset"))
          .agg(countDistinct(col("user_id")).cast("long").as("n_users"))
          .orderBy(col("cohort_week"), col("week_offset"))
      },
      Some("""WITH weekly AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS week
             |                FROM events),
             |cohorts AS (SELECT user_id, min(week) AS cohort_week
             |            FROM weekly GROUP BY 1)
             |SELECT c.cohort_week,
             |CAST((epoch(w.week) - epoch(c.cohort_week)) // 604800 AS BIGINT) AS week_offset,
             |CAST(count(DISTINCT w.user_id) AS BIGINT) AS n_users
             |FROM weekly w JOIN cohorts c USING (user_id)
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // SCD type-2 history: collapse each user's event stream to its
    // event_type change points, then effective-date them (valid_from /
    // valid_to / version) with lead + row_number over the change points.
    // One shuffle on user_id serves both window passes.
    QDef("q83_scd2_history",
      (s, d) => {
        val raw = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        ev(s, d)
          .withColumn("prev_type", lag(col("event_type"), 1).over(raw))
          .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
          .withColumn("valid_to", lead(col("ts"), 1).over(raw))
          .withColumn("version", row_number().over(raw).cast("long"))
          .select(col("user_id"), col("event_type"), col("ts").as("valid_from"),
            col("valid_to"), col("version"))
          .orderBy(col("user_id"), col("version"))
      },
      Some("""WITH c AS (SELECT user_id, event_type, ts, event_id,
             |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
             |  FROM events),
             |s AS (SELECT user_id, event_type, ts, event_id FROM c
             |  WHERE prev_type IS NULL OR prev_type <> event_type)
             |SELECT user_id, event_type, ts AS valid_from,
             |lead(ts) OVER w AS valid_to,
             |CAST(row_number() OVER w AS BIGINT) AS version
             |FROM s WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |ORDER BY user_id, version""".stripMargin)),

    // Ordered conversion funnel (view → click → purchase, 6 h step windows):
    // per-stage min-timestamp joins on the shrinking funnel population.
    QDef("q86_funnel",
      (s, d) => Sessionization.funnel(ev(s, d), "user_id", "event_type", "ts",
          Seq("view", "click", "purchase"), stepWindowMicros = 21600000000L)
        .select(col("user_id"), col("t_view"), col("t_click"),
          col("t_purchase"), col("stage"))
        .orderBy(col("user_id")),
      Some("""WITH v AS (SELECT user_id, min(ts) AS t_view FROM events WHERE event_type = 'view' GROUP BY 1),
             |c AS (SELECT e.user_id, min(e.ts) AS t_click FROM events e JOIN v ON e.user_id = v.user_id
             |      WHERE e.event_type = 'click' AND e.ts > v.t_view
             |        AND epoch_us(e.ts) - epoch_us(v.t_view) <= 21600000000 GROUP BY 1),
             |p AS (SELECT e.user_id, min(e.ts) AS t_purchase FROM events e JOIN c ON e.user_id = c.user_id
             |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
             |        AND epoch_us(e.ts) - epoch_us(c.t_click) <= 21600000000 GROUP BY 1)
             |SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
             |CAST(CASE WHEN p.t_purchase IS NOT NULL THEN 3
             |          WHEN c.t_click IS NOT NULL THEN 2 ELSE 1 END AS BIGINT) AS stage
             |FROM v LEFT JOIN c ON v.user_id = c.user_id LEFT JOIN p ON c.user_id = p.user_id
             |ORDER BY v.user_id""".stripMargin)),

    // Debounce audit: events of the same (user, type) within 6 h of the
    // previous one are suppressed; kept-vs-total per key.
    QDef("q87_debounce",
      (s, d) => {
        val keys = Seq(col("user_id"), col("event_type"))
        val total = ev(s, d).groupBy(keys: _*)
          .agg(count(lit(1)).cast("long").as("n_events"))
        val kept = Sessionization.debounce(ev(s, d),
            Seq("user_id", "event_type"), "ts", "event_id",
            gapMicros = 21600000000L)
          .groupBy(keys: _*)
          .agg(count(lit(1)).cast("long").as("n_kept"))
        total.join(kept, Seq("user_id", "event_type"))
          .orderBy(col("user_id"), col("event_type"))
      },
      Some("""WITH l AS (SELECT event_id, user_id, event_type, ts,
             |  epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS gap_us
             |  FROM events)
             |SELECT user_id, event_type,
             |CAST(count(*) AS BIGINT) AS n_events,
             |CAST(count(CASE WHEN gap_us IS NULL OR gap_us > 21600000000 THEN 1 END) AS BIGINT) AS n_kept
             |FROM l GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Distribution ranks per event type: percent_rank / cume_dist / decile
    // over a fully tie-broken order.
    QDef("q91_distribution_ranks",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
        ev(s, d).select(col("event_id"), col("event_type"),
            round(percent_rank().over(w), 6).as("pr"),
            round(cume_dist().over(w), 6).as("cd"),
            ntile(10).over(w).cast("long").as("decile"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, event_type,
             |round(percent_rank() OVER w, 6) AS pr,
             |round(cume_dist() OVER w, 6) AS cd,
             |CAST(ntile(10) OVER w AS BIGINT) AS decile
             |FROM events WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
             |ORDER BY event_id""".stripMargin)),

    // Mode (most frequent value) per group with deterministic tie-break —
    // count + row_number, one shuffle each; never a collect of the domain.
    QDef("q93_mode_per_user",
      (s, d) => {
        val c = ev(s, d).groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).cast("long").as("n"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(col("n").desc, col("event_type"))
        c.withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("user_id"), col("event_type").as("mode_type"),
            col("n").as("mode_n"))
          .orderBy(col("user_id"))
      },
      Some("""WITH c AS (SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2),
             |r AS (SELECT user_id, event_type, n,
             |  row_number() OVER (PARTITION BY user_id ORDER BY n DESC, event_type) AS rk FROM c)
             |SELECT user_id, event_type AS mode_type, n AS mode_n FROM r WHERE rk = 1
             |ORDER BY user_id""".stripMargin)),

    // First-order Markov transition matrix over each user's event sequence:
    // next-event counts + row-normalized probabilities (fixed-point).
    QDef("q94_transition_matrix",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val pairs = ev(s, d)
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .filter(col("next_type").isNotNull)
          .groupBy(col("event_type"), col("next_type"))
          .agg(count(lit(1)).cast("long").as("n"))
        val rowTotal = org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type"))
        pairs.select(col("event_type"), col("next_type"), col("n"),
            floor(col("n") * 10000.0 / sum(col("n")).over(rowTotal) + 0.5)
              .cast("long").as("p_x1e4"))
          .orderBy(col("event_type"), col("next_type"))
      },
      Some("""WITH s AS (SELECT user_id, event_type, ts, event_id,
             |  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
             |  FROM events),
             |c AS (SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS n
             |      FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2)
             |SELECT event_type, next_type, n,
             |CAST(floor(n * 10000.0 / CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) + 0.5) AS BIGINT) AS p_x1e4
             |FROM c ORDER BY 1, 2""".stripMargin)),

    // Robust per-group stats: median + median absolute deviation (exact
    // interpolated percentiles both sides; two grouped passes + one
    // broadcast-back join — never a per-row sort of the whole table).
    QDef("q97_robust_stats",
      (s, d) => {
        val med = ev(s, d).groupBy(col("event_type"))
          .agg(expr("percentile(value, 0.5)").as("med"))
        ev(s, d).join(broadcast(med), Seq("event_type"))
          .groupBy(col("event_type"))
          .agg(expr("percentile(abs(value - med), 0.5)").as("mad_v"),
            first(col("med")).as("med0"))
          .select(col("event_type"), round(col("med0"), 4).as("med"),
            round(col("mad_v"), 4).as("mad"))
          .orderBy(col("event_type"))
      },
      Some("""WITH med AS (SELECT event_type, median(value) AS med FROM events GROUP BY 1),
             |mad AS (SELECT e.event_type, median(abs(e.value - m.med)) AS mad_v,
             |               any_value(m.med) AS med
             |        FROM events e JOIN med m ON e.event_type = m.event_type GROUP BY 1)
             |SELECT event_type, round(med, 4) AS med, round(mad_v, 4) AS mad
             |FROM mad ORDER BY event_type""".stripMargin)),

    // Population stability index per event type: value-distribution drift
    // between the first and second half of the month, over a fixed 10-bin
    // grid with Laplace smoothing (so empty bins stay defined). PSI > 0.1
    // is the classic "retrain / investigate" alarm for a feature pipeline.
    // Counts for both periods come out of ONE grouped pass over events;
    // the bin grid is a broadcast of |types|×10 rows, the window sums run
    // over that same tiny table — the event table itself is never joined
    // or shuffled twice.
    QDef("q101_psi_drift",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val e = ev(s, d).where(col("value").isNotNull).select(
          col("event_type"),
          least(floor(col("value") / 50), lit(9)).cast("int").as("bin"),
          when(col("ts") < lit("2024-01-16").cast("timestamp"), 0)
            .otherwise(1).as("period"))
        val c = e.groupBy(col("event_type"), col("bin"))
          .agg(count(when(col("period") === 0, 1)).as("ca"),
            count(when(col("period") === 1, 1)).as("cb"))
        val grid = e.select(col("event_type")).distinct()
          .crossJoin(s.range(10).select(col("id").cast("int").as("bin")))
        val f = grid.join(c, Seq("event_type", "bin"), "left")
          .na.fill(0, Seq("ca", "cb"))
        val w = Window.partitionBy(col("event_type"))
        val p = f.select(col("event_type"),
          sum(col("ca")).over(w).as("na"), sum(col("cb")).over(w).as("nb"),
          col("ca"), col("cb"))
          .select(col("event_type"), col("na"), col("nb"),
            ((col("ca") + 0.5) / (col("na") + 5.0)).as("pa"),
            ((col("cb") + 0.5) / (col("nb") + 5.0)).as("pb"))
        p.groupBy(col("event_type"))
          .agg(max(col("na")).cast("long").as("n_a"),
            max(col("nb")).cast("long").as("n_b"),
            floor(sum((col("pa") - col("pb")) * log(col("pa") / col("pb")))
              * 1000000 + 0.5).cast("long").as("psi_x1e6"))
          .orderBy(col("event_type"))
      },
      Some("""WITH e AS (SELECT event_type, CAST(least(floor(value / 50), 9) AS INT) AS bin,
             |  CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END AS period
             |  FROM events WHERE value IS NOT NULL),
             |grid AS (SELECT t.event_type, b.bin FROM (SELECT DISTINCT event_type FROM e) t
             |  CROSS JOIN (SELECT CAST(range AS INT) AS bin FROM range(10)) b),
             |c AS (SELECT event_type, bin, count(*) FILTER (WHERE period = 0) AS ca,
             |  count(*) FILTER (WHERE period = 1) AS cb FROM e GROUP BY 1, 2),
             |f AS (SELECT g.event_type, g.bin, coalesce(c.ca, 0) AS ca, coalesce(c.cb, 0) AS cb
             |  FROM grid g LEFT JOIN c ON g.event_type = c.event_type AND g.bin = c.bin),
             |t AS (SELECT event_type, ca, cb, sum(ca) OVER (PARTITION BY event_type) AS na,
             |  sum(cb) OVER (PARTITION BY event_type) AS nb FROM f),
             |p AS (SELECT event_type, na, nb, (ca + 0.5) / (na + 5.0) AS pa,
             |  (cb + 0.5) / (nb + 5.0) AS pb FROM t)
             |SELECT event_type, CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
             |CAST(floor(sum((pa - pb) * ln(pa / pb)) * 1000000 + 0.5) AS BIGINT) AS psi_x1e6
             |FROM p GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Gaps-and-islands: longest run of consecutive active days per user
    // (the date-minus-row_number grouping trick — one shuffle on user_id,
    // both windows and the final aggregate share that partitioning).
    QDef("q114_active_streaks",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val days = ev(s, d)
          .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        val grp = days.withColumn("rn", row_number().over(
            Window.partitionBy(col("user_id")).orderBy(col("day"))))
          .withColumn("island", date_sub(col("day"), col("rn")))
        grp.groupBy(col("user_id"), col("island"))
          .agg(count(lit(1)).cast("long").as("len"))
          .groupBy(col("user_id"))
          .agg(max(col("len")).as("longest_streak"),
            sum(col("len")).as("n_active_days"))
          .orderBy(col("longest_streak").desc, col("user_id"))
          .limit(50)
      },
      Some("""WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
             |grp AS (SELECT user_id, day,
             |  day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INTEGER) AS island
             |  FROM days),
             |runs AS (SELECT user_id, island, count(*) AS len FROM grp GROUP BY 1, 2)
             |SELECT user_id, CAST(max(len) AS BIGINT) AS longest_streak,
             |CAST(sum(len) AS BIGINT) AS n_active_days
             |FROM runs GROUP BY 1
             |ORDER BY longest_streak DESC, user_id LIMIT 50""".stripMargin)),

    // Moving exact median (7-row frame) over the daily value series per
    // event type — the robust smoother for monitoring dashboards. Exact
    // `percentile` as a window aggregate; both engines interpolate
    // linearly. One shuffle on event_type, frame evaluation is in-memory
    // per partition.
    QDef("q122_moving_median",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val daily = ev(s, d)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(sum(col("value")).as("day_value"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
          .rowsBetween(-6, 0)
        daily.withColumn("med7",
            round(expr("percentile(day_value, 0.5)").over(w), 4))
          .select(col("event_type"), col("day"),
            round(col("day_value"), 4).as("day_value"), col("med7"))
          .orderBy(col("event_type"), col("day"))
      },
      Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
             |  sum(value) AS day_value FROM events GROUP BY 1, 2)
             |SELECT event_type, day, round(day_value, 4) AS day_value,
             |round(quantile_cont(day_value, 0.5) OVER (
             |  PARTITION BY event_type ORDER BY day
             |  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS med7
             |FROM daily ORDER BY 1, 2""".stripMargin)),

    // Linear trend per series: least-squares slope/intercept of daily
    // event counts against the day index (regr_* aggregates — one pass,
    // map-side combinable; the detector behind "volume is drifting up").
    QDef("q123_trend_slopes",
      (s, d) => ev(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
        .select(col("event_type"),
          datediff(col("day"), lit("2024-01-01")).cast("double").as("x"),
          col("n").cast("double").as("y"))
        .groupBy(col("event_type"))
        .agg(round(expr("regr_slope(y, x)"), 6).as("slope"),
          round(expr("regr_intercept(y, x)"), 6).as("intercept"),
          count(lit(1)).cast("long").as("n_days"))
        .orderBy(col("event_type")),
      Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
             |  count(*) AS n FROM events GROUP BY 1, 2),
             |xy AS (SELECT event_type,
             |  CAST(day - DATE '2024-01-01' AS DOUBLE) AS x,
             |  CAST(n AS DOUBLE) AS y FROM daily)
             |SELECT event_type, round(regr_slope(y, x), 6) AS slope,
             |round(regr_intercept(y, x), 6) AS intercept,
             |count(*) AS n_days
             |FROM xy GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Two-sample Kolmogorov-Smirnov drift statistic over the value
    // distribution, split into before/after periods. Binned ECDF (1000
    // fixed bins), NOT a global sort of raw values: exact to bin
    // resolution, and the only ordered window runs over the 1000-row bin
    // table — the shape that still works when each side holds 10^12
    // values. D = max |F1 - F2| over bin boundaries.
    QDef("q125_ks_drift",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val e = ev(s, d)
          .select(
            least(floor(col("value") / 0.5), lit(999)).cast("int").as("bin"),
            when(col("ts") < lit("2024-01-16"), 0).otherwise(1).as("period"))
        val binned = e.groupBy(col("bin"))
          .agg(sum(when(col("period") === 0, 1L).otherwise(0L)).as("c0"),
            sum(when(col("period") === 1, 1L).otherwise(0L)).as("c1"))
        val w = Window.partitionBy().orderBy(col("bin"))
          .rowsBetween(Window.unboundedPreceding, 0)
        val wt = Window.partitionBy()
        binned
          .withColumn("f0", sum(col("c0")).over(w) / sum(col("c0")).over(wt))
          .withColumn("f1", sum(col("c1")).over(w) / sum(col("c1")).over(wt))
          .agg(floor(max(abs(col("f0") - col("f1"))) * 1000000 + 0.5)
              .cast("long").as("ks_d_x1e6"),
            sum(col("c0")).cast("long").as("n_before"),
            sum(col("c1")).cast("long").as("n_after"))
      },
      Some("""WITH e AS (SELECT CAST(least(floor(value / 0.5), 999) AS INT) AS bin,
             |  CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END AS period
             |  FROM events),
             |b AS (SELECT bin, count(*) FILTER (WHERE period = 0) AS c0,
             |  count(*) FILTER (WHERE period = 1) AS c1 FROM e GROUP BY 1),
             |f AS (SELECT bin, c0, c1,
             |  CAST(sum(c0) OVER (ORDER BY bin) AS DOUBLE) / sum(c0) OVER () AS f0,
             |  CAST(sum(c1) OVER (ORDER BY bin) AS DOUBLE) / sum(c1) OVER () AS f1
             |  FROM b)
             |SELECT CAST(floor(max(abs(f0 - f1)) * 1000000 + 0.5) AS BIGINT) AS ks_d_x1e6,
             |CAST(sum(c0) AS BIGINT) AS n_before, CAST(sum(c1) AS BIGINT) AS n_after
             |FROM f""".stripMargin)),

    // Point-in-time lookup against an SCD2 dimension (the q83 history):
    // "what state was each user in 30 minutes after each event?" A
    // BETWEEN-join on (valid_from, valid_to) in the oracle; the engine
    // plans it as the same zero-join carry-forward window as
    // `Temporal.asofJoin` — an SCD2 interval probe IS an as-of join on
    // valid_from, because valid_to is the next version's valid_from.
    QDef("q127_scd2_lookup",
      (s, d) => {
        val raw = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val dim = ev(s, d)
          .withColumn("prev_type", lag(col("event_type"), 1).over(raw))
          .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
          .withColumn("version", row_number().over(raw).cast("long"))
          .select(col("user_id"), col("ts").as("valid_from"),
            col("event_type").as("state"), col("version"))
        val probes = ev(s, d)
          .select(col("user_id"), col("event_id"),
            (col("ts") + expr("INTERVAL 30 MINUTES")).as("probe_ts"))
        Temporal.asofJoin(probes, dim, "user_id", "probe_ts", "valid_from",
            rightTie = Some("version"))
          .groupBy(col("state"))
          .agg(count(lit(1)).cast("long").as("n_probes"))
          .orderBy(col("state"))
      },
      Some("""WITH c AS (SELECT user_id, event_type, ts, event_id,
             |  lag(event_type) OVER w AS prev_type
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |dim AS (SELECT user_id, ts AS valid_from,
             |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
             |  event_type AS state
             |  FROM c WHERE prev_type IS NULL OR prev_type <> event_type),
             |probes AS (SELECT user_id, event_id, ts + INTERVAL 30 MINUTE AS probe_ts
             |  FROM events)
             |SELECT d.state, count(*) AS n_probes
             |FROM probes p JOIN dim d
             |  ON p.user_id = d.user_id
             | AND p.probe_ts >= d.valid_from
             | AND (d.valid_to IS NULL OR p.probe_ts < d.valid_to)
             |GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
