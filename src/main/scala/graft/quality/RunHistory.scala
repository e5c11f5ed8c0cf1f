package graft.quality

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Run-over-run state as a table, not JSON files (reference T5/A10-A11:
  * `schema_validator.py:80-131,419-432` keeps the last 10 schema JSONs on
  * disk and hand-computes z-scores; here run metrics append to a parquet
  * table and the anomaly check is one window query).
  */
object RunHistory {

  /** Append one run's metrics (tiny single-row profile + run_ts). */
  def record(profile: DataFrame, runTs: String, path: String): Unit =
    profile.withColumn("run_ts", lit(runTs))
      .write.mode("append").parquet(path)

  /** Volume + missing-rate anomalies vs the trailing `lookback` runs
    * (z > zThreshold or change > pctThreshold — the reference's dual gate).
    */
  def anomalies(spark: SparkSession, path: String, countCol: String,
                lookback: Int = 10, zThreshold: Double = 2.5,
                pctThreshold: Double = 0.5): DataFrame = {
    val runs = spark.read.parquet(path)
    val w = Window.orderBy(col("run_ts")).rowsBetween(-lookback, -1)
    runs.select(col("run_ts"), col(countCol).cast("double").as("n"))
      .withColumn("hist_avg", avg(col("n")).over(w))
      .withColumn("hist_std", stddev_samp(col("n")).over(w))
      .withColumn("z", when(col("hist_std").isNotNull && col("hist_std") > 0,
        (col("n") - col("hist_avg")) / col("hist_std")))
      .withColumn("pct_change", when(col("hist_avg").isNotNull && col("hist_avg") > 0,
        abs(col("n") - col("hist_avg")) / col("hist_avg")))
      .withColumn("is_anomaly",
        coalesce(abs(col("z")), lit(0.0)) > zThreshold ||
          coalesce(col("pct_change"), lit(0.0)) > pctThreshold)
  }

  /** The reference's 5-point quality-drop alert
    * (`schema_validator.py:352-386`): each run's quality metrics vs the
    * IMMEDIATELY PREVIOUS run (lag 1, not the trailing-window z-gate
    * above); a metric alerts when `current < previous - threshold`. One
    * row per (run_ts, metric): (current, previous, drop, quality_dropped).
    * The first run has no previous → never alerts (the reference's
    * `has_previous: False`).
    */
  def qualityDrop(spark: SparkSession, path: String,
                  metricCols: Seq[String] =
                    Seq("completeness", "validity", "overall_quality"),
                  threshold: Double = 5.0): DataFrame = {
    val runs = spark.read.parquet(path)
      .select(col("run_ts") +:
        metricCols.map(m => col(m).cast("double").as(m)): _*)
    val w = Window.orderBy(col("run_ts"))
    val withPrev = metricCols.foldLeft(runs) { (df, m) =>
      df.withColumn(s"__prev_$m", lag(col(m), 1).over(w))
    }
    metricCols.map { m =>
      withPrev.select(col("run_ts"), lit(m).as("metric"),
        col(m).as("current"), col(s"__prev_$m").as("previous"))
    }.reduce(_.unionByName(_))
      .withColumn("drop", round(col("previous") - col("current"), 2))
      .withColumn("quality_dropped",
        col("previous").isNotNull &&
          col("current") < col("previous") - threshold)
  }
}
