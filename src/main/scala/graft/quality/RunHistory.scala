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
}
