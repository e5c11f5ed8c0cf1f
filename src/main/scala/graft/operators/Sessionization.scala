package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time windowing over batch tables: running aggregates,
  * gap-based sessionization, tumbling/sliding time windows, run-over-run
  * anomaly scoring (reference T5/A10-A12 — the schema validator's
  * volume-vs-history z-score — generalized to event streams).
  *
  * Scale notes: every operator shuffles once on its partition key
  * (user/day); window sorts are per-key within shuffle partitions. The
  * tumbling/sliding forms are the batch twins of the Structured Streaming
  * versions in `graft.streaming` — same groupBy(window(...)) logical plan.
  */
object Sessionization {

  /** Per-key running aggregates: row_number, running sum, previous value. */
  def runningAgg(df: DataFrame, keyCol: String, tsCol: String,
                 tieCol: String, valCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    df.select(col(keyCol), col(tsCol), col(tieCol), col(valCol))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("running_sum",
        round(sum(col(valCol)).over(w.rowsBetween(Window.unboundedPreceding, 0)), 2))
      .withColumn("prev_value", lag(col(valCol), 1).over(w))
  }

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event of the same key exceeds `gapSeconds`. Returns one row
    * per session with bounds and totals.
    */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
                 tieCol: String, valCol: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val gapUs = gapSeconds * 1000000L
    val flagged = df
      .withColumn("__prev", lag(unix_micros(col(tsCol)), 1).over(w))
      .withColumn("__new_session",
        when(col("__prev").isNull ||
          unix_micros(col(tsCol)) - col("__prev") > gapUs, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("__new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    flagged.groupBy(col(keyCol), col("session_id"))
      .agg(
        count(lit(1)).cast("long").as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        round(sum(col(valCol)), 2).as("sum_value"))
  }

  /** Tumbling event-time window aggregation (batch twin of the streaming
    * query): epoch-aligned buckets of `width`.
    */
  def tumbling(df: DataFrame, tsCol: String, width: String,
               groupCols: Seq[String], valCol: String): DataFrame =
    df.groupBy((window(col(tsCol), width).getField("start").as("window_start")
        +: groupCols.map(col)): _*)
      .agg(count(lit(1)).cast("long").as("n"),
        round(sum(col(valCol)), 2).as("sum_value"))

  /** Daily-volume anomaly score (reference A10): count per day per key,
    * z-scored against the trailing `lookback` days; |z| > threshold flags.
    */
  def volumeAnomaly(df: DataFrame, tsCol: String, lookback: Int,
                    zThreshold: Double): DataFrame = {
    val daily = df.groupBy(to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).cast("long").as("n"))
    val w = Window.orderBy(col("day")).rowsBetween(-lookback, -1)
    daily
      .withColumn("hist_avg", avg(col("n")).over(w))
      .withColumn("hist_std", stddev_samp(col("n")).over(w))
      .withColumn("z",
        when(col("hist_std").isNotNull && col("hist_std") > 0,
          (col("n") - col("hist_avg")) / col("hist_std")))
      .select(col("day"), col("n"),
        round(col("hist_avg"), 4).as("hist_avg"),
        round(col("hist_std"), 4).as("hist_std"),
        round(col("z"), 4).as("z"),
        (coalesce(abs(col("z")), lit(0.0)) > zThreshold).as("is_anomaly"))
  }

  /** Ordered conversion funnel: for each user, the first `stages.head`
    * event anchors the funnel; each later stage must strictly follow the
    * previous stage's timestamp within `stepWindowMicros`. Output: one row
    * per user who entered the funnel, a `t_<stage>` timestamp per reached
    * stage (null past the drop-off) and `stage` = furthest stage index
    * (1-based).
    *
    * Each step is one filter + join + min-aggregate on the user key — the
    * funnel table shrinks monotonically per stage, so later steps get
    * cheaper; no window over the full event stream is ever taken.
    */
  def funnel(df: DataFrame, userCol: String, typeCol: String, tsCol: String,
             stages: Seq[String], stepWindowMicros: Long): DataFrame = {
    require(stages.nonEmpty)
    def tCol(s: String) = s"t_$s"
    val anchor = df.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as(tCol(stages.head)))
    val reached = stages.tail.scanLeft(anchor -> stages.head) {
      case ((prev, prevStage), stage) =>
        df.filter(col(typeCol) === stage)
          .join(prev.select(col(userCol), col(tCol(prevStage))), userCol)
          .filter(col(tsCol) > col(tCol(prevStage)) &&
            unix_micros(col(tsCol)) - unix_micros(col(tCol(prevStage))) <=
              stepWindowMicros)
          .groupBy(col(userCol)).agg(min(col(tsCol)).as(tCol(stage))) -> stage
    }.map(_._1)
    val joined = reached.reduceLeft((a, b) => a.join(b, Seq(userCol), "left"))
    val stageExpr = stages.zipWithIndex.reverse.tail.foldLeft(
      when(col(tCol(stages.last)).isNotNull, stages.length)) {
      case (acc, (s, i)) => acc.when(col(tCol(s)).isNotNull, i + 1)
    }
    joined.withColumn("stage", stageExpr.cast("long"))
  }

  /** Debounce: suppress events of the same key arriving within `gapMicros`
    * of the *previous event* of that key (lag-based — a pure window, one
    * shuffle; the stateful "previous kept event" variant needs a running
    * scan and is what the streaming sessionizer's state model covers).
    */
  def debounce(df: DataFrame, keyCols: Seq[String], tsCol: String,
               tieCol: String, gapMicros: Long): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    df.withColumn("__gap",
        unix_micros(col(tsCol)) - lag(unix_micros(col(tsCol)), 1).over(w))
      .filter(col("__gap").isNull || col("__gap") > gapMicros)
      .drop("__gap")
  }
}
