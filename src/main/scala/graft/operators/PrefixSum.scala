package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix (running) sum over a globally-ordered integral key.
  *
  * A naive `sum().over(Window.orderBy(key))` plans an `Exchange
  * SinglePartition` — Spark moves the ENTIRE table to one task, which is
  * fine at sf0.1 and fatal at 100 TB. This is the standard two-pass
  * distributed scan instead:
  *
  *   1. bucket rows by key range (a monotone function of the key, so every
  *      row in bucket b orders before every row in bucket b+1);
  *   2. per-bucket totals — ONE small aggregate (`nBuckets` rows) collected
  *      to the driver, where the exclusive bucket offsets are a trivial
  *      scan (this is vocabulary-sized state, not data-sized);
  *   3. offsets broadcast-join back; the running sum is windowed WITHIN
  *      each bucket (`Window.partitionBy(bucket)`) and shifted by the
  *      bucket's offset.
  *
  * No single-partition Exchange or unpartitioned Window appears anywhere
  * in the resulting plan (pinned in PlanShapeSpec). Work per task is
  * O(rows/buckets); driver state is O(buckets).
  */
object PrefixSum {

  /** Adds `cumCol` = inclusive running sum of `valCol` in `orderCol` order.
    * `orderCol` must be integral (cast to long for bucketing); ties are
    * impossible when it is unique, which the callers guarantee.
    */
  def runningSum(df: DataFrame, orderCol: String, valCol: String,
                 cumCol: String, nBuckets: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val buckets =
      if (nBuckets > 0) nBuckets
      else math.max(1, spark.sessionState.conf.numShufflePartitions)
    val bounds = df.agg(
      min(col(orderCol)).cast("long"), max(col(orderCol)).cast("long")).head()
    if (bounds.isNullAt(0)) return df.withColumn(cumCol, lit(0L))
    val lo = bounds.getLong(0)
    val hi = bounds.getLong(1)
    val span = math.max(1L, (hi - lo) / buckets + 1)
    val bucketed = df.withColumn("_psb",
      ((col(orderCol).cast("long") - lo) / span).cast("long"))
    val totals = bucketed.groupBy(col("_psb"))
      .agg(sum(col(valCol)).cast("long").as("_t"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (b, t) => val o = (b, acc); acc += t; o }
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("_psb", "_pso")
    val w = Window.partitionBy(col("_psb")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    bucketed.join(broadcast(offDf), Seq("_psb"))
      .withColumn(cumCol, sum(col(valCol)).over(w) + col("_pso"))
      .drop("_psb", "_pso")
  }
}
