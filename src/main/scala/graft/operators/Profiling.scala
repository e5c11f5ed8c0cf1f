package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Schema/data-quality profiling — the reference's `SchemaValidator`
  * re-expressed as one-pass Spark aggregations (SURVEY.md §2.5 A6–A13).
  *
  * Reference behaviors:
  *  - A7 missing-count profile: `Validation/schema_validator.py:289-311`
  *  - A8 numeric stats: `schema_validator.py:303-311`
  *  - A9 duplicate audit: `schema_validator.py:163-179`
  *  - A6 value_counts + share: `schema_validator.py:199-235`
  *  - A13 completeness/validity quality score: `schema_validator.py:313-350`
  *
  * All of these are single-pass hash aggregates (map-side partial + final) —
  * at 100 TB each profile is one scan with no joins and a tiny (single-row or
  * per-group) result; nothing is collected to the driver mid-plan.
  */
object Profiling {

  /** Per-column null counts, one wide row (reference A7 `df.isnull().sum()`). */
  def missingProfile(df: DataFrame): DataFrame =
    df.agg(
      count(lit(1)).cast("long").as("n_rows"),
      df.columns.map(c =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).cast("long").as(s"${c}_nulls")): _*)

  /** min/max/avg/stddev per numeric column, one wide row (reference A8).
    * min/max are exact; avg/stddev rounded to 6dp for oracle stability.
    */
  def numericStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        min(col(c)).as(s"${c}_min"),
        max(col(c)).as(s"${c}_max"),
        round(avg(col(c)), 6).as(s"${c}_avg"),
        round(stddev_samp(col(c)), 6).as(s"${c}_std"))
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Count-by-value with global share, ordered desc (reference A6). The share
    * uses an empty-frame window: Spark computes it with a single-partition
    * exchange over the (tiny) grouped result, not over the raw table.
    */
  def valueCounts(df: DataFrame, c: String): DataFrame = {
    val grouped = df.groupBy(col(c)).agg(count(lit(1)).cast("long").as("n"))
    grouped
      .withColumn("share", round(col("n") / sum(col("n")).over(Window.partitionBy()), 6))
      .orderBy(col("n").desc, col(c))
  }

  /** Row count vs distinct-key count (reference A9 duplicate audit). */
  def duplicateAudit(df: DataFrame, keyCol: String): DataFrame =
    df.agg(
      count(lit(1)).cast("long").as("n_rows"),
      countDistinct(col(keyCol)).cast("long").as("n_unique"))
      .withColumn("n_dup", col("n_rows") - col("n_unique"))

  /** Completeness + validity quality score (reference A13):
    * completeness = (1 - missing_cells/total_cells)·100,
    * validity = ((2n - issues)/2n)·100 over the two reference predicates
    * (year window, non-negative count), overall = mean of the two.
    */
  def qualityScore(df: DataFrame, yearCol: String, minYear: Int, maxYear: Int,
                   nonNegCol: String): DataFrame = {
    val nCols = df.columns.length
    val missingCells = df.columns
      .map(c => sum(when(col(c).isNull, 1L).otherwise(0L)))
      .reduce(_ + _)
    // the reference's validity gate checks an *integer* year column
    // (schema_validator.py:338-340); date/timestamp columns go through year()
    val yr = df.schema(yearCol).dataType match {
      case _: NumericType => col(yearCol)
      case _              => year(col(yearCol))
    }
    df.agg(
      count(lit(1)).cast("long").as("n_rows"),
      missingCells.cast("long").as("n_missing_cells"),
      sum(when(yr < minYear || yr > maxYear, 1L)
        .otherwise(0L)).cast("long").as("n_bad_year"),
      sum(when(col(nonNegCol) < 0, 1L).otherwise(0L)).cast("long").as("n_negative"))
      .withColumn("completeness",
        round((lit(1.0) - col("n_missing_cells") / (col("n_rows") * nCols)) * 100, 6))
      .withColumn("validity",
        round(((lit(2.0) * col("n_rows") - (col("n_bad_year") + col("n_negative")))
          / (lit(2.0) * col("n_rows"))) * 100, 6))
      .withColumn("overall_quality",
        round((col("completeness") + col("validity")) / 2.0, 6))
  }

  /** Convenience: all numeric columns of a DataFrame. */
  def numericCols(df: DataFrame): Seq[String] =
    df.schema.fields.collect { case f if f.dataType.isInstanceOf[NumericType] => f.name }
}
