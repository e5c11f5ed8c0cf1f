package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark's built-ins don't express directly.
  *
  * The reference pipeline has no as-of semantics (it is API-bound ETL), but
  * any event/feature store at scale needs "latest value at or before t" —
  * point-in-time correctness for training-data assembly.
  */
object Temporal {

  /** As-of join: every `left` row picks up the payload of the LATEST `right`
    * row with the same key and `right.tsRight <= left.tsLeft` (inclusive,
    * i.e. DuckDB `ASOF LEFT JOIN ... ON l.ts >= r.ts`); left rows with no
    * such right row keep null payloads.
    *
    * Spark-first plan: instead of a per-row range probe (O(n·m) broadcast
    * loop) or an inequality join (BNLJ at scale), tag both sides, union, and
    * carry the last non-null payload forward over a single
    * (key, ts, side)-sorted window — ONE shuffle on the key, linear work,
    * and it survives any skew a range join would choke on. Right rows sort
    * before left rows at equal ts (inclusive bound); `rightTie` breaks order
    * among equal-ts right rows deterministically (latest wins).
    *
    * All non-key `right` columns become payload; callers rename them to
    * avoid collision with left columns before the call.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsLeft: String, tsRight: String,
               rightTie: Option[String] = None): DataFrame = {
    val payload = right.columns.filter(_ != keyCol).toSeq
    val leftCols = left.columns.filter(c => c != keyCol && c != tsLeft).toSeq
    require(leftCols.intersect(payload).isEmpty,
      s"rename right columns to avoid collision: ${leftCols.intersect(payload)}")

    def nullOf(df: DataFrame, c: String): Column =
      lit(null).cast(df.schema(c).dataType).as(c)

    // the payload travels as ONE struct so the matched right row is carried
    // forward wholesale — per-column last(ignoreNulls) would substitute
    // stale values for legitimately-null fields and mix columns from
    // different right rows
    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map(c => right.schema(c)))
    val taggedLeft = left.select(
      (col(keyCol) +: col(tsLeft).as("__ts") +: lit(1).as("__side") +:
        (leftCols.map(col) :+ lit(null).cast(payloadType).as("__p"))): _*)
    val taggedRight = right.select(
      (col(keyCol) +: col(tsRight).as("__ts") +: lit(0).as("__side") +:
        (leftCols.map(nullOf(left, _)) :+
          struct(payload.map(col): _*).as("__p"))): _*)

    val ordering = col("__ts").asc +: col("__side").asc +:
      rightTie.map(t => col("__p").getField(t).asc_nulls_first).toSeq
    val w = Window.partitionBy(col(keyCol)).orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedLeft.unionByName(taggedRight)
      .select((col(keyCol) +: col("__ts") +: col("__side") +:
        (leftCols.map(col) :+
          last(col("__p"), ignoreNulls = true).over(w).as("__pl"))): _*)
      .filter(col("__side") === 1)
      .select((col(keyCol) +: col("__ts").as(tsLeft) +:
        (leftCols.map(col) ++
          payload.map(c => col("__pl").getField(c).as(c)))): _*)
  }
}
