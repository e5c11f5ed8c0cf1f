package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout (Z-order / Morton curve).
  *
  * At 100 TB the dominant cost of a selective query is how many files its
  * predicates let the scan SKIP via footer min/max stats. A single-column
  * sort gives pruning on one key only; interleaving the bits of two keys
  * gives a total order whose contiguous ranges cover axis-aligned-ish
  * rectangles, so per-file min/max stats prune on BOTH columns — the idea
  * behind Delta/Iceberg `OPTIMIZE ZORDER BY`, exposed here as plain
  * deterministic expressions so the layout and its pruning win stay
  * oracle-checkable (LayoutSpec + q174).
  *
  * The reference has no layout story (it writes whatever pandas emits —
  * SURVEY §2.2 K1); this is part of the at-scale surface this engine adds.
  */
object Layout {

  /** Morton/Z value: interleave the low `bits` bits of two non-negative
    * integer columns — bit i of `a` lands at position 2i, bit i of `b` at
    * 2i+1. Pure builtin composition (shift/and/or): whole-stage-codegen'd
    * on the Spark side and restated verbatim in SQL by [[zValueSql]] for
    * any oracle. 2·bits ≤ 62 keeps the result in a signed long.
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits out of range")
    (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The identical interleave as a SQL fragment over column names —
    * `&`/`>>`/`<<`/`|` are the common Spark ∩ DuckDB dialect, so one
    * string serves both the engine and the oracle.
    */
  def zValueSql(a: String, b: String, bits: Int = 16): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($a >> $i) & 1) << ${2 * i})",
        s"((($b >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" | ")

  /** Production layout writer: range-repartition on the z-value and sort
    * within partitions — each output file then covers one contiguous z
    * range (a bounded rectangle stack in (a, b) space). Sampling-based
    * range boundaries, NO global sort or single-partition stage; follow
    * with `.write` and per-file min/max stats do the pruning.
    */
  def zOrderBy(df: DataFrame, aCol: String, bCol: String, nFiles: Int,
               bits: Int = 16): DataFrame = {
    val z = zValue(col(aCol), col(bCol), bits).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Deterministic, oracle-portable file-stats table: slice the z range
    * into `nSlices` equal-WIDTH buckets (value-based, not rank-based — a
    * rank ntile needs a global-order window, the single-partition shape
    * this engine bans) and report per-slice row count and min/max of both
    * layout columns. `touchedSlices` over this table gives the pruning
    * arithmetic a layout decision needs. The one scalar (max z) is a
    * 1-row broadcast.
    */
  def zSliceStats(df: DataFrame, aCol: String, bCol: String,
                  nSlices: Int, bits: Int = 16): DataFrame = {
    val z = zValue(col(aCol), col(bCol), bits)
    val withZ = df.select(col(aCol), col(bCol), z.as("__z"))
    val zmax = withZ.agg(max(col("__z")).as("__zmax"))
    withZ.crossJoin(broadcast(zmax))
      .withColumn("slice",
        floor(col("__z") * nSlices / (col("__zmax") + 1)).cast("long"))
      .groupBy(col("slice"))
      .agg(count(lit(1)).cast("long").as("n"),
        min(col(aCol)).as(s"min_$aCol"), max(col(aCol)).as(s"max_$aCol"),
        min(col(bCol)).as(s"min_$bCol"), max(col(bCol)).as(s"max_$bCol"))
      .orderBy(col("slice"))
  }

  /** How many slices of a stats table a box predicate must read: a slice
    * is skipped when its [min, max] interval on EITHER column misses the
    * box — exactly the footer-stats pruning rule. Driver-side over the
    * (tiny, ≤ nSlices-row) stats table.
    */
  def touchedSlices(stats: DataFrame, aCol: String, bCol: String,
                    aLo: Long, aHi: Long, bLo: Long, bHi: Long): Long =
    stats.filter(
      col(s"max_$aCol") >= aLo && col(s"min_$aCol") <= aHi &&
        col(s"max_$bCol") >= bLo && col(s"min_$bCol") <= bHi)
      .count()
}
