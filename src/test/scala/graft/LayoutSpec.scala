package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

/** Z-order layout: interleave correctness, the two-column pruning win a
  * single-column sort cannot give, and the writer's plan shape (range
  * partitions, never a global sort).
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def ref(a: Long, b: Long): Long =
    (0 until 16).foldLeft(0L)((acc, i) =>
      acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1)))

  test("zValue interleaves bits: known answer + reference property") {
    val cases = Seq((5L, 3L), (0L, 0L), (255L, 0L), (0L, 255L))
    val out = cases.toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    // a=101b -> positions 0,4; b=011b -> positions 1,3 -> 11011b = 27
    assert(out(0) == 27L)
    assert(out.toSeq == cases.map { case (a, b) => ref(a, b) })
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(200)((rnd.nextInt(65536).toLong,
      rnd.nextInt(65536).toLong))
    val got = pairs.toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    assert(got.toSeq == pairs.map { case (a, b) => ref(a, b) })
  }

  test("z slices prune a b-only box; a-sorted layout reads everything") {
    // 256×256 uniform grid. 64 equal-width z slices at 8 bits are exactly
    // the 8×8 grid of 32×32 tiles; the box (all a, b ∈ [0,31]) is one
    // tile-row -> 8 of 64 slices. An a-sorted layout's slices each span
    // the full b range -> zero pruning on a b-only predicate.
    val grid = spark.range(0, 65536)
      .select((col("id") / 256).cast("long").as("a"),
        (col("id") % 256).cast("long").as("b"))
    val zStats = Layout.zSliceStats(grid, "a", "b", nSlices = 64, bits = 8)
    val zTouched = Layout.touchedSlices(zStats, "a", "b", 0, 255, 0, 31)
    assert(zTouched == 8, s"z-layout touched $zTouched of 64")
    val aStats = grid.withColumn("slice", floor(col("a") / 4))
      .groupBy("slice")
      .agg(min("a").as("min_a"), max("a").as("max_a"),
        min("b").as("min_b"), max("b").as("max_b"))
    val aTouched = Layout.touchedSlices(aStats, "a", "b", 0, 255, 0, 31)
    assert(aTouched == 64, s"a-layout cannot prune a b-box: $aTouched")
  }

  test("zOrderBy writer plans range partitions, no single-partition stage") {
    val df = Tables(spark, sf, "lineitem").select("l_partkey", "l_suppkey")
    val laid = Layout.zOrderBy(df, "l_partkey", "l_suppkey", nFiles = 8)
    assert(laid.rdd.getNumPartitions == 8)
    val p = laid.queryExecution.executedPlan.toString
    assert(p.contains("rangepartitioning"), p)
    assert(!p.contains("SinglePartition"), s"global-sort stage:\n$p")
  }
}
