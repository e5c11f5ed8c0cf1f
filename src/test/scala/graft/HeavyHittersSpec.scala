package graft

import graft.operators.HeavyHitters
import org.apache.spark.sql.functions._

/** Count-min-sketch invariants behind the exact heavy-hitter operator. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private val depth = 4
  private val width = 64 // tiny on purpose: forces hash collisions

  test("CMS estimate never undercounts, even with forced collisions") {
    // 500 distinct tokens into 64 buckets — heavy collisions guaranteed
    val rows = (0 until 500).flatMap(i => Seq.fill(i % 7 + 1)(s"tok$i"))
    val sketch = rows.toDF("w").as[String]
      .select(HeavyHitters.cmsAggregator(depth, width).toColumn).head().cells
    val exact = rows.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    exact.foreach { case (w, c) =>
      val est = HeavyHitters.estimate(sketch, depth, width, w)
      assert(est >= c, s"$w: est $est < exact $c")
    }
  }

  test("frequentTokens equals the exact groupBy under a collision-prone sketch") {
    val rows = (0 until 300).map(i => s"word${i % 40}") ++ Seq.fill(50)("hot")
    val df = rows.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("id", "text")
    val got = HeavyHitters.frequentTokens(df, "text", minCount = 8L,
        depth = depth, width = width)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val want = df.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().filter(col("count") >= 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got.contains(("hot", 50L)))
  }
}
