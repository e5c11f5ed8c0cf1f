package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: push the two heaviest iterative graph operators well past
  * the 10× probes — `runMain graft.GraphStressProbe 1,10,50`.
  *
  * The 10× curves (PERF.md round-5 table) are linear, but the failure
  * modes that appear PAST 10× are memory cliffs, not slow curves: the
  * triangle wedge join materializes Σ deg(v)² wedge rows at the
  * high-degree tail, and LPA's per-round (node, neighbor-label)
  * aggregate grows with hub label diversity. Node-offset replicas keep
  * per-copy structure (degree distribution, rounds, diversity) constant
  * while edge count grows c× — so the expected curve stays linear and
  * any bend/OOM localizes a per-copy cost that is NOT degree-bounded.
  */
object GraphStressProbe {
  def main(args: Array[String]): Unit = {
    val factors = (if (args.nonEmpty) args(0) else "1,10,50")
      .split(",").map(_.trim.toInt).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tradeBase = Tables(spark, sfDir, "orders")
      .join(Tables(spark, sfDir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"),
        (col("l_suppkey") + 10000000L).as("dst"))
      .distinct().localCheckpoint()
    val partBase = Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .groupBy(col("l_orderkey")).agg(collect_set(col("l_partkey")).as("ps"))
      .select(explode(expr(
        "filter(flatten(transform(ps, x -> transform(ps, y -> struct(x, y))))," +
          " p -> p.x < p.y)")).as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y")).distinct()
      .localCheckpoint()

    factors.foreach { c =>
      def offsetCopies(e: org.apache.spark.sql.DataFrame,
                       a: String, b: String) = (0 until c).map { i =>
        e.select((col(a) + lit(i.toLong * 1000000000L)).as(a),
          (col(b) + lit(i.toLong * 1000000000L)).as(b))
      }.reduce(_ unionAll _).localCheckpoint()
      val trade = offsetCopies(tradeBase, "src", "dst")
      val parts = offsetCopies(partBase, "x", "y")
      def time[A](f: => A): (Double, A) = {
        val t0 = System.nanoTime()
        val r = f
        ((System.nanoTime() - t0) / 1e9, r)
      }
      val (triT, tris) = time(
        graft.operators.GraphOps.triangleCount(parts, "x", "y")
          .head().getLong(1))
      spark.catalog.clearCache()
      val (lpT, lpRows) = time(
        graft.operators.GraphOps.labelPropagation(trade, "src", "dst",
          rounds = 3).count())
      spark.catalog.clearCache()
      println(f"[stress] c=$c%3d tradeEdges=${trade.count()}%9d" +
        f" partEdges=${parts.count()}%9d triangles=$triT%.2fs ($tris tris)" +
        f" lpa=$lpT%.2fs ($lpRows nodes)")
    }
    spark.stop()
  }
}
