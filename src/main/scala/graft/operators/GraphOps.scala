package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives for dedup-group resolution: near-dup PAIRS
  * (from [[DedupOps]]) become dedup GROUPS only after transitive closure —
  * the step every training-data dedup pipeline needs between "a~b, b~c" and
  * "keep one of {a,b,c}".
  */
object GraphOps {

  /** Connected components by iterative min-label propagation: every node
    * starts labeled with itself; each round every node takes the minimum
    * label among itself and its neighbors; fixed point = components labeled
    * by their minimum member (deterministic).
    *
    * Scale shape: each round is one shuffle join (edges × labels) + one
    * groupBy — no driver-side graph state, and `localCheckpoint` cuts the
    * lineage so round N doesn't replay rounds 1..N-1. Rounds needed = graph
    * diameter; dedup graphs are near-cliques (diameter ≤ 3-4 in practice).
    * For adversarial long-chain graphs, large-star/small-star (Kiveris et
    * al., "Connected Components in MapReduce") halves the round count; not
    * needed for the dedup workload this serves.
    *
    * Returns (id, component) for every node appearing in `edges`.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIters: Int = 20): DataFrame = {
    val spark = edges.sparkSession
    val und = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .union(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .distinct().localCheckpoint()
    var labels = und.select(col("a").as("id")).distinct()
      .select(col("id"), col("id").as("component")).localCheckpoint()
    def labelSum(df: DataFrame): Long =
      df.agg(coalesce(sum("component"), lit(0L))).head.getLong(0)
    var prevSum = labelSum(labels)
    var converged = false
    var i = 0
    while (i < maxIters && !converged) {
      val viaNeighbor = und
        .join(labels.withColumnRenamed("id", "a"), Seq("a"))
        .select(col("b").as("id"), col("component"))
      labels = labels.union(viaNeighbor)
        .groupBy("id").agg(min("component").as("component"))
        .localCheckpoint()
      // fixed point when no label decreased: labels only ever decrease, so
      // an unchanged label sum means an unchanged labeling
      val s = labelSum(labels)
      converged = s == prevSum
      prevSum = s
      i += 1
    }
    labels
  }
}
