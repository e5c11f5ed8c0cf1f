package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational semantics of the reference pipeline: dedup, anti/semi
  * joins, union-with-schema-drift, closed-world reference filtering.
  *
  * Reference behaviors re-expressed (see SURVEY.md §2.4/§2.6/§2.8):
  *  - F1 keep-first dedup: `main.py:576-595`, `upload_papers_to_supabase.py:308-316`
  *  - F2 anti-join vs existing ids: `upload_papers_to_supabase.py:247-276`
  *  - F3 closed-world reference filter: `main.py:597-608`
  *  - U1 union of drifting-schema files: `gcs_reader.py:64-171`
  *
  * Scale notes: dedupKeepFirst is one hash shuffle on the key (window sort is
  * per-key within shuffle partitions, never a global sort). Anti/semi joins
  * let Catalyst/AQE pick broadcast vs shuffled hash vs sort-merge; callers
  * pass `broadcast(other)` when the right side is known-small.
  */
object Relational {

  /** Deterministic training-shard export: the "global shuffle" step of a
    * training-data pipeline, with no RNG. Order comes from md5(id) (id as
    * tie-break), shard membership from the hash's leading 16 bits (stable
    * under corpus growth — a doc never changes shard when other docs are
    * added), and `position` is the within-shard write order.
    *
    * Scale shape: ONE hash shuffle keyed by shard_id + a within-partition
    * sort (the rank window partitions by shard) — never a global sort.
    * Each of the `nShards` groups is then writable by its own task.
    */
  def shardExport(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    val h = md5(col(idCol).cast("string"))
    val w = Window.partitionBy(col("shard_id")).orderBy(col("order_key"), col(idCol))
    df.select(col(idCol), h.as("order_key"),
        (conv(substring(h, 1, 4), 16, 10).cast("int") % nShards)
          .cast("long").as("shard_id"))
      .withColumn("position", row_number().over(w).cast("long"))
      .select(col(idCol), col("shard_id"), col("position"), col("order_key"))
  }

  /** Snapshot diff for dataset versioning: classify every key across two
    * corpus snapshots as added / deleted / changed / unchanged by
    * comparing a content fingerprint. One full-outer hash join on the
    * key — no content travels, only (key, fingerprint).
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
                   fpCol: Column): DataFrame =
    oldDf.select(col(keyCol), fpCol.as("__fp_old"))
      .join(newDf.select(col(keyCol), fpCol.as("__fp_new")),
        Seq(keyCol), "full_outer")
      .select(col(keyCol),
        when(col("__fp_old").isNull, "added")
          .when(col("__fp_new").isNull, "deleted")
          .when(col("__fp_old") =!= col("__fp_new"), "changed")
          .otherwise("unchanged").as("status"))

  /** Keep-first dedup. Spark's `dropDuplicates` keeps an *arbitrary* row per
    * key; the reference keeps the first in arrival order. We make the
    * survivor explicit and oracle-stable with a priority ordering.
    */
  def dedupKeepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Rows of `df` whose key is absent from `other` (reference F2: skip papers
    * already present in the DB before upserting).
    */
  def antiJoin(df: DataFrame, other: DataFrame, keys: Seq[String]): DataFrame =
    df.join(other, keys, "left_anti")

  /** Rows of `df` whose key is present in `other` (EXISTS). */
  def semiJoin(df: DataFrame, other: DataFrame, keys: Seq[String]): DataFrame =
    df.join(other, keys, "left_semi")

  /** Bloom-pruned semi join: build a Bloom filter over `other(otherKey)`
    * (bits-only, size-bounded regardless of row count), pre-filter `df`
    * with `mightContain` BEFORE the shuffle, then run the exact semi join
    * on the survivors. False positives are removed by the join; Bloom
    * filters have no false negatives, so the result is EXACTLY
    * `semiJoin(df, other)` — the filter only cuts shuffle volume.
    *
    * This is the sketch-based join-pruning pattern (what Spark's own
    * runtime row-level filtering does for DPP-ineligible joins): at 100 TB
    * a 1%-selective semi join moves 1% of the big side instead of all of
    * it, for the cost of broadcasting ~1.2 bytes/key of filter bits.
    */
  def bloomPrunedSemiJoin(df: DataFrame, key: String,
                          other: DataFrame, otherKey: String,
                          fpp: Double = 0.01): DataFrame = {
    val keyed = other.select(col(otherKey))
    val n = math.max(1L, keyed.count())
    val bf = keyed.stat.bloomFilter(otherKey, n, fpp)
    val bc = df.sparkSession.sparkContext.broadcast(bf)
    val might = udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
    df.filter(might(col(key)))
      .join(keyed.withColumnRenamed(otherKey, key), Seq(key), "left_semi")
  }

  /** Union of per-file/per-term DataFrames whose schemas drift (reference U1:
    * processed files gain columns over time).
    */
  def unionAll(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))

  /** Closed-world filter (reference F3): restrict an array-of-ids column to
    * ids that exist in `universe(idCol)`. Implemented shuffle-side
    * (explode → semi join → regroup) so it scales past a broadcastable id
    * set; for small universes Catalyst/AQE will still broadcast the join.
    * Rows with empty/null arrays are preserved with an empty array, matching
    * the reference's `[]` default.
    */
  def closedWorldFilter(df: DataFrame, rowKey: String, arrCol: String,
                        universe: DataFrame, idCol: String): DataFrame = {
    val ids = universe.select(col(idCol).as("__id")).distinct()
    val kept = df
      .select(col(rowKey), explode(col(arrCol)).as("__id"))
      .join(ids, Seq("__id"), "left_semi")
      .groupBy(col(rowKey))
      .agg(sort_array(collect_list(col("__id"))).as("__kept"))
    df.drop(arrCol)
      .join(kept, Seq(rowKey), "left")
      .withColumn(arrCol, coalesce(col("__kept"), array().cast("array<string>")))
      .drop("__kept")
  }

  /** Top-k by a measure with a deterministic tie-break (reference O3
    * `value_counts().head(N)` family). Spark plans this as
    * TakeOrderedAndProject — a per-partition top-k + merge, no global sort.
    */
  def topK(df: DataFrame, k: Int, order: Column*): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** Skew-safe equi-join: salt the skewed (left) side's key into
    * `saltBuckets` sub-keys and explode the right side across all buckets,
    * so one hot key spreads over `saltBuckets` tasks instead of one
    * straggler. Use when AQE's skew-join split isn't available (e.g.
    * non-shuffle-joinable plans) or the skew is known up front; the right
    * side must be the smaller one (it is replicated ×saltBuckets).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltBuckets: Int): DataFrame = {
    val saltedL = left.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(saltBuckets)))
    val saltedR = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedL.join(saltedR, Seq(key, "__salt")).drop("__salt")
  }

  /** MERGE (upsert + delete) of a changeset into a snapshot: source rows
    * override target rows on `key`, source-only rows insert, `deletes` keys
    * drop (delete wins over update). Target-only columns pass through
    * (null for inserts); an `action` column records what happened to each
    * row. One full-outer shuffle join on the key + one anti-join — AQE
    * handles key skew; at scale, partition the snapshot by the key so the
    * merge co-locates with it.
    */
  def mergeUpsert(target: DataFrame, source: DataFrame, key: String,
                  deletes: DataFrame): DataFrame = {
    require(!source.columns.contains("__present"),
      "source must not contain the reserved column __present")
    val srcCols = source.columns.toSet
    // presence flag, not coalesce: a source row must be able to SET a
    // column to null (clear a value) — coalesce would silently keep the
    // stale target value while still reporting action='update'
    val s = source.withColumn("__present", lit(true)).as("s")
    val merged = target.columns.filterNot(_ == key).map { c =>
      if (srcCols(c))
        when(col("s.__present"), col(s"s.$c")).otherwise(col(s"t.$c")).as(c)
      else col(s"t.$c").as(c)
    }
    val action = when(col(s"t.$key").isNull, "insert")
      .when(col("s.__present"), "update")
      .otherwise("keep").as("action")
    target.as("t")
      .join(s, col(s"t.$key") === col(s"s.$key"), "full_outer")
      .select((coalesce(col(s"s.$key"), col(s"t.$key")).as(key) +: merged.toIndexedSeq :+ action): _*)
      .join(deletes.select(col(key)), Seq(key), "left_anti")
  }

  /** Interval join (probe value ∈ [lo, hi], inclusive) via bin bucketing:
    * each interval is exploded to the fixed-width bins it covers, the probe
    * side computes its single bin, and the join becomes an equi-join on the
    * bin id with the range predicate left as a residual filter.
    *
    * Without this, Spark plans value-in-range joins as a broadcast
    * nested-loop (O(probe × intervals) comparisons) — fine for 50
    * intervals, fatal for millions. Binning shuffles O(probe +
    * intervals × bins-per-interval) rows on a key both sides share, so it
    * scales with data size, not the cross product. `binWidth` should be
    * on the order of the typical interval length: wider → fewer replicas
    * per interval but more false candidates per bin.
    *
    * Interval columns must not be null; probe rows with a null value are
    * dropped (no match semantics, same as the SQL BETWEEN predicate).
    */
  def binnedIntervalJoin(probe: DataFrame, valueCol: String,
                         intervals: DataFrame, loCol: String, hiCol: String,
                         binWidth: Double): DataFrame = {
    val binned = intervals.withColumn("__bin",
      explode(sequence(floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    probe
      .withColumn("__bin", floor(col(valueCol) / binWidth).cast("long"))
      .join(binned, Seq("__bin"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) <= col(hiCol))
      .drop("__bin")
  }
}
