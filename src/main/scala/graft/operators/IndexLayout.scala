package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared maintenance plumbing for the persisted index layouts (BM25
  * term-sharded postings, dedup shingle-sharded postings, IVF/IVF-PQ
  * cell-partitioned vectors). The lifecycle is Lucene's segment model
  * re-expressed on parquet partitions:
  *
  *   - WRITE:   one clustered partitioned layout, O(shards) files;
  *   - APPEND:  new files into the same partition dirs (no rewrite) —
  *              each append adds ≥1 file per touched shard;
  *   - REMOVE:  O(batch) tombstone rows appended to a sidecar — no shard
  *              is rewritten; reads anti-join the tombstones;
  *   - COMPACT: rewrite each partition clustered (small files from
  *              appends merged) with tombstoned rows dropped, then clear
  *              the tombstones — the segment merge that reclaims space.
  *
  * At 100 TB this is the only viable shape: deletes cannot rewrite a
  * shingle-sharded corpus (a doc's postings touch ~every shard), and
  * appends must not pay a read-modify-write of the accumulated index.
  * Compaction is the offline operation that bounds read amplification.
  */
object IndexLayout {

  /** Whether `dir` holds a partitioned parquet layout on `partCol` (any
    * `partCol=…` subdirectory) — false for the readable-empty
    * unpartitioned form the index writers emit on an empty corpus.
    */
  def partitionedLayout(spark: SparkSession, dir: String,
                        partCol: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(st =>
      st.isDirectory && st.getPath.getName.startsWith(partCol + "="))
  }

  /** Append a distinct id batch to the layout's tombstone sidecar.
    * `tombDir` is the sidecar directory itself: `$path/tombstones` for
    * the multi-table layouts (BM25, dedup), the SIBLING
    * `$path.tombstones` for IVF/IVF-PQ whose index path is itself the
    * cell-partitioned directory (a subdir there would break partition
    * discovery).
    */
  def appendTombstones(ids: DataFrame, idCol: String,
                       tombDir: String): Unit =
    ids.select(col(idCol)).distinct()
      .write.mode("append").parquet(tombDir)

  /** The tombstoned ids, or None when nothing was ever removed (the
    * common case — readers skip the anti-join entirely, so an index
    * with no deletes pays zero overhead for supporting them).
    */
  def readTombstones(spark: SparkSession,
                     tombDir: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(tombDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(p.toString)) else None
  }

  /** Drop tombstoned rows from `df` (no-op when no tombstones exist). */
  def dropTombstoned(df: DataFrame, idCol: String,
                     tombDir: String): DataFrame =
    readTombstones(df.sparkSession, tombDir) match {
      case Some(t) =>
        df.join(t.withColumnRenamed(t.columns.head, idCol), Seq(idCol),
          "left_anti")
      case None => df
    }

  /** Rewrite a parquet directory in place: read, `transform`, cluster by
    * `partCol` (when given) and write partitioned, then atomically swap
    * the rewritten layout for the old one. A transform that empties the
    * table falls back to the readable-empty unpartitioned form (a
    * zero-row partitioned write would leave no schema-bearing files).
    * No-op when the directory does not exist.
    */
  def rewriteInPlace(spark: SparkSession, dir: String,
                     partCol: Option[String],
                     transform: DataFrame => DataFrame = identity): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return
    writeSwap(spark, dir, transform(spark.read.parquet(dir)), partCol)
  }

  /** Materialize `df` fully into `dir + ".compact.tmp"`, then swap it in
    * for `dir`. Safe when `df` READS from `dir` (the segment-merge case:
    * the union of base + segments replaces the base) — the rewrite is
    * complete before the old layout is touched, so a crash before the
    * swap leaves the index intact and a crash between delete and rename
    * is recoverable from tmp. Clusters by `partCol` when given and the
    * frame is non-empty (a zero-row partitioned write would leave no
    * schema-bearing files — the readable-empty fallback is
    * unpartitioned, matching the index writers).
    */
  def writeSwap(spark: SparkSession, dir: String, df: DataFrame,
                partCol: Option[String]): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(dir + ".compact.tmp")
    fs.delete(tmp, true)
    partCol match {
      case Some(c) if !df.isEmpty =>
        df.repartition(col(c)).write.mode("overwrite")
          .partitionBy(c).parquet(tmp.toString)
      case _ =>
        df.write.mode("overwrite").parquet(tmp.toString)
    }
    fs.delete(p, true)
    fs.rename(tmp, p)
  }

  /** The streaming-segment directories of a layout, sorted by batch id:
    * `$path/segments/batch=<id>`, each an immutable mini-index written by
    * a `foreachBatch` fold with per-batch overwrite (a retried batch
    * replaces its OWN segment — exactly-once for replayable sources,
    * the same convergence argument as the incremental-dedup sinks).
    */
  def segmentDirs(spark: SparkSession, path: String): Seq[String] =
    segmentDirsAt(spark, s"$path/segments")

  /** [[segmentDirs]] for an explicit segment root — the IVF family keeps
    * segments in the SIBLING `$path.segments` (the index path is itself
    * the cell-partitioned directory; a subdir inside it would break
    * partition discovery — the `$path.tombstones` convention).
    */
  def segmentDirsAt(spark: SparkSession, segRoot: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(segRoot)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
      .sortBy(st => st.getPath.getName.stripPrefix("batch=").toLong)
      .map(_.getPath.toString)
  }

  /** Delete a layout's segment directories (after compaction folded them
    * into the base).
    */
  def clearSegments(spark: SparkSession, path: String): Unit =
    clearSegmentsAt(spark, s"$path/segments")

  /** [[clearSegments]] for an explicit segment root. */
  def clearSegmentsAt(spark: SparkSession, segRoot: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(segRoot)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
  }

  /** The existing per-layout `<sub>` directories a multi-layout read
    * spans: the base `$path/<sub>` (when present) plus each streaming
    * segment's `$path/segments/batch=<id>/<sub>`.
    */
  def existingParts(spark: SparkSession, path: String,
                    sub: String): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    (path +: segmentDirs(spark, path)).map(p => s"$p/$sub")
      .filter { d =>
        val hp = new org.apache.hadoop.fs.Path(d)
        hp.getFileSystem(conf).exists(hp)
      }
  }

  /** Remove the tombstone sidecar (after compaction materialized it). */
  def clearTombstones(spark: SparkSession, tombDir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(tombDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
  }

  /** Parquet data-file count under `dir` (recursive) — what compaction
    * bounds; asserted in the layout specs.
    */
  def dataFileCount(spark: SparkSession, dir: String): Int = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return 0
    val it = fs.listFiles(p, true)
    var n = 0
    while (it.hasNext) {
      if (it.next().getPath.getName.endsWith(".parquet")) n += 1
    }
    n
  }
}
