package graft

import graft.operators.IndexLayout
import org.apache.spark.sql.functions._

/** Version-pointer swap semantics (the object-store-safe compaction
  * primitive): a swap writes the FULL new layout to a sibling version
  * directory first and flips a tiny manifest last, so a reader resolving
  * through [[IndexLayout.resolve]] never observes a missing or partial
  * table — before the flip it reads the old version, after it the new.
  * The kill-the-compactor cases pin exactly the crash windows
  * delete-then-rename could not survive on GCS/S3.
  */
class IndexLayoutSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val base = java.nio.file.Files.createTempDirectory(tag).toString
    s"$base/table"
  }

  private def rows(dir: String): Set[Long] =
    spark.read.parquet(IndexLayout.resolve(spark, dir))
      .select("id").collect().map(_.getLong(0)).toSet

  test("writeSwap versions the layout: new data after, plain dir gone, resolve follows") {
    val dir = freshDir("ixl_swap")
    Seq(1L, 2L, 3L).toDF("id").write.parquet(dir)
    assert(IndexLayout.currentVersion(spark, dir).isEmpty)
    assert(rows(dir) == Set(1L, 2L, 3L))
    IndexLayout.writeSwap(spark, dir, Seq(4L, 5L).toDF("id"), None)
    assert(IndexLayout.currentVersion(spark, dir) == Some(1))
    assert(rows(dir) == Set(4L, 5L))
    // the plain directory was garbage-collected after the flip
    assert(!new java.io.File(dir).exists())
    // second swap: v2 becomes current, v1 collected
    IndexLayout.writeSwap(spark, dir, Seq(6L).toDF("id"), None)
    assert(IndexLayout.currentVersion(spark, dir) == Some(2))
    assert(rows(dir) == Set(6L))
    assert(!new java.io.File(s"$dir.v1").exists())
  }

  test("kill before the flip: readers still answer from the old version") {
    val dir = freshDir("ixl_kill")
    Seq(1L, 2L).toDF("id").write.parquet(dir)
    // compactor dies AFTER the new layout is complete, BEFORE the flip
    val n = IndexLayout.prepareVersion(spark, dir, Seq(9L).toDF("id"), None)
    assert(new java.io.File(s"$dir.v$n").exists())
    assert(rows(dir) == Set(1L, 2L), "reader must still see the old layout")
    // ...and the flip retargets atomically
    IndexLayout.flipVersion(spark, dir, n)
    assert(rows(dir) == Set(9L))
    // a re-run after a pre-flip crash garbage-collects the orphan: plant
    // one, swap again, and only the new current version remains
    val orphan = IndexLayout.prepareVersion(spark, dir, Seq(7L).toDF("id"), None)
    assert(rows(dir) == Set(9L))
    IndexLayout.writeSwap(spark, dir, Seq(8L).toDF("id"), None)
    assert(rows(dir) == Set(8L))
    assert(!new java.io.File(s"$dir.v$orphan").exists())
  }

  test("partitioned swaps keep partition pruning through the version indirection") {
    val dir = freshDir("ixl_part")
    Seq((1L, 0), (2L, 1), (3L, 0)).toDF("id", "shard")
      .write.partitionBy("shard").parquet(dir)
    IndexLayout.writeSwap(spark, dir,
      Seq((4L, 0), (5L, 1)).toDF("id", "shard"), Some("shard"))
    assert(IndexLayout.partitionedLayout(spark, dir, "shard"))
    val scan = spark.read.parquet(IndexLayout.resolve(spark, dir))
      .filter(col("shard") === 1)
    assert(scan.select("id").collect().map(_.getLong(0)).toSeq == Seq(5L))
    val plan = scan.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[.*shard".r.findFirstIn(plan).isDefined,
      plan.take(2000))
  }

  test("clearVersions resets to the plain layout for fresh rebuilds") {
    val dir = freshDir("ixl_reset")
    Seq(1L).toDF("id").write.parquet(dir)
    IndexLayout.writeSwap(spark, dir, Seq(2L).toDF("id"), None)
    assert(IndexLayout.currentVersion(spark, dir) == Some(1))
    IndexLayout.clearVersions(spark, dir)
    assert(IndexLayout.currentVersion(spark, dir).isEmpty)
    // the fresh build's plain overwrite is now unshadowed
    Seq(3L).toDF("id").write.parquet(dir)
    assert(rows(dir) == Set(3L))
    assert(!new java.io.File(s"$dir.v1").exists())
  }

  test("a corrupt manifest is loud, never a silent fallback to stale data") {
    val dir = freshDir("ixl_corrupt")
    Seq(1L).toDF("id").write.parquet(dir)
    val w = new java.io.PrintWriter(s"$dir._CURRENT", "UTF-8")
    try w.print("not-a-number") finally w.close()
    intercept[IllegalArgumentException] { IndexLayout.resolve(spark, dir) }
  }

  test("tombstone file snapshot: a removal landing mid-compaction survives and still filters") {
    val base = java.nio.file.Files.createTempDirectory("ixl_tomb").toString
    val tomb = s"$base/tombstones"
    IndexLayout.appendTombstones(Seq(1L).toDF("id"), "id", tomb)
    // the compactor snapshots the sidecar's files...
    val snapshot = IndexLayout.tombstoneFiles(spark, tomb)
    assert(snapshot.nonEmpty)
    // ...then a removal lands while it folds
    IndexLayout.appendTombstones(Seq(2L).toDF("id"), "id", tomb)
    // the fold materializes EXACTLY the snapshot and clears exactly it
    val data = Seq(1L, 2L, 3L).toDF("id")
    val folded = IndexLayout.dropTombstonedFiles(data, "id", snapshot)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(folded == Set(2L, 3L), "snapshot fold drops only id 1")
    IndexLayout.clearTombstoneFiles(spark, snapshot)
    // the late tombstone survives the clear and still filters reads
    assert(IndexLayout.tombstoneFiles(spark, tomb).nonEmpty)
    val after = IndexLayout.dropTombstoned(data, "id", tomb)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(after == Set(1L, 3L), "late tombstone (id 2) must keep filtering")
    // a sidecar whose files were all cleared reads as no tombstones even
    // though the directory remains
    IndexLayout.clearTombstoneFiles(spark,
      IndexLayout.tombstoneFiles(spark, tomb))
    assert(IndexLayout.readTombstones(spark, tomb).isEmpty)
    assert(IndexLayout.dropTombstoned(data, "id", tomb)
      .count() == 3)
  }

  test("clearSegmentDirs deletes exactly the snapshot, not the segment root") {
    val base = java.nio.file.Files.createTempDirectory("ixl_segs").toString
    Seq(1L).toDF("id").write.parquet(s"$base/segments/batch=0")
    Seq(2L).toDF("id").write.parquet(s"$base/segments/batch=1")
    val snapshot = IndexLayout.segmentDirs(spark, base)
    assert(snapshot.size == 2)
    // a segment arrives after the snapshot was taken
    Seq(3L).toDF("id").write.parquet(s"$base/segments/batch=2")
    IndexLayout.clearSegmentDirs(spark, snapshot)
    val left = IndexLayout.segmentDirs(spark, base)
    assert(left.size == 1 && left.head.endsWith("batch=2"))
  }
}
