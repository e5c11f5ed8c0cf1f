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

  test("writeSwap versions the layout with N-1 retention: the previous layout survives exactly one more swap") {
    val dir = freshDir("ixl_swap")
    Seq(1L, 2L, 3L).toDF("id").write.parquet(dir)
    assert(IndexLayout.currentVersion(spark, dir).isEmpty)
    assert(rows(dir) == Set(1L, 2L, 3L))
    IndexLayout.writeSwap(spark, dir, Seq(4L, 5L).toDF("id"), None)
    assert(IndexLayout.currentVersion(spark, dir) == Some(1))
    assert(rows(dir) == Set(4L, 5L))
    // N-1 retention: the plain directory (current until this flip) is
    // kept one more swap for readers mid-scan on it
    assert(new java.io.File(dir).exists())
    // second swap: v2 current, the plain dir (two swaps old) collected,
    // v1 (previous current) retained
    IndexLayout.writeSwap(spark, dir, Seq(6L).toDF("id"), None)
    assert(IndexLayout.currentVersion(spark, dir) == Some(2))
    assert(rows(dir) == Set(6L))
    assert(!new java.io.File(dir).exists())
    assert(new java.io.File(s"$dir.v1").exists())
    // third swap: v1 collected, v2 retained
    IndexLayout.writeSwap(spark, dir, Seq(7L).toDF("id"), None)
    assert(rows(dir) == Set(7L))
    assert(!new java.io.File(s"$dir.v1").exists())
    assert(new java.io.File(s"$dir.v2").exists())
  }

  test("N-1 retention: a reader mid-scan on the current version completes across a swap") {
    val dir = freshDir("ixl_inflight")
    Seq(1L, 2L).toDF("id").write.parquet(dir)
    IndexLayout.writeSwap(spark, dir, Seq(3L, 4L).toDF("id"), None)
    // the reader resolves the CURRENT version (v1) and holds its plan —
    // the minutes-long 100 TB scan in miniature
    val inFlight = spark.read.parquet(IndexLayout.resolve(spark, dir))
    // a compaction lands mid-scan
    IndexLayout.writeSwap(spark, dir, Seq(5L).toDF("id"), None)
    assert(rows(dir) == Set(5L), "new readers see the new version")
    // the in-flight read still answers from its resolved v1 files
    assert(inFlight.select("id").collect().map(_.getLong(0)).toSet
      == Set(3L, 4L))
  }

  test("snapshot pins: a pinned version survives any number of swaps; unpin releases it to the next GC") {
    val dir = freshDir("ixl_pin")
    Seq(1L).toDF("id").write.parquet(dir)
    IndexLayout.writeSwap(spark, dir, Seq(2L).toDF("id"), None)
    // a slow reader pins the layout it resolved (v1) before a long scan
    val token = IndexLayout.pinCurrent(spark, dir)
    val snapshot = IndexLayout.resolve(spark, dir)
    val reader = spark.read.parquet(snapshot)
    // THREE compactions land — far beyond the N-1 retention window
    IndexLayout.writeSwap(spark, dir, Seq(3L).toDF("id"), None)
    IndexLayout.writeSwap(spark, dir, Seq(4L).toDF("id"), None)
    IndexLayout.writeSwap(spark, dir, Seq(5L).toDF("id"), None)
    assert(rows(dir) == Set(5L), "new readers follow the flips")
    assert(new java.io.File(snapshot).exists(), "pinned v1 must survive")
    assert(reader.select("id").collect().map(_.getLong(0)).toSet == Set(2L))
    // unpin: the snapshot becomes ordinary retention state and the next
    // swap collects it
    IndexLayout.unpin(spark, dir, token)
    IndexLayout.writeSwap(spark, dir, Seq(6L).toDF("id"), None)
    assert(!new java.io.File(snapshot).exists(), "released pin must GC")
    assert(rows(dir) == Set(6L))
    // pinning a PLAIN (unversioned) layout holds the plain dir the same way
    val plain = freshDir("ixl_pinplain")
    Seq(7L).toDF("id").write.parquet(plain)
    val t2 = IndexLayout.pinCurrent(spark, plain)
    IndexLayout.writeSwap(spark, plain, Seq(8L).toDF("id"), None)
    IndexLayout.writeSwap(spark, plain, Seq(9L).toDF("id"), None)
    assert(new java.io.File(plain).exists(), "pinned plain dir survives")
    IndexLayout.unpin(spark, plain, t2)
    IndexLayout.writeSwap(spark, plain, Seq(10L).toDF("id"), None)
    assert(!new java.io.File(plain).exists())
    assert(rows(plain) == Set(10L))
  }

  test("resolve tolerates the manifest flip window: marker present, manifest absent → highest version") {
    val dir = freshDir("ixl_window")
    Seq(1L).toDF("id").write.parquet(dir)
    IndexLayout.writeSwap(spark, dir, Seq(2L).toDF("id"), None)
    IndexLayout.writeSwap(spark, dir, Seq(3L).toDF("id"), None)
    // simulate the object-store rename window / a lost manifest: the
    // _CURRENT file vanishes between a reader's two accesses
    assert(new java.io.File(s"$dir._CURRENT").delete())
    assert(rows(dir) == Set(3L),
      "marker-led fallback must pick the highest (complete) version")
    // …whereas a PLAIN layout with a half-prepared version sibling (a
    // first compaction mid-prepare, marker not yet written) must keep
    // resolving to the plain dir, never the in-progress sibling
    val plain = freshDir("ixl_plainprep")
    Seq(7L).toDF("id").write.parquet(plain)
    IndexLayout.prepareVersion(spark, plain, Seq(8L).toDF("id"), None)
    assert(rows(plain) == Set(7L))
  }

  test("a swap after manifest loss spares the version readers are resolving to") {
    val dir = freshDir("ixl_lostflip")
    Seq(1L).toDF("id").write.parquet(dir)
    IndexLayout.writeSwap(spark, dir, Seq(2L).toDF("id"), None)
    IndexLayout.writeSwap(spark, dir, Seq(3L).toDF("id"), None)
    // manifest lost (corruption / object-store mishap): readers fall back
    // to the highest version (v2) via the marker
    assert(new java.io.File(s"$dir._CURRENT").delete())
    val reader = spark.read.parquet(IndexLayout.resolve(spark, dir))
    // a compaction lands on the degraded table: its GC must treat v2 as
    // the spared previous layout — exactly what readers resolved — not
    // see "no manifest" and collect every version but the new one
    IndexLayout.writeSwap(spark, dir, Seq(4L).toDF("id"), None)
    assert(rows(dir) == Set(4L))
    assert(new java.io.File(s"$dir.v2").exists(), "reader-visible v2 spared")
    assert(reader.select("id").collect().map(_.getLong(0)).toSet == Set(3L))
  }

  test("assertAppendVisible fails loudly when a compaction flip raced a direct append") {
    val dir = freshDir("ixl_appendrace")
    Seq(1L).toDF("id").write.parquet(dir)
    val target = IndexLayout.resolve(spark, dir)
    Seq(2L).toDF("id").write.mode("append").parquet(target)
    // no flip: the append is visible
    IndexLayout.assertAppendVisible(spark, dir, target)
    // a compaction flips mid-append: the guard throws instead of
    // stranding the rows in a retired layout
    IndexLayout.writeSwap(spark, dir, Seq(9L).toDF("id"), None)
    val e = intercept[IllegalArgumentException] {
      IndexLayout.assertAppendVisible(spark, dir, target)
    }
    assert(e.getMessage.contains("concurrent compaction"))
  }

  test("hasRows is false for a directory holding no parquet data files") {
    val dir = freshDir("ixl_nofooter")
    assert(new java.io.File(dir).mkdirs())
    assert(new java.io.File(s"$dir/_SUCCESS").createNewFile())
    assert(!IndexLayout.hasRows(spark, dir),
      "a footerless directory is NOT rows — and must not throw")
    Seq(1L).toDF("id").write.mode("overwrite").parquet(dir)
    assert(IndexLayout.hasRows(spark, dir))
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
    // the versioned marker is gone too — resolve is back to plain rules
    assert(!new java.io.File(s"$dir._VERSIONED").exists())
    // the fresh build's plain overwrite is now unshadowed (overwrite:
    // under N-1 retention the plain dir may survive a first swap, which
    // is why every fresh-build caller writes mode("overwrite"))
    Seq(3L).toDF("id").write.mode("overwrite").parquet(dir)
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

  test("multi-layout reads probe O(1) version manifests regardless of segment count") {
    import graft.operators.Bm25
    // segments are never versioned (plain per-batch overwrites), so a
    // read that resolves a manifest PER SEGMENT is O(segments) driver FS
    // round-trips — object-store API calls — per query for nothing (the
    // round-7 q231 regression). Pin: growing the segment count must not
    // grow the manifest-probe count of a retrieval.
    val docs = Seq((1L, "alpha beta gamma"), (2L, "beta delta"),
      (3L, "gamma epsilon zeta"), (4L, "alpha zeta"))
      .toDF("doc_id", "text")
    def probesWithSegments(nSegs: Int): Long = {
      val dir = s"${java.nio.file.Files.createTempDirectory("ixl_probes")}/ix"
      Bm25.writeIndex(docs, "doc_id", "text", dir)
      (0 until nSegs).foreach { b =>
        Bm25.writeIndex(docs.withColumn("doc_id", col("doc_id") + lit(100L * (b + 1))),
          "doc_id", "text", s"$dir/segments/batch=$b", sharded = false)
      }
      val before = IndexLayout.manifestProbes.get()
      Bm25.topKIndexed(spark, dir, "doc_id", Seq("q" -> "alpha gamma"), k = 3)
        .count()
      IndexLayout.manifestProbes.get() - before
    }
    val two = probesWithSegments(2)
    val six = probesWithSegments(6)
    assert(six == two,
      s"manifest probes grew with segment count: $two @2 segs vs $six @6 segs")
  }

  test("manifest-loss fallback never serves a crashed-prepare partial: highest COMMITTED version wins") {
    val dir = freshDir("ixl_partial")
    Seq(1L).toDF("id").write.parquet(dir)
    IndexLayout.writeSwap(spark, dir, Seq(2L).toDF("id"), None)
    IndexLayout.writeSwap(spark, dir, Seq(3L).toDF("id"), None)
    // a compactor killed mid-prepare leaves a PARTIAL v3: data files may
    // exist but the completion marker was never stamped
    Seq(99L).toDF("id").write.parquet(s"$dir.v3")
    assert(!new java.io.File(s"$dir.v3/${IndexLayout.CommittedMarker}").exists())
    // manifest lost: fallback must serve v2 (complete), never the partial
    assert(new java.io.File(s"$dir._CURRENT").delete())
    assert(rows(dir) == Set(3L),
      "fallback must skip the markerless partial and serve v2")
    val reader = spark.read.parquet(IndexLayout.resolve(spark, dir))
    // the next swap's GC must spare v2 (what readers resolved) and is
    // free to collect the partial orphan — never the other way round
    IndexLayout.writeSwap(spark, dir, Seq(4L).toDF("id"), None)
    assert(rows(dir) == Set(4L))
    assert(new java.io.File(s"$dir.v2").exists(),
      "reader-visible complete version spared")
    assert(!new java.io.File(s"$dir.v3").exists(), "partial orphan GC'd")
    assert(reader.select("id").collect().map(_.getLong(0)).toSet == Set(3L))
  }

  test("pinCurrent during manifest loss pins the version readers resolve, not the plain dir") {
    val dir = freshDir("ixl_pinloss")
    Seq(1L).toDF("id").write.parquet(dir)
    IndexLayout.writeSwap(spark, dir, Seq(2L).toDF("id"), None)
    IndexLayout.writeSwap(spark, dir, Seq(3L).toDF("id"), None)
    // manifest lost: readers fall back to v2; the pin taken at the same
    // moment must protect THAT snapshot (getOrElse(0) would pin the
    // nonexistent plain dir and GC would delete v2 under the held pin)
    assert(new java.io.File(s"$dir._CURRENT").delete())
    val token = IndexLayout.pinCurrent(spark, dir)
    val snapshot = IndexLayout.resolve(spark, dir)
    assert(snapshot.endsWith(".v2"))
    assert(IndexLayout.listPins(spark, dir).map(_._1) == Seq(2))
    IndexLayout.writeSwap(spark, dir, Seq(4L).toDF("id"), None)
    IndexLayout.writeSwap(spark, dir, Seq(5L).toDF("id"), None)
    IndexLayout.writeSwap(spark, dir, Seq(6L).toDF("id"), None)
    assert(new java.io.File(snapshot).exists(),
      "pinned fallback version survives the storm")
    assert(spark.read.parquet(snapshot).select("id")
      .collect().map(_.getLong(0)).toSet == Set(3L))
    IndexLayout.unpin(spark, dir, token)
    IndexLayout.writeSwap(spark, dir, Seq(7L).toDF("id"), None)
    assert(!new java.io.File(snapshot).exists())
  }

  test("listPins reports (version, token, age) for leak triage; withPin pairs pin/scan/unpin and releases on failure") {
    val dir = freshDir("ixl_pinops")
    Seq(1L).toDF("id").write.parquet(dir)
    IndexLayout.writeSwap(spark, dir, Seq(2L).toDF("id"), None)
    assert(IndexLayout.listPins(spark, dir).isEmpty)
    val t1 = IndexLayout.pinCurrent(spark, dir)
    val pins = IndexLayout.listPins(spark, dir)
    assert(pins.map(p => (p._1, p._2)) == Seq((1, t1)))
    assert(pins.head._3 >= 0L)
    // the operator recovery for a pin leaked by a crashed reader is
    // listPins (find it) + unpin (clear it)
    IndexLayout.unpin(spark, dir, t1)
    assert(IndexLayout.listPins(spark, dir).isEmpty)
    // withPin: body gets the CONCRETE pinned data dir, pin released after
    val got = IndexLayout.withPin(spark, dir) { pinned =>
      assert(pinned.endsWith(".v1"))
      assert(IndexLayout.listPins(spark, dir).map(_._1) == Seq(1))
      spark.read.parquet(pinned).count()
    }
    assert(got == 1L)
    assert(IndexLayout.listPins(spark, dir).isEmpty, "released on success")
    intercept[RuntimeException] {
      IndexLayout.withPin(spark, dir)(_ => throw new RuntimeException("scan died"))
    }
    assert(IndexLayout.listPins(spark, dir).isEmpty, "released on failure")
  }

  test("single-maintainer lease: second maintainer fails loudly naming the holder; release recovers; withLease releases on failure") {
    val base = java.nio.file.Files.createTempDirectory("ixl_lease").toString
    val path = s"$base/index"
    // build BEFORE taking the lease: rebuilds are themselves leased now
    import spark.implicits._
    graft.operators.Bm25.writeIndex(
      Seq((1L, "alpha beta")).toDF("doc_id", "text"), "doc_id", "text", path)
    IndexLayout.acquireLease(spark, path, "compactor-A")
    val e = intercept[IllegalStateException] {
      IndexLayout.acquireLease(spark, path, "compactor-B")
    }
    assert(e.getMessage.contains("already held"))
    assert(e.getMessage.contains("compactor-A"))
    assert(IndexLayout.leaseHolder(spark, path).exists(_.contains("compactor-A")))
    // EVERY maintenance entry point refuses under the held lease — the
    // two-concurrent-maintainers interleave lands here, loudly, instead
    // of double-flipping versions and clearing each other's snapshots:
    // compaction, removal, APPEND (its stats swap carries tomb_dirs
    // forward, so an unleased append racing a removal's commit would
    // swap the removal's batch back OUT of the listed set — the
    // resurrection lost-update), and REBUILD (its clears would delete
    // _CURRENT/_VERSIONED out from under a running compactor, whose
    // flip then shadows the fresh build with a stale manifest)
    intercept[IllegalStateException] {
      graft.operators.Bm25.compactIndex(spark, path)
    }
    intercept[IllegalStateException] {
      graft.operators.Bm25.removeFromIndex(Seq(1L).toDF("doc_id"), "doc_id", path)
    }
    intercept[IllegalStateException] {
      graft.operators.Bm25.appendToIndex(
        Seq((2L, "gamma")).toDF("doc_id", "text"), "doc_id", "text", path)
    }
    intercept[IllegalStateException] {
      graft.operators.Bm25.writeIndex(
        Seq((3L, "delta")).toDF("doc_id", "text"), "doc_id", "text", path)
    }
    // crash recovery: operator verifies the holder is dead, releases
    IndexLayout.releaseLease(spark, path)
    assert(IndexLayout.leaseHolder(spark, path).isEmpty)
    graft.operators.Bm25.compactIndex(spark, path) // now succeeds
    // withLease must release on a thrown body — the index stays
    // maintainable after a failed (but not crashed) compaction
    intercept[RuntimeException] {
      IndexLayout.withLease(spark, path, "bad-op")(
        throw new RuntimeException("fold died"))
    }
    IndexLayout.withLease(spark, path, "ok-op")(())
    assert(IndexLayout.leaseHolder(spark, path).isEmpty)
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

  test("folded segments get N-1 retention: files survive one fold, the next fold retires them") {
    val base = java.nio.file.Files.createTempDirectory("ixl_ret").toString
    val segRoot = s"$base/segments"
    Seq(1L).toDF("id").write.parquet(s"$segRoot/batch=0")
    Seq(2L).toDF("id").write.parquet(s"$segRoot/batch=1")
    val snap1 = IndexLayout.segmentDirsAt(spark, segRoot)
    assert(snap1.size == 2)
    // fold 1 RETIRES (marks) its snapshot instead of deleting it: a
    // reader that listed segments just before the fold keeps its files
    IndexLayout.retireSegmentDirs(spark, segRoot, snap1)
    // the pre-fold reader's files are still readable...
    assert(spark.read.parquet(snap1: _*).count() == 2)
    // ...but new listings skip them (their rows are in the folded base —
    // reading them again would double-count)
    assert(IndexLayout.segmentDirsAt(spark, segRoot).isEmpty)
    // a new segment lands; only IT is live
    Seq(3L).toDF("id").write.parquet(s"$segRoot/batch=2")
    val snap2 = IndexLayout.segmentDirsAt(spark, segRoot)
    assert(snap2.size == 1 && snap2.head.endsWith("batch=2"))
    // fold 2 deletes what fold 1 marked and marks its own snapshot
    IndexLayout.retireSegmentDirs(spark, segRoot, snap2)
    val fs = new org.apache.hadoop.fs.Path(segRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$segRoot/batch=0")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$segRoot/batch=1")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$segRoot/batch=2")))
    assert(IndexLayout.segmentDirsAt(spark, segRoot).isEmpty)
  }

  test("isSegmentPath anchors to the batch-dir tail") {
    assert(IndexLayout.isSegmentPath("/idx/segments/batch=3"))
    assert(IndexLayout.isSegmentPath("/idx/segments/batch=3/"))
    assert(IndexLayout.isSegmentPath("/lake/vec.segments/batch=12"))
    // a BASE index that merely lives under some other dataset's segment
    // tree must NOT be misclassified (it would skip clears and lease)
    assert(!IndexLayout.isSegmentPath("/lake/segments/batch=42/bm25"))
    assert(!IndexLayout.isSegmentPath("/idx/mysegments/batch=3"))
    assert(!IndexLayout.isSegmentPath("/idx/segments"))
  }

  test("adoptLegacyVersion restores manifest-loss fallback for pre-marker version dirs") {
    val base = java.nio.file.Files.createTempDirectory("ixl_adopt").toString
    val dir = s"$base/t"
    Seq(1L).toDF("v").write.parquet(dir)
    IndexLayout.writeSwap(spark, dir, Seq(2L).toDF("v"), None) // v1
    IndexLayout.writeSwap(spark, dir, Seq(3L).toDF("v"), None) // v2 current
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a version dir written before the completion marker
    // existed: strip v2's marker
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$dir.v2/${IndexLayout.CommittedMarker}"), false)
    // adoption stamps ONLY the manifest-current version (known complete)
    IndexLayout.adoptLegacyVersion(spark, dir)
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$dir.v2/${IndexLayout.CommittedMarker}")))
    // manifest loss after adoption: fallback serves v2, not the stale v1
    fs.delete(new org.apache.hadoop.fs.Path(dir + "._CURRENT"), false)
    assert(IndexLayout.resolve(spark, dir) == s"$dir.v2")
    assert(spark.read.parquet(IndexLayout.resolve(spark, dir))
      .head().getLong(0) == 3L)
  }
}
