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
  *   - REMOVE:  O(batch) tombstone rows — no shard is rewritten; reads
  *              anti-join them. Dedup/IVF append loose sidecar files
  *              (single-step, nothing else to keep consistent); BM25
  *              stages a batch DIRECTORY listed by its versioned stats
  *              row, so the delete set and the stats shift flip in one
  *              swap (see Bm25.removeFromIndex);
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

  private def fsOf(spark: SparkSession,
                   p: org.apache.hadoop.fs.Path): org.apache.hadoop.fs.FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  // ---------------------------------------------------------------------
  // Version-pointer indirection (object-store-safe swaps).
  //
  // A swappable table directory D is EITHER a plain parquet layout at D
  // (what the index writers emit) OR a versioned one: data at the SIBLING
  // `D.v<n>` with a tiny manifest FILE `D._CURRENT` holding `n`. All
  // operator reads and appends go through [[resolve]], so flipping the
  // manifest retargets every reader atomically. [[writeSwap]] writes the
  // full new layout to `D.v<n+1>` FIRST and flips the manifest LAST —
  // on an object store (where directory rename is copy+delete) a reader
  // never observes a missing or partial table: before the flip it reads
  // the old version, after it the new one; old versions are deleted only
  // after the flip, and a crash at any point leaves at worst an orphan
  // version directory that the next swap garbage-collects. (Siblings,
  // not `D/v=<n>` subdirs: a version subdir inside D would pollute
  // Spark's partition discovery for readers of the old layout mid-swap.)
  //
  // Two availability refinements for long scans and object stores:
  //
  //  - N-1 RETENTION: a flip deletes only layouts at least TWO swaps old
  //    — the version (or plain dir) that was current until this flip
  //    survives one more swap. A reader that resolved the old version and
  //    is mid-scan when a compaction lands keeps its parquet files until
  //    the NEXT compaction; at 100 TB, where a scan is minutes long and
  //    compaction is routine, immediate GC would delete files under every
  //    scan that straddles a swap. (One compaction-interval of grace is
  //    the standard snapshot-retention trade — readers slower than a full
  //    compaction cycle take an explicit PIN, below.)
  //
  //  - SNAPSHOT PINS: [[pinCurrent]] drops a tiny `D._PIN.v<n>.<token>`
  //    file; every flip's GC skips pinned layouts, so a pinned version
  //    survives ANY number of swaps until [[unpin]] releases it — the
  //    Iceberg-snapshot idea reduced to one marker object per pin. Pins
  //    are crash-visible state: a reader that dies without unpinning
  //    leaks retention (bounded: one layout copy per leaked pin) until
  //    an operator clears it — the deliberate trade, since auto-expiry
  //    would reintroduce exactly the delete-under-a-slow-reader race
  //    pins exist to close.
  //
  //  - FLIP-WINDOW TOLERANCE: the manifest flip is tmp + rename(OVERWRITE)
  //    — atomic on HDFS/local, but an object-store connector may
  //    implement rename as copy+delete, leaving a window where NO
  //    manifest is visible. A one-time marker FILE `D._VERSIONED`
  //    (created before the first flip, deleted only by [[clearVersions]])
  //    records that this table HAS a manifest, so [[resolve]] can tell
  //    "manifest mid-rename / lost" (marker present: re-read once, then
  //    fall back to the highest version directory — complete data by the
  //    write-before-flip invariant) from "plain layout" (no marker: the
  //    plain dir, never a half-written version sibling).
  // ---------------------------------------------------------------------

  /** The manifest's current version, or None for a plain (unversioned)
    * layout. A manifest that exists but cannot be parsed is corruption —
    * loud, never a silent fallback to stale plain data.
    */
  /** Driver-side manifest probes since JVM start — each is ≥1 filesystem
    * round-trip (an exists + maybe a read), i.e. ≥1 object-store API call
    * in production. Counted so IndexScaleProbeSpec can assert the
    * multi-layout read path stays O(1) manifest probes per sub-table as
    * the segment count grows (segments are never versioned, so resolving
    * each one was pure chatter).
    */
  private[graft] val manifestProbes = new java.util.concurrent.atomic.AtomicLong

  def currentVersion(spark: SparkSession, dir: String): Option[Int] = {
    manifestProbes.incrementAndGet()
    val m = new org.apache.hadoop.fs.Path(dir + "._CURRENT")
    val fs = fsOf(spark, m)
    if (!fs.exists(m)) None
    else {
      val in = fs.open(m)
      val raw = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                finally in.close()
      val n = raw.trim
      require(n.nonEmpty && n.forall(_.isDigit), s"corrupt manifest $m: '$raw'")
      Some(n.toInt)
    }
  }

  /** The version a reader is EFFECTIVELY served (None = the plain
    * layout): the manifest's version, or — manifest absent but the
    * `_VERSIONED` marker present (mid-rename flip window, or lost) — one
    * re-read, then the highest COMMITTED version directory. Committed
    * only: a compactor killed mid-[[prepareVersion]] leaves a partial
    * `dir.v<max>` with no completion marker, and serving it would be
    * silent partial data; every COMPLETED prepare stamps the marker
    * before the flip, so the highest committed sibling is always a full
    * layout. This single derivation is shared by [[resolve]] (what
    * readers scan), [[flipVersion]] (what GC must spare) and
    * [[pinCurrent]] (what a pin must protect) — the three MUST agree, or
    * a flip after manifest loss deletes files under the readers/pins
    * that resolved through the fallback.
    */
  private[graft] def effectiveVersion(spark: SparkSession,
                                      dir: String): Option[Int] =
    currentVersion(spark, dir).orElse {
      val marker = new org.apache.hadoop.fs.Path(dir + "._VERSIONED")
      if (!fsOf(spark, marker).exists(marker)) None
      else currentVersion(spark, dir) match { // re-read: rename window
        case s @ Some(_) => s
        case None =>
          val vs = committedVersionDirs(spark, dir)
          require(vs.nonEmpty,
            s"$dir is marked versioned but has no manifest and no " +
              "complete version directories — corrupt layout")
          Some(vs.map(_._1).max)
      }
    }

  /** The directory actually holding `dir`'s data: `dir.v<n>` when a
    * version manifest exists, `dir` itself otherwise. Every operator
    * read/append of a swappable table goes through this.
    *
    * Manifest absent but the `_VERSIONED` marker present means the
    * manifest is mid-rename (an object-store flip window) or lost: the
    * manifest is re-read once (the rename usually completes within the
    * round-trip), then the HIGHEST COMMITTED version directory is used —
    * complete by its `_GRAFT_COMMITTED` marker (a crashed-prepare
    * orphan, which has no marker, is never served), and under N-1
    * retention the highest committed is the one being (or just) flipped
    * to. A plain layout (no `_VERSIONED` marker) never consults version
    * siblings, so a reader during a FIRST compaction's prepare phase
    * cannot resolve to the in-progress `dir.v1`.
    */
  def resolve(spark: SparkSession, dir: String): String =
    effectiveVersion(spark, dir) match {
      case Some(n) => s"$dir.v$n"
      case None    => dir
    }

  /** Post-append visibility check: direct appends write into the
    * RESOLVED directory, but a compaction running concurrently snapshots
    * the old version, writes the next one, and flips — rows appended
    * after its snapshot would sit in a retired version, invisible to
    * readers while the merged stats still count them. Appenders capture
    * the resolved target BEFORE the write and call this AFTER it: a flip
    * in between fails LOUDLY (the retired version survives one more swap
    * under N-1 retention, so re-running the append loses nothing).
    *
    * The guard is a DETECTOR, not a lock: it catches every flip that
    * completes before the check runs, but a compactor that snapshotted
    * the layout before this append's files landed and flips after the
    * check still strands the rows silently. The contract therefore
    * stands: direct appends must not run concurrently with compaction —
    * streaming SEGMENTS are the concurrent-safe write path (they land
    * beside the base and compaction folds only the snapshot it listed);
    * this guard exists to make accidental violations loud in the common
    * case, not to license the combination.
    */
  def assertAppendVisible(spark: SparkSession, dir: String,
                          target: String): Unit = {
    val now = resolve(spark, dir)
    require(now == target,
      s"concurrent compaction flipped $dir during a direct append " +
        s"(target $target is no longer current: $now) — the appended " +
        "rows are in a retired version; re-run the append, or use the " +
        "segment write path for writes concurrent with compaction")
  }

  /** Pin the CURRENTLY-resolved layout of `dir` against compaction GC
    * and return the pin token. The pinned snapshot (the plain dir for an
    * unversioned table — version 0 — or the current `dir.v<n>`) survives
    * every subsequent swap until [[unpin]] releases the token; pair with
    * [[resolve]] taken at the same moment for a scan that may outlast
    * several compaction cycles. One tiny marker object per pin; pins do
    * not block compactions, only the GC of their snapshot.
    *
    * The read-version-then-write-pin race against a concurrent flip is
    * benign BECAUSE of N-1 retention: a flip landing between the two
    * steps cannot GC the version being pinned (it was current until
    * that flip, so retention spares it), and the late-landing pin then
    * protects it from the flip after that.
    */
  def pinCurrent(spark: SparkSession, dir: String): String =
    pinVersion(spark, dir, effectiveVersion(spark, dir).getOrElse(0))

  /** Drop the pin marker for an explicit version number. The version is
    * derived by [[pinCurrent]]/[[withPin]] through [[effectiveVersion]]
    * — the SAME fallback readers resolve with — so during a manifest
    * rename window or after manifest loss the pin protects exactly the
    * snapshot the paired resolve scans, never the plain dir (version 0)
    * while readers are on `dir.v<n>`.
    */
  private def pinVersion(spark: SparkSession, dir: String, v: Int): String = {
    val token = java.util.UUID.randomUUID().toString
    val p = new org.apache.hadoop.fs.Path(s"$dir._PIN.v$v.$token")
    fsOf(spark, p).create(p, true).close()
    token
  }

  /** Run `body` against a pinned snapshot of `dir`: pins the currently
    * effective version, hands `body` the pinned layout's CONCRETE data
    * directory (scan that path, not a fresh `resolve` — later flips
    * retarget resolve but cannot GC the pin), and releases the pin on
    * ALL exits, including failure. This is the supported pairing the
    * raw pin/resolve/unpin triple leaves by convention: the pinned
    * version and the scanned directory are derived from one
    * [[effectiveVersion]] read, so they cannot disagree. (A flip landing
    * between that read and the pin-marker write is benign under N-1
    * retention — see [[pinCurrent]].) Use for any read that may outlast
    * a compaction cycle: exports, full-corpus audits, retrain input
    * scans taken outside the maintenance lease.
    */
  def withPin[T](spark: SparkSession, dir: String)(body: String => T): T = {
    val (data, token) = pinResolved(spark, dir)
    try body(data)
    finally unpin(spark, dir, token)
  }

  /** [[withPin]]'s acquisition half, for callers whose pin lifetime
    * cannot be a single lexical scope (e.g. several pins taken together
    * under a short maintenance lease, then held across a long scan):
    * pins the currently effective version and returns (the pinned
    * layout's concrete data directory to scan, the token to [[unpin]]).
    * The version and the directory derive from one [[effectiveVersion]]
    * read, so they cannot disagree; the caller owns releasing the token
    * on every exit.
    */
  def pinResolved(spark: SparkSession, dir: String): (String, String) = {
    val v = effectiveVersion(spark, dir).getOrElse(0)
    val token = pinVersion(spark, dir, v)
    (if (v == 0) dir else s"$dir.v$v", token)
  }

  /** Release a [[pinCurrent]] token: the pinned layout becomes ordinary
    * retention state and the NEXT swap garbage-collects it (if it is by
    * then at least two swaps old). Unknown/already-released tokens are
    * no-ops.
    */
  def unpin(spark: SparkSession, dir: String, token: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val parent = p.getParent
    val fs = fsOf(spark, p)
    if (parent != null && fs.exists(parent)) {
      val suffix = "." + token
      fs.listStatus(parent).toSeq
        .filter(st => st.isFile &&
          st.getPath.getName.startsWith(p.getName + "._PIN.v") &&
          st.getPath.getName.endsWith(suffix))
        .foreach(st => fs.delete(st.getPath, false))
    }
  }

  /** The pins currently held on `dir`: (version, token, ageMillis) per
    * marker, oldest first. Version 0 = the plain layout. The operator
    * tool for pin hygiene: a reader that crashed without unpinning leaks
    * retention (one layout copy per leaked pin, bounded) and is
    * invisible except through this listing — `ageMillis` (marker
    * mod-time) is the triage signal, and `unpin(dir, token)` is the
    * clear. Deliberately NOT auto-expired: expiry would reintroduce the
    * delete-under-a-slow-reader race pins exist to close.
    */
  def listPins(spark: SparkSession,
               dir: String): Seq[(Int, String, Long)] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val parent = p.getParent
    val fs = fsOf(spark, p)
    if (parent == null || !fs.exists(parent)) Seq.empty
    else {
      val re = (java.util.regex.Pattern.quote(p.getName) +
        "\\._PIN\\.v(\\d+)\\.(.+)").r
      val now = System.currentTimeMillis()
      fs.listStatus(parent).toSeq.filter(_.isFile).flatMap { st =>
        st.getPath.getName match {
          case re(n, token) =>
            Some((n.toInt, token, math.max(0L, now - st.getModificationTime)))
          case _ => None
        }
      }.sortBy(-_._3)
    }
  }

  /** The version numbers currently pinned for `dir` (0 = the plain
    * layout).
    */
  private def pinnedVersions(spark: SparkSession, dir: String): Set[Int] =
    listPins(spark, dir).map(_._1).toSet

  // ---------------------------------------------------------------------
  // Single-maintainer lease. SWAP-CLASS maintenance (remove / compact /
  // re-shard / retrain) mutates shared lifecycle state that is
  // SNAPSHOTTED then CLEARED (segment lists, tombstone batches, version
  // manifests): two concurrent maintainers both compute `max+1` in
  // prepareVersion, overwrite the same `dir.v<n+1>`, double-flip, and
  // each one's snapshot clear can delete state the other never folded —
  // silent data loss. The contract is therefore ONE maintainer at a time
  // per index, enforced by a create-exclusive lease marker: the second
  // maintainer fails LOUDLY at acquisition, naming the holder.
  //
  //   - Readers never take the lease — they are isolated by version
  //     snapshots (+ pins), not locks.
  //   - Direct appends keep the cheaper assertAppendVisible detector;
  //     streaming SEGMENT writes are concurrent-safe by design and take
  //     nothing.
  //   - A maintainer that CRASHES leaves a stale lease; the next
  //     maintenance fails loudly until an operator confirms the holder
  //     is dead and runs [[releaseLease]] (runbook in PERF.md). Loud
  //     staleness is the deliberate trade — TTL auto-expiry would let a
  //     paused-but-alive compactor resume into a lease someone else now
  //     holds, which is exactly the double-maintainer corruption again.
  //   - `create(overwrite = false)` is atomic on HDFS/local and on object
  //     stores with conditional create (S3 If-None-Match, GCS
  //     if-generation-match); on a store without it this degrades to a
  //     best-effort detector — the same honesty note as
  //     assertAppendVisible.
  // ---------------------------------------------------------------------

  /** Acquire the single-maintainer lease for the index rooted at `path`
    * (marker: sibling `path._LEASE` — works for both directory-of-tables
    * layouts and partitioned-dir layouts). Throws loudly if held.
    */
  def acquireLease(spark: SparkSession, path: String, op: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path + "._LEASE")
    val fs = fsOf(spark, p)
    val parent = p.getParent
    if (parent != null && !fs.exists(parent)) fs.mkdirs(parent)
    val out =
      try fs.create(p, false)
      catch {
        case e: java.io.IOException =>
          if (fs.exists(p)) throw new IllegalStateException(
            s"maintenance lease $p is already held" +
              leaseHolder(spark, path).fold("")(h => s" by [$h]") +
              s" — refusing to run '$op' concurrently (two maintainers " +
              "can double-flip versions and clear each other's " +
              "snapshots). If the holder crashed, verify it is dead and " +
              "run IndexLayout.releaseLease to recover.")
          else throw e
      }
    // holder metadata is best-effort triage info — a failure writing it
    // must not leave the just-created marker stuck (the caller never
    // entered its try/finally, so releaseLease would never run and the
    // index would need manual recovery for a maintainer that neither
    // crashed nor is running); drop the marker and rethrow
    try {
      try out.write(
        (s"$op pid=${ProcessHandle.current().pid()} " +
          s"acquired=${java.time.Instant.now()}").getBytes("UTF-8"))
      finally out.close()
    } catch {
      case e: Throwable =>
        try fs.delete(p, false) catch { case _: Throwable => () }
        throw e
    }
  }

  /** Release the maintenance lease (also the operator recovery tool for
    * a lease leaked by a crashed maintainer). Idempotent.
    */
  def releaseLease(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path + "._LEASE")
    fsOf(spark, p).delete(p, false)
  }

  /** The current lease marker's contents (op, pid, acquisition time), or
    * None when unheld — the triage signal for a stuck maintenance.
    */
  def leaseHolder(spark: SparkSession, path: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(path + "._LEASE")
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) None
    else {
      // the marker can be released between the exists probe and the open
      // (a maintainer finishing) — a vanished lease is None, not a crash
      // in a read-only triage call
      val in =
        try fs.open(p)
        catch { case _: java.io.FileNotFoundException => return None }
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      catch { case _: java.io.IOException => Some("<unreadable>") }
      finally in.close()
    }
  }

  /** The lease marker parsed for TRIAGE — the operability twin of
    * [[listPins]]: (op, holder metadata, ageMillis), or None when
    * unheld. A crashed maintainer leaves a stale `_LEASE` that blocks
    * all further maintenance loudly; this surfaces who took it
    * (`op`), the pid/acquisition-time metadata it stamped, and how old
    * the marker is (file mod-time — the staleness signal), so the
    * operator can verify the holder is dead and run [[releaseLease]]
    * (runbook in PERF.md). Deliberately NOT auto-expired: TTL expiry
    * would re-admit the double-maintainer race the lease closes.
    */
  def listLease(spark: SparkSession,
                path: String): Option[(String, String, Long)] = {
    val p = new org.apache.hadoop.fs.Path(path + "._LEASE")
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) None
    else {
      val age =
        try math.max(0L, System.currentTimeMillis() -
          fs.getFileStatus(p).getModificationTime)
        catch { case _: java.io.IOException => 0L }
      // leaseHolder returns None if the marker was released between the
      // probes — then the lease is simply gone, not "<unreadable>"
      leaseHolder(spark, path).map { raw =>
        raw.split(" ", 2) match {
          case Array(op, holder) => (op, holder, age)
          case _                 => (raw, "", age)
        }
      }
    }
  }

  /** Run a swap-class maintenance operation under the lease, releasing
    * it on ALL exits (a thrown body must not leave the index
    * unmaintenable — only a process CRASH leaves a stale lease, which is
    * the loud-by-design case above).
    */
  def withLease[T](spark: SparkSession, path: String, op: String)
                  (body: => T): T = {
    acquireLease(spark, path, op)
    try body finally releaseLease(spark, path)
  }

  /** Step 1 of a swap, exposed for the kill-the-compactor spec: write
    * `df` fully into the NEXT version directory `dir.v<n>` (readers are
    * untouched — they still resolve to the old layout) and return n.
    */
  private[graft] def prepareVersion(spark: SparkSession, dir: String,
                                    df: DataFrame,
                                    partCol: Option[String]): Int = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = fsOf(spark, p)
    val existing = versionDirs(spark, dir).map(_._1)
    val next = (currentVersion(spark, dir).getOrElse(0) +: existing)
      .foldLeft(0)(math.max) + 1
    val target = s"$dir.v$next"
    partCol match {
      case Some(c) if !df.isEmpty =>
        // explicit partition count: a bare repartition(col) is
        // AQE-coalescible down to ONE task on a small exchange, which
        // serializes the whole partition-directory fan-out write (the
        // Bm25.writeIndexBody measurement); shuffle-partitions-many
        // tasks each own whole partition values, so the file count
        // stays O(distinct values) while the write runs in parallel
        df.repartition(spark.sessionState.conf.numShufflePartitions,
            col(c))
          .write.mode("overwrite")
          .partitionBy(c).parquet(target)
      case _ =>
        df.write.mode("overwrite").parquet(target)
    }
    // completion marker LAST: a version sibling is a fallback-resolve /
    // GC-spare candidate only once its data is fully written — a
    // compactor killed mid-write leaves a markerless partial dir that
    // readers never serve and the next swap's GC deletes. (An explicit
    // marker, not the committer's _SUCCESS, so completeness does not
    // depend on mapreduce.fileoutputcommitter configuration.) The
    // underscore prefix keeps it invisible to parquet file listing.
    val done = new org.apache.hadoop.fs.Path(s"$target/$CommittedMarker")
    fsOf(spark, done).create(done, true).close()
    next
  }

  /** File name stamped into a version directory by [[prepareVersion]]
    * once its data is completely written.
    */
  private[graft] val CommittedMarker = "_GRAFT_COMMITTED"

  /** The version siblings whose data is COMPLETE (completion marker
    * present) — the only candidates manifest-loss fallback may serve or
    * spare; [[versionDirs]] (all siblings, partial orphans included) is
    * what GC deletes from and next-version numbering maxes over.
    */
  private def committedVersionDirs(
      spark: SparkSession,
      dir: String): Seq[(Int, org.apache.hadoop.fs.Path)] =
    versionDirs(spark, dir).filter { case (_, p) =>
      val done = new org.apache.hadoop.fs.Path(p, CommittedMarker)
      fsOf(spark, p).exists(done)
    }

  /** Step 2 of a swap: atomically retarget readers to version `n` (tmp
    * manifest + overwrite-rename — one tiny object, the only mutation a
    * reader can race), then garbage-collect layouts at least two swaps
    * old. N-1 RETENTION: the layout that was current until THIS flip
    * (the plain dir on a first swap, `dir.v<old>` afterwards) is kept
    * one more swap so readers mid-scan on it complete; everything older
    * — and any crashed-prepare orphan — is deleted. A crash before the
    * flip leaves readers on the old version with an orphan `dir.v<n>`;
    * after it, on the new one.
    */
  private[graft] def flipVersion(spark: SparkSession, dir: String,
                                 n: Int): Unit = {
    // `old` (the layout N-1 retention spares) uses the SAME fallback as
    // resolve: if the manifest is lost but the marker says the table is
    // versioned, readers are resolving the highest COMMITTED version —
    // the GC must spare exactly what they read (`n`'s own dir, committed
    // by prepareVersion just before this call, is excluded so the
    // previous one is spared), not treat the table as plain and delete
    // every version but n, and never spare a crashed-prepare partial
    // while deleting the complete version under readers
    val marker0 = new org.apache.hadoop.fs.Path(dir + "._VERSIONED")
    val old = currentVersion(spark, dir).orElse {
      if (!fsOf(spark, marker0).exists(marker0)) None
      else committedVersionDirs(spark, dir).map(_._1).filter(_ != n)
        .sorted.lastOption
    }
    val m = new org.apache.hadoop.fs.Path(dir + "._CURRENT")
    val tmp = new org.apache.hadoop.fs.Path(dir + "._CURRENT.next")
    val fs = fsOf(spark, m)
    // one-time durable marker FIRST (see the resolve scaladoc): once a
    // manifest can exist, readers must never fall back to the plain dir
    // in its rename window
    val marker = new org.apache.hadoop.fs.Path(dir + "._VERSIONED")
    if (!fs.exists(marker)) fs.create(marker, true).close()
    val out = fs.create(tmp, true)
    try out.write(n.toString.getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      tmp.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, m, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    // cleanup AFTER the flip, sparing the immediately-previous layout
    // (N-1 retention for in-flight readers) and any PINNED snapshot
    // (explicit long-reader holds) — failures here are harmless orphans
    val pinned = pinnedVersions(spark, dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    if (old.isDefined && fs.exists(p) && !pinned(0)) fs.delete(p, true)
    versionDirs(spark, dir)
      .filter { case (v, _) => v != n && !old.contains(v) && !pinned(v) }
      .foreach { case (_, vp) => fs.delete(vp, true) }
  }

  /** The existing `dir.v<n>` sibling version directories. */
  private def versionDirs(spark: SparkSession,
                          dir: String): Seq[(Int, org.apache.hadoop.fs.Path)] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val parent = p.getParent
    val fs = fsOf(spark, p)
    if (parent == null || !fs.exists(parent)) Seq.empty
    else {
      val re = (java.util.regex.Pattern.quote(p.getName) + "\\.v(\\d+)").r
      fs.listStatus(parent).toSeq.filter(_.isDirectory).flatMap { st =>
        st.getPath.getName match {
          case re(n) => Some((n.toInt, st.getPath))
          case _     => None
        }
      }
    }
  }

  /** Operator migration tool: stamp the [[CommittedMarker]] onto version
    * directories that predate it. Version dirs written before the marker
    * existed are complete (every completed swap was) but indistinguishable
    * from a crashed-prepare partial, so [[effectiveVersion]]'s
    * manifest-loss fallback refuses to serve them — correct for new dirs,
    * overcautious for legacy ones. Running this once per pre-marker index
    * restores the fallback (and flip-GC sparing) for its existing
    * versions. ONLY the version the manifest currently points at is
    * stamped — it is current, therefore complete; siblings stay
    * unstamped because for THEM completeness genuinely is unknowable
    * (any of them may be a crashed prepare). No-op when there is no
    * manifest or the current version already carries the marker.
    */
  def adoptLegacyVersion(spark: SparkSession, dir: String): Unit =
    currentVersion(spark, dir).foreach { n =>
      val done = new org.apache.hadoop.fs.Path(s"$dir.v$n/$CommittedMarker")
      val fs = fsOf(spark, done)
      if (fs.exists(done.getParent) && !fs.exists(done))
        fs.create(done, true).close()
    }

  /** Reset a table to the plain (unversioned) layout: drop the manifest
    * and every version directory. Fresh index builds call this before
    * their plain overwrite write — a stale manifest from a previous
    * index's compaction must not shadow the rebuild.
    */
  def clearVersions(spark: SparkSession, dir: String): Unit = {
    val m = new org.apache.hadoop.fs.Path(dir + "._CURRENT")
    val fs = fsOf(spark, m)
    fs.delete(m, false)
    fs.delete(new org.apache.hadoop.fs.Path(dir + "._CURRENT.next"), false)
    fs.delete(new org.apache.hadoop.fs.Path(dir + "._VERSIONED"), false)
    // pins are compaction-lifecycle objects; a fresh REBUILD replaces the
    // index wholesale, so surviving pins would hold snapshots of an index
    // that no longer exists — cleared with the versions they pinned
    val p = new org.apache.hadoop.fs.Path(dir)
    val parent = p.getParent
    if (parent != null && fs.exists(parent)) {
      fs.listStatus(parent).toSeq
        .filter(st => st.isFile &&
          st.getPath.getName.startsWith(p.getName + "._PIN.v"))
        .foreach(st => fs.delete(st.getPath, false))
    }
    versionDirs(spark, dir).foreach { case (_, vp) => fs.delete(vp, true) }
  }

  /** Whether `dir` holds a partitioned parquet layout on `partCol` (any
    * `partCol=…` subdirectory) — false for the readable-empty
    * unpartitioned form the index writers emit on an empty corpus.
    * Probes the RESOLVED directory (version-aware).
    */
  def partitionedLayout(spark: SparkSession, dir: String,
                        partCol: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(resolve(spark, dir))
    val fs = fsOf(spark, p)
    fs.exists(p) && fs.listStatus(p).exists(st =>
      st.isDirectory && st.getPath.getName.startsWith(partCol + "="))
  }

  /** Whether `dir` exists and holds at least one row (limit-1 probe) —
    * distinguishes the readable-empty unpartitioned base the index
    * writers emit on an empty corpus (replaceable by an append) from a
    * NON-empty unpartitioned layout (a segment-style `sharded = false`
    * build), which is NOT a valid append target: overwriting it would
    * silently drop its rows while the stats still merge additively.
    * A directory holding no parquet data files at all (e.g. only a
    * `_SUCCESS` left by a cleaned write) counts as no rows — probing it
    * through the reader would throw `unable to infer schema` instead.
    */
  def hasRows(spark: SparkSession, dir: String): Boolean = {
    val r = resolve(spark, dir)
    val p = new org.apache.hadoop.fs.Path(r)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) return false
    val it = fs.listFiles(p, true)
    var anyData = false
    while (!anyData && it.hasNext) {
      anyData = it.next().getPath.getName.endsWith(".parquet")
    }
    anyData && !spark.read.parquet(r).isEmpty
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

  /** Shard-count marker prefix: `_NSHARDS_<n>` at an index root. */
  private val ShardCountPrefix = "_NSHARDS_"

  /** Persist a layout's shard count as a zero-byte `_NSHARDS_<n>` marker
    * file at the index ROOT — a filesystem touch, no Spark job. Writers
    * record the modulus the shard column was computed with; readers
    * derive the effective count from it instead of trusting a defaulted
    * parameter, so an index built under one default stays correctly
    * pruned when the default changes across versions (a reader filtering
    * `shard = hash mod 64` against data partitioned by `hash mod 256`
    * silently misses duplicate pairs). At the root — not inside the
    * postings dir — so compaction version swaps do not disturb it;
    * re-sharding compactions rewrite it.
    */
  def writeShardCountMarker(spark: SparkSession, root: String,
                            n: Int): Unit = {
    val rp = new org.apache.hadoop.fs.Path(root)
    val fs = rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(rp))
      fs.listStatus(rp).filter(st =>
          st.isFile && st.getPath.getName.startsWith(ShardCountPrefix))
        .foreach(st => fs.delete(st.getPath, false))
    fs.create(new org.apache.hadoop.fs.Path(rp, ShardCountPrefix + n),
      true).close()
  }

  /** The persisted shard count of an index root, if the layout recorded
    * one (pre-marker indexes return None and keep the caller's value —
    * the old contract, unchanged for them).
    */
  def readShardCountMarker(spark: SparkSession,
                           root: String): Option[Int] = {
    val rp = new org.apache.hadoop.fs.Path(root)
    val fs = rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rp)) None
    else fs.listStatus(rp).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith(ShardCountPrefix))
      .flatMap(st => scala.util.Try(
        st.getPath.getName.stripPrefix(ShardCountPrefix).toInt).toOption)
      .headOption
  }

  /** The tombstone sidecar's parquet data files at this moment — the
    * SNAPSHOT a compaction folds and later clears. Parquet part files
    * are immutable and appends only add new ones, so file granularity
    * makes the fold/clear pair exact: a tombstone batch landing DURING
    * a compaction is a file outside the snapshot — neither folded nor
    * deleted, it keeps filtering reads and the next compaction
    * materializes it.
    */
  def tombstoneFiles(spark: SparkSession, tombDir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(tombDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString)
  }

  /** The tombstoned ids, or None when nothing was ever removed (the
    * common case — readers skip the anti-join entirely, so an index
    * with no deletes pays zero overhead for supporting them). A sidecar
    * directory holding no data files (all tombstones materialized by a
    * compaction that cleared exactly its snapshot) reads as None too.
    */
  def readTombstones(spark: SparkSession,
                     tombDir: String): Option[DataFrame] = {
    val files = tombstoneFiles(spark, tombDir)
    if (files.isEmpty) None else Some(spark.read.parquet(files: _*))
  }

  /** Drop the ids held by an EXPLICIT tombstone-file snapshot from `df`
    * (no-op for an empty snapshot) — what the compactors fold, so a
    * tombstone file landing after the snapshot is untouched.
    */
  def dropTombstonedFiles(df: DataFrame, idCol: String,
                          files: Seq[String]): DataFrame =
    if (files.isEmpty) df
    else {
      val t = df.sparkSession.read.parquet(files: _*)
      df.join(t.withColumnRenamed(t.columns.head, idCol), Seq(idCol),
        "left_anti")
    }

  /** Delete EXACTLY the given tombstone files — the clear half of the
    * snapshot pair. The sidecar directory itself is left in place (a
    * later-arrived file may live there); [[readTombstones]] treats a
    * data-file-less directory as no tombstones.
    */
  def clearTombstoneFiles(spark: SparkSession, files: Seq[String]): Unit =
    files.foreach { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, false)
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
    val r = resolve(spark, dir)
    val p = new org.apache.hadoop.fs.Path(r)
    if (!fsOf(spark, p).exists(p)) return
    writeSwap(spark, dir, transform(spark.read.parquet(r)), partCol)
  }

  /** Materialize `df` fully into the next version directory `dir.v<n>`,
    * then flip the `dir._CURRENT` manifest to it (see the version-pointer
    * block above). Safe when `df` READS from the current layout (the
    * segment-merge case: the union of base + segments replaces the base)
    * — the rewrite is complete before readers are retargeted, a crash
    * before the flip leaves the old layout serving (plus an orphan the
    * next swap collects), and on object stores no directory is ever
    * renamed or deleted while current. Clusters by `partCol` when given
    * and the frame is non-empty (a zero-row partitioned write would
    * leave no schema-bearing files — the readable-empty fallback is
    * unpartitioned, matching the index writers).
    */
  def writeSwap(spark: SparkSession, dir: String, df: DataFrame,
                partCol: Option[String]): Unit =
    flipVersion(spark, dir, prepareVersion(spark, dir, df, partCol))

  /** Whether a write target is a streaming-segment mini-index path —
    * `<root>/segments/batch=<id>` (BM25/dedup) or the IVF family's
    * sibling `<root>.segments/batch=<id>`. Owned here with the rest of
    * the layout convention: segment writers skip lifecycle clears (a
    * segment carries no lifecycle state of its own) and never take the
    * maintenance lease (they are the concurrent-safe write path).
    * ANCHORED to the path tail: a segment target ends in its batch
    * directory, so a BASE index that merely lives under some other
    * dataset's `segments/batch=N/` directory is not misclassified into
    * skipping its clears and lease.
    */
  def isSegmentPath(path: String): Boolean =
    path.stripSuffix("/").matches(".*[/.]segments/batch=[^/]+")

  /** The streaming-segment directories of a layout, sorted by batch id:
    * `$path/segments/batch=<id>`, each an immutable mini-index written by
    * a `foreachBatch` fold with per-batch overwrite (a retried batch
    * replaces its OWN segment — exactly-once for replayable sources,
    * the same convergence argument as the incremental-dedup sinks).
    */
  def segmentDirs(spark: SparkSession, path: String): Seq[String] =
    segmentDirsAt(spark, s"$path/segments")

  /** Sibling marker-file suffix stamped next to a segment directory a
    * compaction has FOLDED into the base: `batch=<id>._FOLDED` under the
    * segment root. A sibling FILE, not a marker inside the dir, so one
    * `listStatus` of the root yields both dirs and fold state — the
    * per-read probe count stays exactly what it was (the q231 lesson).
    */
  private val FoldedSuffix = "._FOLDED"

  /** One listing of a segment root: (live segment dirs sorted by batch
    * id, previously-folded segment dirs). A FOLDED segment's rows live
    * in the compacted base — readers must skip it or double-read — but
    * its files are retained until the NEXT fold ([[retireSegmentDirs]]),
    * the segment analogue of version N-1 retention: a reader that listed
    * segments just before a fold landed keeps the files its scan needs.
    */
  private def segmentListing(spark: SparkSession,
                             segRoot: String): (Seq[String], Seq[String]) = {
    val p = new org.apache.hadoop.fs.Path(segRoot)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) (Seq.empty, Seq.empty)
    else {
      val st = fs.listStatus(p).toSeq
      val folded = st.filter(s =>
          s.isFile && s.getPath.getName.endsWith(FoldedSuffix))
        .map(_.getPath.getName.stripSuffix(FoldedSuffix)).toSet
      val dirs = st.filter(s =>
        s.isDirectory && s.getPath.getName.startsWith("batch="))
      val (dead, live) = dirs.partition(s => folded(s.getPath.getName))
      (live.sortBy(_.getPath.getName.stripPrefix("batch=").toLong)
         .map(_.getPath.toString),
        dead.map(_.getPath.toString))
    }
  }

  /** [[segmentDirs]] for an explicit segment root — the IVF family keeps
    * segments in the SIBLING `$path.segments` (the index path is itself
    * the cell-partitioned directory; a subdir inside it would break
    * partition discovery — the `$path.tombstones` convention). Lists the
    * LIVE segments only: a dir a previous fold marked `_FOLDED` is
    * already in the base (reading it would double-count its stats row)
    * and is awaiting retirement by the next fold.
    */
  def segmentDirsAt(spark: SparkSession, segRoot: String): Seq[String] =
    segmentListing(spark, segRoot)._1

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

  /** Delete EXACTLY the given segment directories — what a compaction
    * clears: the snapshot it folded, never the whole segment root. A
    * micro-batch that lands a new segment while compaction runs is
    * outside the snapshot, stays on disk, and remains readable (it was
    * not folded into the base, so reads stay exact).
    */
  def clearSegmentDirs(spark: SparkSession, dirs: Seq[String]): Unit =
    dirs.foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }

  /** The retire half of a fold, with N-1 RETENTION for segments: delete
    * the segment dirs (and markers) a PREVIOUS fold left `_FOLDED`, then
    * MARK this fold's snapshot as folded instead of deleting it. The
    * base data dirs already kept one swap of grace for readers mid-scan;
    * an immediately-deleted segment was the remaining hole — a reader
    * that listed segments just before the fold and scans minutes later
    * (routine at 100 TB) would lose files under a running query. With
    * the marker, that reader's files survive until the NEXT fold, while
    * new readers skip the marked dirs (their rows — and their stats
    * rows — are in the swapped base; [[segmentDirsAt]] lists live only).
    *
    * Crash semantics: a crash between the delete and the mark leaves
    * this fold's segments LIVE next to a base that already contains
    * their rows — the same already-documented window as a crash before
    * the old immediate clear: reads stay row-exact (the multi-layout
    * distinct guard), summed stats can over-count until the re-run, and
    * re-folding converges (distinct union). `segRoot` is listed fresh
    * for markers rather than trusting the caller's snapshot, so orphan
    * markers (dir already gone) are also collected.
    */
  def retireSegmentDirs(spark: SparkSession, segRoot: String,
                        folded: Seq[String]): Unit = {
    val p = new org.apache.hadoop.fs.Path(segRoot)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      fs.listStatus(p).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(FoldedSuffix))
        .foreach { m =>
          // marker FIRST, dir only if the marker delete won: a lease-free
          // streaming REPLAY of a previously-folded batch clears the
          // marker ([[clearFoldedMarker]]) and rewrites the dir as live —
          // deleting the dir on the strength of a listing taken before
          // that clear would permanently drop the replayed rows once the
          // stream checkpoint advances. delete(marker) returning false
          // means the replay's clear beat us: the dir is (becoming) live
          // again, leave it. The residual window — replay's entire
          // clear + rewrite landing between our two consecutive FS calls
          // — stays excluded by the documented contract that folds do not
          // run concurrently with replays of batches THIS fold retires
          // (an interrupted rewrite fails its micro-batch and the retry
          // converges; only a COMPLETED rewrite inside the ~ms gap loses).
          val dir = new org.apache.hadoop.fs.Path(
            p, m.getPath.getName.stripSuffix(FoldedSuffix))
          if (fs.delete(m.getPath, false)) fs.delete(dir, true)
        }
    }
    folded.foreach { d =>
      val dp = new org.apache.hadoop.fs.Path(d)
      val marker = new org.apache.hadoop.fs.Path(
        dp.getParent, dp.getName + FoldedSuffix)
      marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .create(marker, true).close()
    }
  }

  /** Drop a stale `_FOLDED` marker for one segment dir — called by every
    * segment WRITER before its per-batch overwrite. Without it, a
    * replayed micro-batch that rewrites a segment dir an offline fold
    * already marked (the fold captured the crashed write's PARTIAL rows)
    * would stay invisible and be deleted by the next fold — the rows
    * beyond the partial capture silently lost. Clearing the marker makes
    * the rewritten segment live again: reads double-scan vs the folded
    * base (row-exact under the multi-layout distinct guard; stats
    * over-count transiently, the documented crash window) and the next
    * fold re-folds it — the same convergence the immediate-delete scheme
    * had. One blind idempotent delete per micro-batch.
    */
  def clearFoldedMarker(spark: SparkSession, segDir: String): Unit = {
    val dp = new org.apache.hadoop.fs.Path(segDir.stripSuffix("/"))
    val marker = new org.apache.hadoop.fs.Path(
      dp.getParent, dp.getName + FoldedSuffix)
    marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(marker, false)
  }

  /** The tombstone sidecar's LIVE data files — [[tombstoneFiles]] minus
    * those a previous fold marked `_FOLDED` (their ids are already
    * physically dropped from the base). What folds SNAPSHOT; readers
    * keep using [[tombstoneFiles]] unchanged — anti-joining a folded
    * file's ids is a no-op against a base that no longer holds them, so
    * the read path needs no marker awareness (and pays no extra calls).
    */
  def liveTombstoneFiles(spark: SparkSession,
                         tombDir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(tombDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else {
      val st = fs.listStatus(p).toSeq.filter(_.isFile)
      val marked = st.filter(_.getPath.getName.endsWith(FoldedSuffix))
        .map(_.getPath.getName.stripSuffix(FoldedSuffix)).toSet
      st.filter(s => s.getPath.getName.endsWith(".parquet") &&
          !marked(s.getPath.getName))
        .map(_.getPath.toString)
    }
  }

  /** The retire half of a tombstone-file fold — the same N-1 grace
    * [[retireSegmentDirs]] gives segments: delete the files (and
    * markers) a PREVIOUS fold marked, then mark this fold's snapshot
    * instead of deleting it. Immediate deletion raced readers: a query
    * that snapshotted the sidecar's file list just before a fold landed
    * would lose its anti-join inputs mid-scan. A marked file keeps
    * filtering reads harmlessly (its ids are gone from the base) until
    * the NEXT fold deletes it.
    */
  def retireTombstoneFiles(spark: SparkSession, tombDir: String,
                           folded: Seq[String]): Unit = {
    val p = new org.apache.hadoop.fs.Path(tombDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      fs.listStatus(p).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(FoldedSuffix))
        .foreach { m =>
          fs.delete(new org.apache.hadoop.fs.Path(
            p, m.getPath.getName.stripSuffix(FoldedSuffix)), false)
          fs.delete(m.getPath, false)
        }
    }
    folded.foreach { f =>
      val fp = new org.apache.hadoop.fs.Path(f)
      val marker = new org.apache.hadoop.fs.Path(
        fp.getParent, fp.getName + FoldedSuffix)
      marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .create(marker, true).close()
    }
  }

  /** The existing per-layout `<sub>` directories a multi-layout read
    * spans: the base `$path/<sub>` (when present) plus each streaming
    * segment's `$path/segments/batch=<id>/<sub>`, each version-resolved.
    */
  def existingParts(spark: SparkSession, path: String,
                    sub: String): Seq[String] =
    existingPartsOf(spark, path, segmentDirs(spark, path), sub)

  /** [[existingParts]] over an EXPLICIT segment snapshot — what the
    * compactors use, so the set they fold is exactly the set they later
    * clear (a segment arriving mid-compaction is neither). Only the BASE
    * sub-table is version-resolved: segments are immutable mini-layouts
    * written by plain per-batch overwrites and are never the target of a
    * versioned compaction, so probing a manifest per segment was
    * O(segments) pure driver FS chatter per read — on an object store,
    * O(segments) API calls per query (the q231 regression).
    */
  def existingPartsOf(spark: SparkSession, path: String,
                      segs: Seq[String], sub: String): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    (resolve(spark, s"$path/$sub") +: segs.map(p => s"$p/$sub"))
      .filter { d =>
        val hp = new org.apache.hadoop.fs.Path(d)
        hp.getFileSystem(conf).exists(hp)
      }
  }

  /** [[existingParts]] split by layout class, with the base resolved
    * EXACTLY ONCE. Readers that must classify base-vs-segment (the
    * crash-duplicate anti-join guards) cannot call [[resolve]] a second
    * time to classify the listing: a concurrent compaction flipping the
    * version between the two calls would make them classify the stale
    * base path as a segment and fall into the no-dedup union branch —
    * strictly worse than the corpus `distinct()` the guard replaced.
    * Here classification IS the listing: one resolve, split by origin.
    */
  def existingPartsSplit(spark: SparkSession, path: String,
                         sub: String): (Option[String], Seq[String]) = {
    val conf = spark.sparkContext.hadoopConfiguration
    def lives(d: String): Boolean = {
      val hp = new org.apache.hadoop.fs.Path(d)
      hp.getFileSystem(conf).exists(hp)
    }
    (Some(resolve(spark, s"$path/$sub")).filter(lives),
     segmentDirs(spark, path).map(p => s"$p/$sub").filter(lives))
  }

  /** Total on-disk bytes under `dirs` — a driver-side FS metadata read
    * (no Spark job), the cheap proxy the segment-id guards use to pick
    * their join regime without paying a count action on a query path.
    */
  def dirBytes(spark: SparkSession, dirs: Seq[String]): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    dirs.map { d =>
      val hp = new org.apache.hadoop.fs.Path(d)
      val fs = hp.getFileSystem(conf)
      if (fs.exists(hp)) fs.getContentSummary(hp).getLength else 0L
    }.sum
  }

  /** Parquet bytes across live segments above which the crash-duplicate
    * guards (BqIndex.readCodes, IvfIndex.readCells) switch from a
    * broadcast anti-join on the segment id set to a shuffle anti-join.
    * The broadcast regime is the steady streaming state (segments are
    * micro-batch-sized); the cap makes the guard CODE-bounded, not
    * policy-bounded — a `streamBqIndex` caller who never compacts
    * accumulates segments until an uncapped broadcast would hurt, and
    * this regime flip (never a corpus `distinct()`) absorbs that
    * instead. Same cap-with-fallback discipline as
    * `DedupOps.ExactFpBroadcastMaxRows`; system-property override so the
    * regime-equality specs can force the fallback on a small corpus.
    */
  private[graft] def SegGuardBroadcastMaxBytes: Long =
    sys.props.get("graft.index.segGuardBroadcastMaxBytes").map(_.toLong)
      .getOrElse(256L * 1024 * 1024)

  /** The capped crash-duplicate guard shared by the segment-state reads:
    * `base ANTI-JOIN segIds ∪ segments`, broadcast under
    * [[SegGuardBroadcastMaxBytes]] of segment bytes, shuffle anti-join
    * above it. `segBytes` is the [[dirBytes]] of the live segment dirs.
    */
  private[operators] def segGuardedUnion(base: DataFrame, segments: DataFrame,
                                         idCol: String,
                                         segBytes: Long): DataFrame = {
    val segIds = segments.select(idCol)
    val guarded =
      if (segBytes <= SegGuardBroadcastMaxBytes)
        base.join(org.apache.spark.sql.functions.broadcast(segIds),
          Seq(idCol), "left_anti")
      else base.join(segIds, Seq(idCol), "left_anti")
    guarded.unionByName(segments)
  }

  /** Remove the tombstone sidecar (after compaction materialized it). */
  def clearTombstones(spark: SparkSession, tombDir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(tombDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
  }

  // ---------------------------------------------------------------------
  // Maintenance POLICY. The mechanisms above (folds, compactions,
  // retrains) are all manually invoked; at 100 TB someone must decide
  // WHEN — by measurement, not guesswork (the q236 drift audit's model:
  // measure, then act). [[maintenancePlan]] reads the listings a read
  // path already takes — live/folded segments, live tombstone batches,
  // data-file count, lease, pins — and turns them into threshold-gated
  // recommendations. It is a pure READ (no lease taken, nothing
  // mutated): the scheduler that acts on it takes the lease per action,
  // exactly as a human operator would.
  // ---------------------------------------------------------------------

  /** Thresholds for [[maintenancePlan]]. Defaults express the standard
    * trade-offs: each live segment is one more layout every read unions
    * (read amplification grows linearly — fold before it is felt); each
    * live tombstone batch is one more anti-join input (and deleted rows
    * still occupy the base — compact to reclaim); small files from
    * appends push scan task count up (compact to re-cluster); retrain
    * when the measured quantizer drift (q236's mean distance-to-assigned-
    * centroid, current model vs a retrained one) exceeds the gap in
    * basis points. `maxDataFiles` is OPT-IN (default unlimited): the
    * small-file trigger must be sized RELATIVE to the layout's
    * clustered baseline — a freshly-compacted table is already
    * O(shards × writer-parallelism) files, the TARGET state, so a fixed
    * default would re-trigger compaction on the state compaction itself
    * produces (an endless rewrite loop for a scheduler acting on the
    * plan). Pass ≈ 3–4× your layout's post-compaction file count to
    * enable it; the segment/tombstone triggers carry the common cases
    * without it (every append lands a segment or a sidecar batch).
    */
  final case class MaintenanceThresholds(
      maxLiveSegments: Int = 8,
      maxTombstoneBatches: Int = 8,
      maxDataFiles: Int = Int.MaxValue,
      maxDriftBps: Long = 1000L,
      // BQ's drift form (q241): fraction of code bits that would flip
      // under a freshly trained threshold model, in basis points — 500
      // = 5% of bits, past which Hamming pre-ranks have drifted off the
      // corpus geometry and a rebuild is due
      maxBitFlipBps: Long = 500L)

  /** What [[maintenancePlan]] measured and what it recommends.
    * `actions` is (action, reason) pairs — action ∈ {"fold", "compact",
    * "retrain"}; fold and compact both map to the family's
    * `compactIndex` (one pass folds segments AND materializes
    * tombstones), listed separately so the reason names the pressure.
    * `lease`/`pins` are operability context: a scheduler must not queue
    * an action while a (live) maintainer holds the lease, and pins
    * explain retained snapshot bytes.
    */
  final case class MaintenancePlan(
      liveSegments: Int,
      foldedAwaitingRetire: Int,
      tombstoneBatches: Int,
      dataFiles: Int,
      lease: Option[(String, String, Long)],
      pins: Int,
      actions: Seq[(String, String)]) {
    def recommends(action: String): Boolean = actions.exists(_._1 == action)
  }

  /** What one packaged audit→plan→act cycle (`IvfIndex.maintain`,
    * `IvfPq.maintain`, `BqIndex.maintain`) measured, recommended, and
    * actually DID. `acted` ⊆ {"compact", "retrain"} — empty when the
    * plan recommended nothing, or when a live maintainer held the lease
    * (the cycle then reports instead of queuing behind it; a crashed
    * holder is a manual `releaseLease` decision by design).
    */
  final case class MaintenanceOutcome(
      plan: MaintenancePlan,
      acted: Seq[String]) {
    def skippedOnLease: Boolean = acted.isEmpty && plan.lease.isDefined &&
      plan.actions.nonEmpty
  }

  /** Threshold-gated maintenance recommendations for one index layout —
    * generic over the four path conventions via explicit directories
    * (each family wraps it: `Bm25.maintenancePlan`, `BqIndex.…`, etc.):
    *
    *   - `dataDir`   — the swappable data table (version-resolved for
    *                   the file count);
    *   - `segRoot`   — the streaming-segment root (live vs `_FOLDED`);
    *   - `tombDir`   — the tombstone sidecar (live data files), OR pass
    *                   `tombstoneBatches` for the BM25 convention whose
    *                   delete batches are stats-listed directories;
    *   - `leaseRoot` — where the family's `_LEASE` marker sits.
    *
    * `drift` is the q236 audit's (currentMeanD2, retrainedMeanD2) for
    * the vector layouts — the planner cannot (and should not) run the
    * audit itself from FS metadata, so retrain is recommended only when
    * the caller supplies a measurement.
    */
  def maintenancePlan(spark: SparkSession, dataDir: String, segRoot: String,
                      tombDir: String, leaseRoot: String,
                      t: MaintenanceThresholds = MaintenanceThresholds(),
                      tombstoneBatches: Option[Int] = None,
                      drift: Option[(Long, Long)] = None,
                      bitFlipBps: Option[Long] = None): MaintenancePlan = {
    val (liveSegs, folded) = segmentListing(spark, segRoot)
    val tombs = tombstoneBatches
      .getOrElse(liveTombstoneFiles(spark, tombDir).size)
    val files = dataFileCount(spark, dataDir)
    val actions = Seq.newBuilder[(String, String)]
    if (liveSegs.size >= t.maxLiveSegments)
      actions += (("fold",
        s"${liveSegs.size} live segments >= ${t.maxLiveSegments}: every " +
          "read unions one layout per segment — fold them into the base"))
    if (tombs >= t.maxTombstoneBatches)
      actions += (("compact",
        s"$tombs live tombstone batches >= ${t.maxTombstoneBatches}: " +
          "reads anti-join each batch and deleted rows still occupy " +
          "the base — compact to materialize"))
    if (files >= t.maxDataFiles)
      actions += (("compact",
        s"$files data files >= ${t.maxDataFiles}: append-accumulated " +
          "small files inflate scan task count — compact to re-cluster"))
    drift.foreach { case (cur, retrained) =>
      if (retrained > 0 && (cur - retrained) * 10000L > retrained * t.maxDriftBps)
        actions += (("retrain",
          s"mean quantization error $cur vs $retrained after retrain " +
            s"(> ${t.maxDriftBps} bps gap): the cell structure no longer " +
            "reflects the corpus — retrainCompact"))
    }
    bitFlipBps.foreach { bps =>
      if (bps > t.maxBitFlipBps)
        actions += (("retrain",
          s"$bps bps of code bits flip under a freshly trained threshold " +
            s"model (> ${t.maxBitFlipBps} bps): Hamming pre-ranks have " +
            "drifted off the corpus geometry — rebuild (writeIndex)"))
    }
    MaintenancePlan(liveSegs.size, folded.size, tombs, files,
      listLease(spark, leaseRoot), listPins(spark, dataDir).size,
      actions.result())
  }

  /** Total parquet data-file bytes under `dir` (recursive; 0 when the
    * directory does not exist) — the probes' byte-accounting primitive.
    */
  def parquetBytes(spark: SparkSession, dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return 0L
    val it = fs.listFiles(p, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) total += f.getLen
    }
    total
  }

  /** Parquet data-file count under the RESOLVED `dir` (recursive) — what
    * compaction bounds; asserted in the layout specs.
    */
  def dataFileCount(spark: SparkSession, dir: String): Int = {
    val p = new org.apache.hadoop.fs.Path(resolve(spark, dir))
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
