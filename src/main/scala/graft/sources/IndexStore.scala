package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Persistent stored-index tables — the on-disk half of the engine's
  * 100 TB dedup/ANN design (VERDICT r7 #1).
  *
  * The scale story of the incremental dedup (d8) and PQ ANN (v6/v7)
  * operators is "compute the corpus index ONCE per snapshot, store it,
  * and have every query/increment probe the stored table". This object
  * is that store: build-once-then-reuse parquet directories keyed by
  * the source data's identity, with a meta stamp that encodes every
  * build input (params + a fingerprint of the source parquet files) so
  * a stale or partial index can never be read — the analogue of the
  * reference's checkpoint-validity discipline (simulation.R:251-275)
  * applied to the index domain.
  *
  * Layout: `$root/<md5(srcDir)>_<family>/{<tables>, _graft_meta}`. The
  * root defaults to a machine-local directory; a cluster deployment
  * points GRAFT_INDEX_DIR at durable shared storage (HDFS/S3) so the
  * index persists across jobs and the daily-increment path never
  * re-mines the corpus.
  */
object IndexStore {

  def root: String = sys.env.getOrElse("GRAFT_INDEX_DIR", "/tmp/graft_indexes")

  /** Stable on-disk identity of one index family over one source dir. */
  def indexPath(srcDir: String, family: String): String = {
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(srcDir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    s"$root/${key}_$family"
  }

  /** Snapshot fingerprint of a source file: file count + total length +
    * max mtime + an ORDER-INDEPENDENT digest of every leaf's
    * (path, len, mtime) over a RECURSIVE listing. Any regeneration of
    * the test data (or a new corpus snapshot in production) changes the
    * stamp and forces a rebuild. Recursive because a partitioned source
    * (nested `key=value/` subdirectories) rewrites its leaf files
    * without touching the top-level entries — a non-recursive listing
    * would keep an unchanged stamp and serve a stale index as valid.
    * The per-file digest (XOR of md5(path|len|mtime) — XOR so the
    * listing order, which HDFS does not guarantee, cannot move the
    * stamp) catches what the three aggregates alone miss: a renamed
    * part file, bytes redistributed between parts under a constant
    * total, and a rewrite of any file OTHER than the newest one (max
    * mtime only watches the newest). Residual, accepted: an in-place
    * rewrite that preserves a file's exact path, length AND mtime —
    * sub-second rewrites on filesystems with 1 s mtime granularity —
    * is invisible to any metadata-only stamp; catching it needs
    * content checksums, which local filesystems don't expose
    * (getFileChecksum → null) and reading 100 TB to fingerprint it
    * defeats the point of a stamp. An existing-but-empty directory
    * stamps as "empty" (it must not throw: an empty source is a
    * legitimate degenerate snapshot, and the ensure() path turns the
    * distinct stamp into a rebuild when data later appears). */
  def sourceStamp(s: SparkSession, file: String): String = {
    val p = new Path(file)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) "absent"
    else {
      val it = fs.listFiles(p, true)
      var n = 0L; var len = 0L; var mtime = Long.MinValue
      val digest = new Array[Byte](16)
      // one digest instance for the whole listing (digest() resets it):
      // this path walks 1e5-1e6 leaf files on a production corpus and
      // is recomputed per ensure() call — no per-file provider lookups
      val md = java.security.MessageDigest.getInstance("MD5")
      while (it.hasNext) {
        val f = it.next()
        n += 1; len += f.getLen
        if (f.getModificationTime > mtime) mtime = f.getModificationTime
        val h = md.digest(
          s"${f.getPath.toUri.getPath}|${f.getLen}|${f.getModificationTime}"
            .getBytes("UTF-8"))
        var i = 0
        while (i < 16) { digest(i) = (digest(i) ^ h(i)).toByte; i += 1 }
      }
      val dhex = digest.map("%02x".format(_)).mkString
      if (n == 0) "empty" else s"n=$n|len=$len|mtime=$mtime|files=$dhex"
    }
  }

  // ---- sidecar stamps for maintainer-owned (appendable) indexes ------
  // The auto-built variant's staleness lives in ensure()'s _graft_meta;
  // appendable lifecycles (init → probe → append) are owned by their
  // maintainer instead, and use a small named stamp written LAST by the
  // init and REQUIRED by every reader — a crashed or geometry-changed
  // init leaves no (or a cleared) stamp, so a probe of a half-written
  // index fails loudly instead of returning wrong results.

  def writeStamp(s: SparkSession, dir: String, name: String, value: String): Unit = {
    val p = new Path(dir, name)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(value.getBytes("UTF-8")) finally out.close()
  }

  /** Maintainer-owned stamp gate shared by the appendable index
    * families (MinHash bands, PQ codebooks, span windows, HLL
    * sketches): the stamp must EXIST (a crashed init leaves none — a
    * probe of a half-written index must fail loudly, not read garbage)
    * and must MATCH the caller's geometry exactly (mismatched
    * hash/codebook geometry silently finds nothing or decodes
    * garbage). `what` names the family in the error. */
  def requireStamp(s: SparkSession, path: String, name: String,
                   expected: String, what: String): Unit = {
    val stored = readStamp(s, path, name)
    require(stored.isDefined,
      s"no $what stamp at $path — the index was never initialized (or a " +
        "crashed init left it half-written); re-run the family's init")
    require(stored.get == expected,
      s"$what mismatch at $path: the index was built with (${stored.get}) " +
        s"but the caller expects ($expected) — a mismatched probe would " +
        "silently misread the index; pass the geometry it was initialized " +
        "with (or re-init)")
  }

  def clearStamp(s: SparkSession, dir: String, name: String): Unit = {
    val p = new Path(dir, name)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, false)
  }

  def readStamp(s: SparkSession, dir: String, name: String): Option[String] = {
    val p = new Path(dir, name)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8")) finally in.close()
    }
  }

  /** Compact one table of an appendable index: daily appends accumulate
    * one small file set per increment (the classic small-files problem —
    * at 100 TB a year of daily appends is 365 file groups, and scan
    * planning cost grows with file count). The table is rewritten
    * coalesced into a fresh VERSION directory and published atomically
    * for readers (see [[replaceTable]]). Contents are unchanged
    * (callers pin probe equality across a compaction).
    *
    * `partitionCol`: when set, the rewrite shuffles BY that column and
    * keeps the on-disk partitioning, so each partition gets its own
    * writer set (round-robin would put every partition value in every
    * task — |values| × filesPerTable files). */
  def compactTable(s: SparkSession, indexPath: String, tbl: String,
                   partitionCol: Option[String], filesPerTable: Int): Unit =
    replaceTable(s, indexPath, tbl) { (df, tmp) =>
      // repartition, not coalesce: coalesce(n) would collapse the READ
      // parallelism of the rewrite itself; the shuffle moves table-sized
      // data once, which is the point of a compaction job
      import org.apache.spark.sql.functions.{col, lit, monotonically_increasing_id, pmod, xxhash64}
      val w = partitionCol match {
        case Some(c) =>
          // files-per-VALUE control needs a salt in the shuffle key:
          // repartition(n, col(c)) alone puts every row of one partition
          // value into a single task, so partitionBy(c) writes exactly
          // one file per value no matter what n says — fine for small
          // values, a multi-GB monolith for a hot one. Salting spreads
          // each value over up to filesPerTable writer tasks.
          df.repartition(col(c),
              pmod(xxhash64(monotonically_increasing_id()), lit(filesPerTable.toLong)))
            .write.mode("overwrite").partitionBy(c)
        case None => df.repartition(filesPerTable).write.mode("overwrite")
      }
      w.parquet(tmp)
    }

  // ---- versioned atomic publication of swappable tables --------------
  // A rewrite-by-swap scheme in which readers never mutate anything:
  // each rewrite lands in a fresh `<tbl>__v<N>` directory and is
  // PUBLISHED by creating a zero-byte marker file `<tbl>__v<N>.__commit`
  // whose NAME carries the version — a single atomic namespace create,
  // so a reader either resolves the old version or the new one, never a
  // half-state. This replaces the r12 two-rename swap, whose reader-side
  // healing could race a LIVE writer (a reader landing inside the swap
  // window renamed `__old` back while the writer was about to publish —
  // the r12 advisor's medium finding): with markers, readers are pure
  // observers and a crash before the marker simply leaves the previous
  // version current.
  //
  // Retention is LAG-ONE: publishing version N deletes versions ≤ N−2,
  // so a reader that resolved N−1 just before the publish still has its
  // files while it scans; only a reader outlived by TWO full compactions
  // can lose files mid-scan (retriable, documented). A table that was
  // never rewritten stays in the legacy unversioned `<tbl>` directory —
  // appends and inits target whatever directory is current.
  //
  // Writer concurrency contract (unchanged): compaction/init are
  // maintainer-owned — never run two writers, and never race an append
  // with a compaction (an append committing into the superseded version
  // would be dropped by retention). READERS are now safe at any time.

  // Generic commit-marker versioning primitives, shared with
  // ReleaseWriter (ONE copy of the crash contract — the parse rules,
  // sweep filter and retention order must never drift between the
  // index tables and the release sink). `prefix` is the version-dir
  // name prefix under `parent` ("tbl__v" here, "v" for releases).
  private[sources] def vMarker(parent: String, prefix: String, v: Long): Path =
    new Path(parent, s"$prefix$v.__commit")

  private[sources] def vDir(parent: String, prefix: String, v: Long): String =
    s"$parent/$prefix$v"

  /** Committed versions under `parent` for `prefix`, ascending. */
  private[sources] def vCommitted(s: SparkSession, parent: String,
                                  prefix: String): Seq[Long] = {
    val fs = new Path(parent).getFileSystem(s.sparkContext.hadoopConfiguration)
    val glob = fs.globStatus(new Path(parent, s"$prefix*.__commit"))
    if (glob == null) Seq.empty
    else glob.toSeq.flatMap { st =>
      st.getPath.getName.stripPrefix(prefix).stripSuffix(".__commit").toLongOption
    }.sorted
  }

  /** Delete version DIRS whose number is not in `committed` — a crashed
    * writer's uncommitted leftovers. Markers survive the glob via the
    * isDirectory guard. */
  private[sources] def vSweepUncommitted(s: SparkSession, parent: String,
                                         prefix: String,
                                         committed: Set[Long]): Unit = {
    val fs = new Path(parent).getFileSystem(s.sparkContext.hadoopConfiguration)
    val dirs = fs.globStatus(new Path(parent, s"$prefix*"))
    if (dirs != null) dirs.foreach { st =>
      if (st.isDirectory &&
          st.getPath.getName.stripPrefix(prefix).toLongOption.exists(!committed.contains(_)))
        fs.delete(st.getPath, true)
    }
  }

  /** Lag-one retention after publishing `next`: marker deleted BEFORE
    * its dir so no reader can resolve a version mid-delete. */
  private[sources] def vRetainLagOne(s: SparkSession, parent: String,
                                     prefix: String, committed: Seq[Long],
                                     next: Long): Unit = {
    val fs = new Path(parent).getFileSystem(s.sparkContext.hadoopConfiguration)
    committed.filter(_ <= next - 2).foreach { v =>
      fs.delete(vMarker(parent, prefix, v), false)
      fs.delete(new Path(vDir(parent, prefix, v)), true)
    }
  }

  private def markerPath(indexPath: String, tbl: String, v: Long) =
    vMarker(indexPath, s"${tbl}__v", v)

  private def versionDir(indexPath: String, tbl: String, v: Long) =
    vDir(indexPath, s"${tbl}__v", v)

  /** Committed versions of `tbl`, ascending; empty = legacy layout. */
  private def committedVersions(s: SparkSession, indexPath: String,
                                tbl: String): Seq[Long] =
    vCommitted(s, indexPath, s"${tbl}__v")

  /** The directory currently holding `tbl`'s data: the highest COMMITTED
    * version, or the legacy unversioned dir when the table was never
    * rewritten. Appends into a swappable table must target this (not a
    * hardcoded `$indexPath/$tbl`) so they keep landing in the live
    * version after a compaction. */
  def tableDataPath(s: SparkSession, indexPath: String, tbl: String): String = {
    val vs = committedVersions(s, indexPath, tbl)
    if (vs.nonEmpty) versionDir(indexPath, tbl, vs.last)
    else {
      // legacy heal: a PRE-versioning crash (the old two-rename scheme)
      // can have left data only under `__old`. Safe to restore here —
      // versioned-era writers never create this state, so there is no
      // live writer to race.
      recoverTable(s, indexPath, tbl)
      s"$indexPath/$tbl"
    }
  }

  /** Reset `tbl` for an init-style overwrite: every version dir, marker
    * and legacy leftover is deleted and the legacy data path returned
    * for the caller's `mode("overwrite")` write. Maintainer-owned, same
    * contract as [[replaceTable]]. */
  def resetTablePath(s: SparkSession, indexPath: String, tbl: String): String = {
    val fs = new Path(indexPath).getFileSystem(s.sparkContext.hadoopConfiguration)
    // versions+markers, legacy-scheme leftovers AND any crashed
    // streaming batch's staging dirs — a re-init starts a clean slate
    for (pat <- Seq(s"${tbl}__v*", s"${tbl}__stage_*")) {
      val glob = fs.globStatus(new Path(indexPath, pat))
      if (glob != null) glob.foreach(st => fs.delete(st.getPath, true))
    }
    fs.delete(new Path(s"$indexPath/${tbl}__old"), true)
    fs.delete(new Path(s"$indexPath/${tbl}__compacting"), true)
    s"$indexPath/$tbl"
  }

  /** Crash-safe REWRITE of one index table: `write(current, nextDir)`
    * produces the replacement under the next version directory, then a
    * single marker-file create publishes it atomically for readers.
    * A crash before the marker leaves the previous version current and
    * its garbage is swept by the next rewrite; a crash after the marker
    * is a completed publish (retention of older versions simply re-runs
    * next time). Shared by the file-level compaction above and semantic
    * rewrites (the q30 sketch table's month-merge compaction). */
  def replaceTable(s: SparkSession, indexPath: String, tbl: String)(
      write: (org.apache.spark.sql.DataFrame, String) => Unit): Unit = {
    val fs = new Path(indexPath).getFileSystem(s.sparkContext.hadoopConfiguration)
    val committed = committedVersions(s, indexPath, tbl)
    // sweep a crashed writer's uncommitted version dirs (no marker) and
    // legacy-scheme staging leftovers
    vSweepUncommitted(s, indexPath, s"${tbl}__v", committed.toSet)
    fs.delete(new Path(s"$indexPath/${tbl}__compacting"), true)
    val cur = tableDataPath(s, indexPath, tbl) // heals pre-versioning crash state
    val next = committed.lastOption.getOrElse(0L) + 1
    write(s.read.parquet(cur), versionDir(indexPath, tbl, next))
    // publish: the zero-byte marker is created LAST and its name is the
    // commit record — create(_, overwrite=false) fails loudly if it
    // somehow exists (a second writer = broken maintainer contract)
    fs.create(markerPath(indexPath, tbl, next), false).close()
    vRetainLagOne(s, indexPath, s"${tbl}__v", committed, next)
    if (next >= 2) { // the legacy dir leaves retention at the 2nd publish
      fs.delete(new Path(s"$indexPath/$tbl"), true)
      fs.delete(new Path(s"$indexPath/${tbl}__old"), true)
    }
  }

  /** Read a table that a compaction can rewrite (dedup ids/sig/bands, PQ
    * codes, sketch months): resolves the current committed version —
    * pure observation, safe concurrently with a live [[replaceTable]]
    * (the reader sees the old version until the marker lands). */
  def readSwappable(s: SparkSession, indexPath: String,
                    tbl: String): org.apache.spark.sql.DataFrame =
    s.read.parquet(tableDataPath(s, indexPath, tbl))

  // ---- replay-safe tagged appends (streaming ingest) -----------------
  // Streaming foreachBatch replays re-deliver EXACTLY the same rows
  // under the same batchId (the checkpoint pins source offsets), so an
  // append can be made exactly-once by publishing each batch's files
  // under DETERMINISTIC per-tag names: a replay sweeps whatever a
  // previous attempt left (complete or partial) and re-publishes.
  // Shared by all four streaming ingests (sketch months, dedup
  // ids/sig/bands, span ids/spans, PQ codes). Quiesce contract: run
  // compaction only against a CLEANLY-stopped stream (last batch
  // checkpoint-committed) — a compaction absorbs tag files into
  // version files, after which a replay can no longer recognize its
  // prior attempt (the dedup/span/PQ disjointness gates then fail
  // loudly rather than double-append; the sketch family skips via its
  // absorbed-tags record).

  private def tagPrefix(tag: String) = s"graft-$tag-"

  /** EXACT tag-file match: `graft-<tag>-<ordinal>.parquet`. A bare
    * prefix test is NOT exact for the permitted tag charset — '-' is
    * legal in tags, so tag `day1`'s prefix `graft-day1-` also matches
    * tag `day1-retry`'s files, and a prefix-based sweep would silently
    * delete the other batch's committed rows. */
  private def isTagDataFile(name: String, tag: String): Boolean = {
    val p = tagPrefix(tag)
    name.startsWith(p) && name.stripPrefix(p).matches("[0-9]+\\.parquet")
  }

  /** Delete the files a previous [[publishTaggedAppend]] attempt of
    * `tag` left in `tbl`'s LIVE dir (recursive — partitioned tables
    * keep tag files inside partition subdirs). Idempotent. Call before
    * re-probing or re-publishing a replayed batch: a crashed append's
    * partial rows must not feed the probe or trip disjointness. */
  def sweepTaggedFiles(s: SparkSession, indexPath: String, tbl: String,
                       tag: String): Unit = {
    val live = new Path(tableDataPath(s, indexPath, tbl))
    val fs = live.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(live)) {
      val it = fs.listFiles(live, true)
      while (it.hasNext) {
        val f = it.next()
        if (isTagDataFile(f.getPath.getName, tag))
          fs.delete(f.getPath, false)
      }
    }
    fs.delete(new Path(s"$indexPath/${tbl}__stage_$tag"), true)
  }

  /** Fail-stop a REWOUND stream incarnation (r18): a Structured
    * Streaming replay can only be of the LATEST batch (the engine
    * re-runs at most the one batch whose commit is missing from the
    * checkpoint), so if any committed tag of the SAME incarnation
    * carries a batchId HIGHER than the current one, the current call is
    * not a replay — it is a rewound checkpoint (offsets hand-deleted
    * while keeping the metadata file that pins the query id), and
    * sweeping "its" tag would silently un-ingest a committed batch.
    * Scans the live dirs once per batch — the same listing cost the
    * sweep itself pays. Tags must be `<prefix>_b<batchId>` per
    * [[graft.streaming.StreamIdentity.batchTag]]. */
  def requireMonotonicBatch(s: SparkSession, indexPath: String,
                            tbls: Seq[String], prefix: String,
                            batchId: Long): Unit = {
    val pat = java.util.regex.Pattern.compile(
      java.util.regex.Pattern.quote(s"graft-${prefix}_b") +
        "([0-9]+)-[0-9]+\\.parquet")
    for (tbl <- tbls) {
      val live = new Path(tableDataPath(s, indexPath, tbl))
      val fs = live.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(live)) {
        val it = fs.listFiles(live, true)
        while (it.hasNext) {
          val m = pat.matcher(it.next().getPath.getName)
          if (m.matches()) {
            val seen = m.group(1).toLong
            require(seen <= batchId,
              s"stream incarnation '$prefix' already committed batch $seen " +
                s"to $indexPath/$tbl but is now presenting batch $batchId — " +
                "a rewound checkpoint would silently re-ingest committed " +
                "batches; rebuild the index or start a fresh checkpoint " +
                "(which gets a fresh query id and namespace)")
          }
        }
      }
    }
  }

  /** Publish an append under deterministic per-tag file names:
    * `write(stagingDir)` materializes the batch's rows (using the SAME
    * partitioning layout as the table), then every staged data file is
    * renamed into the live dir as `graft-<tag>-<k>.parquet` with its
    * partition subpath preserved. Always sweeps `tag`'s previous files
    * first, so calling this twice with the same (tag, data) converges —
    * the exactly-once half of the streaming ingest contract. The tag
    * must be filename-safe (enforced) so the sweep glob is exact. */
  def publishTaggedAppend(s: SparkSession, indexPath: String, tbl: String,
                          tag: String)(write: String => Unit): Unit = {
    require(tag.matches("[A-Za-z0-9_-]+"),
      s"tag '$tag' must be filename-safe ([A-Za-z0-9_-]+)")
    sweepTaggedFiles(s, indexPath, tbl, tag)
    val liveDir = tableDataPath(s, indexPath, tbl)
    val fs = new Path(indexPath).getFileSystem(s.sparkContext.hadoopConfiguration)
    val stage = s"$indexPath/${tbl}__stage_$tag"
    write(stage)
    val stagePath = new Path(stage)
    val staged = scala.collection.mutable.ArrayBuffer.empty[Path]
    val it = fs.listFiles(stagePath, true)
    while (it.hasNext) {
      val f = it.next()
      val n = f.getPath.getName
      if (!n.startsWith("_") && !n.startsWith(".")) staged += f.getPath
    }
    staged.zipWithIndex.foreach { case (src, i) =>
      // partition subpath (e.g. band=3/) preserved relative to stage
      val rel = src.getParent.toUri.getPath
        .stripPrefix(stagePath.toUri.getPath).stripPrefix("/")
      val destDir = if (rel.isEmpty) new Path(liveDir) else new Path(liveDir, rel)
      fs.mkdirs(destDir)
      require(fs.rename(src, new Path(destDir, s"${tagPrefix(tag)}$i.parquet")),
        s"tagged-append publish rename failed for $tbl tag '$tag'")
    }
    fs.delete(stagePath, true)
  }

  /** Heal PRE-VERSIONING crash state (the retired two-rename scheme
    * could crash with data only under `__old` and the live dir absent).
    * Only reachable for tables still in the legacy layout; versioned-era
    * writers never create this state, so there is no live writer to
    * race (the r12 advisor finding this scheme replaces). */
  def recoverTable(s: SparkSession, indexPath: String, tbl: String): Unit = {
    val fs = new Path(indexPath).getFileSystem(s.sparkContext.hadoopConfiguration)
    val cur = new Path(s"$indexPath/$tbl")
    val old = new Path(s"$indexPath/${tbl}__old")
    if (!fs.exists(cur) && fs.exists(old))
      require(fs.rename(old, cur), s"crash recovery rename failed for $tbl")
  }

  // per-JVM fast path: LAST meta verified on disk per path (a map, not a
  // (path, meta) set — a set would let an older meta skip the disk check
  // after a newer one rebuilt the index, serving stale tables)
  private val ensured = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Build-once-then-reuse: if `path/_graft_meta` matches `meta`, the
    * stored index is current and `build` is skipped; otherwise `build`
    * runs (writing the index tables under `path`) and the meta is
    * stamped LAST — a crashed build leaves no stamp and is retried,
    * never trusted. In-JVM calls are serialized; ACROSS JVMs an
    * advisory lock file (`_graft_build_lock`, atomic create) lets one
    * builder proceed while others wait for its meta stamp. The holder
    * HEARTBEATS the lock (mtime refresh from a daemon thread) for as
    * long as the build runs, so lock staleness means "holder crashed",
    * never "holder is slow" — without the heartbeat a healthy build
    * outlasting the stale window would invite a waiter to break the
    * LIVE lock and start a second overwrite build on the same
    * directory, the exact corruption the lock exists to prevent. A
    * crashed builder's lock stops refreshing, goes stale after 10
    * minutes, and is broken via rename-to-tombstone (exactly one of N
    * concurrent breakers' renames succeeds) followed by an mtime
    * VERIFY: a breaker that renamed a still-fresh lock — a takeover
    * winner's, slipped in between check and rename — restores it and
    * re-enters the wait; losers and unverifiable breaks also re-enter
    * the wait (when in doubt, never build). Residual exposure: a
    * second builder requires a fresh lock to be renamed away AND a
    * third waiter to tryLock inside the restore window — two nested
    * sub-millisecond interleavings on a store whose builds take
    * seconds; a shared production deployment would put a real
    * coordination service (or Hive/Iceberg commit protocol) in front
    * of this instead of accepting even that. */
  def ensure(s: SparkSession, path: String, meta: String)(build: => Unit): Unit =
    ensure(s, path, meta, lockStaleMs = 10L * 60 * 1000,
      lockWaitMs = 15L * 60 * 1000, lockPollMs = 500L)(build)

  /** Timing-injectable variant (exposed for IndexStoreSpec: the wait and
    * stale-takeover paths are untestable at production timescales).
    * `onLockBroken` runs between breaking a stale lock and attempting to
    * re-acquire it — the spec uses it to force the "another breaker won
    * the re-create race" interleaving deterministically. */
  // per-path monitors: ensure() serializes callers of the SAME path;
  // a slow build (or a 15-minute cross-JVM lock wait) on one index
  // family must not block first-time ensure() of every other family
  // in the JVM (review finding) — shared state (`ensured`) is already
  // a concurrent map, and everything else in the body is path-local
  private val pathMonitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private[graft] def ensure(s: SparkSession, path: String, meta: String,
                            lockStaleMs: Long, lockWaitMs: Long,
                            lockPollMs: Long,
                            onLockBroken: () => Unit = () => ())(build: => Unit): Unit = {
    if (ensured.get(path) == meta) return
    pathMonitors.computeIfAbsent(path, _ => new Object).synchronized {
      if (ensured.get(path) == meta) return
      val hPath = new Path(path)
      val lockPath = new Path(hPath, "_graft_build_lock")
      val fs = hPath.getFileSystem(s.sparkContext.hadoopConfiguration)
      def metaCurrent(): Boolean = readStamp(s, path, "_graft_meta").contains(meta)
      // owner token INSIDE the lock file: release deletes the lock only
      // when the content is still ours — a holder suspended past the
      // stale window (sleep, long GC) whose lock was legitimately taken
      // over must NOT delete the new holder's live lock on resume
      // (review finding). The takeover itself cannot fence the
      // suspended holder's in-flight writes; that residual exposure is
      // documented above, and the token at least stops the lock-file
      // cascade (resumed holder deletes new lock → third builder).
      val ownerToken = java.util.UUID.randomUUID().toString
      def tryLock(): Boolean =
        try {
          fs.mkdirs(hPath)
          val out = fs.create(lockPath, false)
          try out.write(ownerToken.getBytes("UTF-8")) finally out.close()
          true
        }
        catch { case _: java.io.IOException => false }
      def ownsLock(): Boolean =
        try readStamp(s, path, "_graft_build_lock").contains(ownerToken)
        catch { case _: java.io.IOException => false }
      def lockAgeMs(): Long = try {
        if (fs.exists(lockPath))
          System.currentTimeMillis() - fs.getFileStatus(lockPath).getModificationTime
        else Long.MaxValue
      } catch { case _: java.io.IOException => Long.MaxValue }
      if (metaCurrent()) { ensured.put(path, meta); return }
      val deadline = System.nanoTime() + lockWaitMs * 1000000L
      var locked = tryLock()
      while (!locked) {
        // another JVM holds the lock: wait for its stamp, or for the
        // lock to go stale (its heartbeat stopped = the holder crashed)
        var waiting = true
        while (waiting && System.nanoTime() < deadline) {
          Thread.sleep(lockPollMs)
          waiting = lockAgeMs() < lockStaleMs && !metaCurrent()
        }
        if (metaCurrent()) { ensured.put(path, meta); return }
        if (lockAgeMs() < lockStaleMs) {
          // the lock is FRESH — either its holder is alive, or another
          // waiter just completed a stale-lock takeover. Keep waiting
          // while budget remains; only an exhausted deadline on a live
          // lock is an error (never break a heartbeating builder).
          if (System.nanoTime() >= deadline)
            throw new IllegalStateException(
              s"timed out after ${lockWaitMs}ms waiting on a live index build " +
              s"lock at $lockPath — raise the wait or investigate the holder")
        } else {
          // STALE: break it ATOMICALLY via rename-to-tombstone — of N
          // concurrent breakers exactly one rename succeeds — then
          // VERIFY by mtime that what we renamed really was the stale
          // lock: a takeover winner may have slipped a FRESH lock in
          // between our staleness check and our rename, in which case
          // we restore it and go back to waiting on its holder. (The
          // unverifiable window — renamed file stat fails because a
          // concurrent winner swept our tombstone — also re-enters the
          // wait: when in doubt, never build.)
          val tombstone = new Path(hPath,
            s"_graft_build_lock.broken.${java.util.UUID.randomUUID()}")
          val renamed = try fs.rename(lockPath, tombstone)
            catch { case _: java.io.IOException => false }
          if (renamed) {
            val tombAge = try {
              Some(System.currentTimeMillis() -
                fs.getFileStatus(tombstone).getModificationTime)
            } catch { case _: java.io.IOException => None }
            if (tombAge.exists(_ >= lockStaleMs)) {
              // verified: we broke the dead holder's lock
              try fs.delete(tombstone, false) catch { case _: java.io.IOException => () }
              onLockBroken()
              locked = tryLock() // may still lose to a parallel fresh builder
            } else {
              // we renamed a LIVE lock (or could not prove otherwise):
              // put it back and wait on its holder. If the restore
              // fails because a new lock already exists, that holder
              // is who we wait on; drop our copy.
              try {
                if (!fs.rename(tombstone, lockPath)) fs.delete(tombstone, false)
              } catch { case _: java.io.IOException => () }
            }
          }
          // the lock may be simply ABSENT (a failed build's `finally`
          // deleted it without stamping meta — lockAgeMs() reads
          // MaxValue and routes here): the rename above then fails on a
          // nonexistent file and no takeover path runs, so attempt a
          // plain acquisition before re-entering the wait. Guard
          // against mistaking a takeover-VERIFY window for absence: a
          // breaker that renamed a (possibly live) lock holds it as a
          // tombstone while it verifies, so "absent" only counts when
          // no tombstone exists either — and both must STILL hold a
          // full poll later (the verify window is sub-poll-length), so
          // a rename landing between our two observations is caught by
          // the second one. The atomic create(_, false) then resolves
          // any remaining race with a concurrent builder.
          def lockFreeNoTombstone(): Boolean =
            try {
              !fs.exists(lockPath) && {
                val ts = fs.globStatus(new Path(hPath, "_graft_build_lock.broken.*"))
                ts == null || ts.isEmpty
              }
            } catch { case _: java.io.IOException => false }
          if (!locked && lockFreeNoTombstone()) {
            Thread.sleep(lockPollMs)
            if (lockFreeNoTombstone() && !metaCurrent()) locked = tryLock()
          }
          // rename losers and unverified breakers re-enter the wait on
          // the current holder; the shared deadline bounds the retries
          if (!locked && System.nanoTime() >= deadline)
            throw new IllegalStateException(
              s"timed out after ${lockWaitMs}ms: lost the stale-lock takeover " +
              s"race at $lockPath and the wait budget is exhausted")
        }
      }
      // sweep tombstone litter from crashed breakers (dead files — an
      // in-flight breaker whose tombstone we sweep fails its verify
      // and re-enters the wait, which is safe)
      try fs.globStatus(new Path(hPath, "_graft_build_lock.broken.*"))
        .foreach(st => fs.delete(st.getPath, false))
      catch { case _: java.io.IOException => () }
      // lock held (created by this JVM). Heartbeat its mtime so waiters
      // can tell "slow build" (fresh lock — keep waiting) from "crashed
      // builder" (stale lock — break it) however long the build runs.
      val hbPeriodMs = math.max(lockPollMs, lockStaleMs / 3)
      @volatile var hbStop = false
      val hb = new Thread(() => {
        try {
          while (!hbStop) {
            Thread.sleep(hbPeriodMs)
            if (!hbStop)
              try fs.setTimes(lockPath, System.currentTimeMillis(), -1)
              catch { case _: java.io.IOException => () }
          }
        } catch { case _: InterruptedException => () }
      }, "graft-index-lock-heartbeat")
      hb.setDaemon(true)
      hb.start()
      try {
        if (!metaCurrent()) { // re-check under the lock
          val metaPath = new Path(hPath, "_graft_meta")
          if (fs.exists(metaPath)) fs.delete(metaPath, false) // invalidate first
          build
          writeStamp(s, path, "_graft_meta", meta)
        }
      } finally {
        hbStop = true
        hb.interrupt()
        // release is owner-only, VERIFIED by token: if our lock went
        // stale and was taken over while we were suspended, the file
        // now carries the new holder's token and we must leave it alone
        try { if (ownsLock()) fs.delete(lockPath, false) }
        catch { case _: java.io.IOException => () }
      }
      ensured.put(path, meta)
    }
  }
}
