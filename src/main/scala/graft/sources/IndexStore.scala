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

  /** Snapshot fingerprint of a source file: total length + max mtime of
    * its parts. Any regeneration of the test data (or a new corpus
    * snapshot in production) changes the stamp and forces a rebuild. */
  def sourceStamp(s: SparkSession, file: String): String = {
    val p = new Path(file)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) "absent"
    else {
      val parts = if (fs.getFileStatus(p).isDirectory) fs.listStatus(p).toSeq
                  else Seq(fs.getFileStatus(p))
      s"len=${parts.map(_.getLen).sum}|mtime=${parts.map(_.getModificationTime).max}"
    }
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
    * builder proceed while others wait for its meta stamp — without it,
    * two builders' overwrite-mode writes could delete a directory the
    * other is scanning. A crashed builder's lock goes stale after 10
    * minutes and is broken; the residual race (two JVMs breaking the
    * same stale lock together) is accepted for a machine-local store —
    * a shared production deployment would put a real coordination
    * service (or Hive/Iceberg commit protocol) in front of this. */
  def ensure(s: SparkSession, path: String, meta: String)(build: => Unit): Unit =
    ensure(s, path, meta, lockStaleMs = 10L * 60 * 1000,
      lockWaitMs = 15L * 60 * 1000, lockPollMs = 500L)(build)

  /** Timing-injectable variant (exposed for IndexStoreSpec: the wait and
    * stale-takeover paths are untestable at production timescales). */
  private[graft] def ensure(s: SparkSession, path: String, meta: String,
                            lockStaleMs: Long, lockWaitMs: Long,
                            lockPollMs: Long)(build: => Unit): Unit = {
    if (ensured.get(path) == meta) return
    synchronized {
      if (ensured.get(path) == meta) return
      val hPath = new Path(path)
      val metaPath = new Path(hPath, "_graft_meta")
      val lockPath = new Path(hPath, "_graft_build_lock")
      val fs = hPath.getFileSystem(s.sparkContext.hadoopConfiguration)
      def metaCurrent(): Boolean = fs.exists(metaPath) && {
        val in = fs.open(metaPath)
        try new String(in.readAllBytes(), "UTF-8") == meta finally in.close()
      }
      def tryLock(): Boolean =
        try { fs.mkdirs(hPath); fs.create(lockPath, false).close(); true }
        catch { case _: java.io.IOException => false }
      if (!metaCurrent()) {
        if (!tryLock()) {
          // another JVM is building: wait for its stamp (or a stale lock)
          val staleMs = lockStaleMs
          val deadline = System.nanoTime() + lockWaitMs * 1000000L
          var waiting = true
          while (waiting && System.nanoTime() < deadline) {
            Thread.sleep(lockPollMs)
            val lockAge = try {
              if (fs.exists(lockPath))
                System.currentTimeMillis() - fs.getFileStatus(lockPath).getModificationTime
              else Long.MaxValue
            } catch { case _: java.io.IOException => Long.MaxValue }
            waiting = lockAge < staleMs && !metaCurrent()
          }
          if (metaCurrent()) { ensured.put(path, meta); return }
          // only a STALE lock may be broken — if the peer's lock is
          // still fresh when the wait deadline expires, taking it over
          // would put two overwrite-mode builders on one directory (the
          // exact corruption the lock prevents). Fail loudly instead.
          val lockStillFresh = try {
            fs.exists(lockPath) &&
              System.currentTimeMillis() - fs.getFileStatus(lockPath).getModificationTime < staleMs
          } catch { case _: java.io.IOException => false }
          if (lockStillFresh)
            throw new IllegalStateException(
              s"timed out after ${lockWaitMs}ms waiting on a live index build " +
              s"lock at $lockPath — raise the wait or investigate the holder")
          try fs.delete(lockPath, false) catch { case _: java.io.IOException => () }
          tryLock() // stale-lock takeover; benign if it fails
        }
        try {
          if (!metaCurrent()) { // re-check under the lock
            if (fs.exists(metaPath)) fs.delete(metaPath, false) // invalidate first
            build
            val out = fs.create(metaPath, true)
            try out.write(meta.getBytes("UTF-8")) finally out.close()
          }
        } finally {
          try fs.delete(lockPath, false) catch { case _: java.io.IOException => () }
        }
      }
      ensured.put(path, meta)
    }
  }
}
