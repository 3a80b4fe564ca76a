package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reproducible release sink — the last step of a corpus release at
  * 100 TB: write the released documents with a DETERMINISTIC layout
  * (split-partitioned directories, range-bucketed files sorted by
  * doc_id) and emit a content-audit manifest computed FROM THE WRITTEN
  * FILES, not from the logical plan. The manifest is the release's
  * checkable contract: per (split, bucket) row counts, char totals and
  * an order-invariant content digest — rewriting the same release on
  * any cluster layout reproduces it bit-for-bit, and a write that
  * dropped, duplicated or corrupted any row changes it.
  *
  * Digest design: SUM over rows of the first 40 bits of
  * md5(doc_id ':' text), accumulated as BIGINT — order-invariant (sum)
  * and computable bit-identically by any engine with md5 (the DuckDB
  * oracle recomputes it from the logical release definition, so the
  * oracle check spans the filesystem round-trip). BIGINT stays exact in
  * every client (DECIMAL/HUGEINT sums degrade to float64 in pandas);
  * headroom is 2^63/2^40 ≈ 8M rows per (split, bucket) before overflow,
  * and nBuckets scales with the corpus to keep buckets far under that.
  * Bucket = an INDEPENDENT md5 octet (chars 13–16) mod nBuckets,
  * content-keyed like c1/c3/c7's octets so bucket membership survives
  * relayouts and corpus increments.
  *
  * Scale shape: one range shuffle (repartitionByRange on doc_id within
  * split) + sorted write; the manifest is a (split, bucket)-keyed
  * aggregate with map-side partials over the read-back — nBuckets
  * scales with the corpus, nothing is ever collected to the driver.
  */
object ReleaseWriter {

  private[graft] def bucketCol(nBuckets: Int): Column =
    pmod(conv(substring(md5(col("doc_id").cast("string")), 13, 4), 16, 10)
      .cast("long"), lit(nBuckets.toLong))

  private[graft] def digestTerm: Column =
    conv(substring(md5(concat(col("doc_id").cast("string"), lit(":"), col("text"))),
      1, 10), 16, 10).cast("long")

  /** Default target bytes per release file: ~512 MB of text per file is
    * the classic parquet sweet spot (big enough that scan planning and
    * footer overhead amortize, small enough that one file is a sane
    * task unit at 100 TB). */
  val DefaultTargetFileBytes: Long = 512L << 20

  /** The file-count rule, DERIVED FROM DATA (not a fixture constant —
    * the r12 review finding): total text chars / target file bytes,
    * rounded up, minimum 1. n_chars is the serialized-size proxy for
    * this corpus (ASCII text dominates the row); a production release
    * would plug in a sampled bytes-per-row estimate the same way. */
  def nRangeFilesFor(totalChars: Long, targetFileBytes: Long): Int =
    math.max(1L, (totalChars + targetFileBytes - 1) / targetFileBytes).toInt

  /** Write `docs` (must carry doc_id, text, split, n_chars) under
    * `outDir` partitioned by split, files range-bucketed and sorted by
    * doc_id, then read the files back and return the manifest. The
    * range-partition count is sized from the release's own byte total
    * via [[nRangeFilesFor]] (range keys are (split, doc_id), so one
    * range partition can straddle a split boundary and splits share the
    * writer budget ∝ their row share). The sizing pass is one
    * map-side-partial `sum(n_chars)` over the release — noise next to
    * the write itself. */
  def writeRelease(docs: DataFrame, outDir: String, nBuckets: Int = 8,
                   targetFileBytes: Long = DefaultTargetFileBytes): DataFrame = {
    writeLayout(docs, outDir, targetFileBytes)
    manifestOf(docs.sparkSession.read.parquet(outDir), nBuckets)
  }

  /** The deterministic layout write alone (no manifest). */
  private def writeLayout(docs: DataFrame, outDir: String,
                          targetFileBytes: Long): Unit = {
    val slim = docs.select(col("doc_id"), col("text"), col("n_chars"), col("split"))
    val totalChars = slim.agg(coalesce(sum(col("n_chars").cast("long")), lit(0L)))
      .head().getLong(0)
    slim
      .repartitionByRange(nRangeFilesFor(totalChars, targetFileBytes),
        col("split"), col("doc_id"))
      .sortWithinPartitions(col("split"), col("doc_id"))
      .write.mode("overwrite").partitionBy("split").parquet(outDir)
  }

  // ---- versioned atomic publication of a release -------------------
  // The IndexStore commit-marker discipline applied to the release
  // sink: `writeRelease` alone overwrites its target in place, so a
  // crash mid-write destroys the PREVIOUS release and leaves a partial
  // new one — the one sink that lacked the crash contract every
  // swappable index table already has. `publishRelease` writes into a
  // fresh `v<N>` directory under the release root and commits it by
  // creating a zero-byte `v<N>.__commit` marker LAST (a single atomic
  // namespace create): a consumer resolving [[currentReleasePath]]
  // sees the old release until the marker lands, and a crash before
  // the marker leaves the old release current (the orphaned dir is
  // swept by the next publish). Lag-one retention keeps exactly one
  // superseded release for in-flight readers. Writer concurrency is
  // maintainer-owned (two concurrent publishes of one root = the
  // second marker create fails loudly), same contract as IndexStore.

  private def releaseMarker(root: String, v: Long) =
    new org.apache.hadoop.fs.Path(root, s"v$v.__commit")

  private def committedReleases(s: org.apache.spark.sql.SparkSession,
                                root: String): Seq[Long] = {
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val glob = fs.globStatus(new org.apache.hadoop.fs.Path(root, "v*.__commit"))
    if (glob == null) Seq.empty
    else glob.toSeq.flatMap(
      _.getPath.getName.stripPrefix("v").stripSuffix(".__commit").toLongOption)
      .sorted
  }

  /** The directory of the current COMMITTED release, if any. */
  def currentReleasePath(s: org.apache.spark.sql.SparkSession,
                         root: String): Option[String] =
    committedReleases(s, root).lastOption.map(v => s"$root/v$v")

  /** Crash-safe release publish: write the deterministic layout into
    * the next version dir, commit via marker, retain lag-one. Returns
    * the manifest computed from the PUBLISHED files (read back through
    * [[currentReleasePath]], so the manifest can only describe a
    * committed release). */
  def publishRelease(docs: DataFrame, root: String, nBuckets: Int = 8,
                     targetFileBytes: Long = DefaultTargetFileBytes): DataFrame = {
    val s = docs.sparkSession
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val committed = committedReleases(s, root)
    val cs = committed.toSet
    // sweep crashed (uncommitted) version dirs from a previous writer
    val dirs = fs.globStatus(new org.apache.hadoop.fs.Path(root, "v*"))
    if (dirs != null) dirs.foreach { st =>
      if (st.isDirectory &&
          st.getPath.getName.stripPrefix("v").toLongOption.exists(!cs.contains(_)))
        fs.delete(st.getPath, true)
    }
    val next = committed.lastOption.getOrElse(0L) + 1
    writeLayout(docs, s"$root/v$next", targetFileBytes)
    fs.create(releaseMarker(root, next), false).close()
    // lag-one retention: marker first, then files
    committed.filter(_ <= next - 2).foreach { v =>
      fs.delete(releaseMarker(root, v), false)
      fs.delete(new org.apache.hadoop.fs.Path(s"$root/v$v"), true)
    }
    manifestOf(s.read.parquet(currentReleasePath(s, root).get), nBuckets)
  }

  /** The audit aggregate over a (written or logical) release frame. */
  def manifestOf(release: DataFrame, nBuckets: Int = 8): DataFrame =
    release
      .groupBy(col("split"), bucketCol(nBuckets).as("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars").cast("long")).as("total_chars"),
        sum(digestTerm).as("digest"))
      .orderBy("split", "bucket")

  /** FILE-granular audit rows over a WRITTEN release: one row per
    * physical file with its row count, char total and the same
    * order-invariant digest as the aggregate manifest — a consumer can
    * verify a single damaged/truncated file without recomputing the
    * whole release. `file` is the STABLE layout key — partition dir +
    * writer ordinal (`split=train/part-00001`) — not the physical name:
    * parquet part names embed a per-job UUID, so the raw name can never
    * reproduce across the rewrites the manifest exists to check. The
    * key maps 1:1 to a physical file (glob `<key>-*.parquet` under
    * `outDir`). Scale shape: one pass over the read-back, grouped by
    * the `_metadata.file_path` hidden column — map-side partials, no
    * extra shuffle beyond the |files|-row aggregate. */
  def fileManifestOf(release: DataFrame): DataFrame =
    release
      .select(col("split"), col("doc_id"), col("text"), col("n_chars"),
        regexp_extract(col("_metadata.file_path"),
          "(split=[^/]+/part-[0-9]+)", 1).as("file"))
      .groupBy(col("split"), col("file"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars").cast("long")).as("total_chars"),
        sum(digestTerm).as("digest"))
      .orderBy("split", "file")
}
