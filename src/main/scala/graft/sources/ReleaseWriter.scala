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
                   targetFileBytes: Long = DefaultTargetFileBytes,
                   format: String = "parquet"): DataFrame = {
    writeLayout(docs, outDir, targetFileBytes, format)
    manifestOf(readRelease(docs.sparkSession, outDir, format), nBuckets)
  }

  private val contractSchema = "doc_id LONG, text STRING, n_chars LONG, split STRING"

  /** Governance metadata a release CARRIES when the released frame has
    * it (r17, audit-from-published-release): the dataset-card family
    * (p5/p5b/p5c) audits the published artifact, so the artifact must
    * ship the card's grouping columns — a release without its metadata
    * cannot be audited without going back to the raw corpus, which is
    * exactly the recompute the fromRelease mode exists to kill.
    * Optional at write (core-only frames still publish; spec fixtures
    * and minimal releases read back with NULL meta — parquet/JSON
    * schema evolution fills missing columns), NEVER part of the
    * manifest digest (doc_id:text), so manifests of core-only and
    * metadata-carrying writes of the same docs stay identical. */
  private[graft] val MetaCols: Seq[String] = Seq("source", "lang")
  private[sources] val fullSchema =
    "doc_id LONG, text STRING, n_chars LONG, source STRING, lang STRING, split STRING"

  private def requireKnownFormat(format: String): Unit =
    if (format != "parquet" && format != "jsonl")
      throw new IllegalArgumentException(
        s"unknown release format '$format' (parquet | jsonl)")

  /** Read a written release back with the CONTRACT schema — explicit
    * for BOTH formats: JSONL inference would re-scan the data and
    * type-drift on an empty split, and the parquet branch must pin the
    * `split` partition column to STRING too — partition-column type
    * inference would read split labels like '2024' as int (and '01' as
    * 1), breaking the cross-format and written-vs-logical manifest
    * equality the sink exists to guarantee. */
  def readRelease(s: org.apache.spark.sql.SparkSession, dir: String,
                  format: String = "parquet"): DataFrame = {
    requireKnownFormat(format)
    // FULL contract (core + meta): releases written without metadata
    // read back with NULL source/lang — both readers fill columns the
    // files lack, so the explicit schema stays the single contract
    val r = s.read.schema(fullSchema)
    if (format == "parquet") r.parquet(dir) else r.json(dir)
  }

  /** The deterministic layout write alone (no manifest). `jsonl` emits
    * gzipped JSON-lines — the interchange format LLM training stacks
    * consume — with the SAME split-partitioned, range-bucketed, sorted
    * layout and therefore the same manifest as the parquet release
    * (ReleasePublishSpec pins cross-format manifest equality).
    *
    * The release frame is STAGED before the sizing aggregate: `docs`
    * is typically the whole curation pipeline (p4 passes
    * releasedDocs), and without the stage break the sum(n_chars)
    * sizing action would execute that multi-join pipeline once and
    * the write would execute it again (review finding). Staged, the
    * pipeline runs once and both the sizing pass and the write scan
    * the materialized release — which is also the smallest frame in
    * the lineage, so the staged copy is as cheap as a copy gets. */
  private def writeLayout(docs: DataFrame, outDir: String,
                          targetFileBytes: Long,
                          format: String = "parquet"): Unit = {
    requireKnownFormat(format)
    // core contract + whatever governance metadata the frame carries
    val cols = Seq("doc_id", "text", "n_chars") ++
      MetaCols.filter(docs.columns.contains) ++ Seq("split")
    val slim = graft.plans.Stage(docs.select(cols.map(col): _*))
    val totalChars = slim.agg(coalesce(sum(col("n_chars").cast("long")), lit(0L)))
      .head().getLong(0)
    val ranged = slim
      .repartitionByRange(nRangeFilesFor(totalChars, targetFileBytes),
        col("split"), col("doc_id"))
      .sortWithinPartitions(col("split"), col("doc_id"))
      .write.mode("overwrite").partitionBy("split")
    if (format == "parquet") ranged.parquet(outDir)
    else ranged.option("compression", "gzip").json(outDir)
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
  // superseded release for in-flight readers. The versioning
  // primitives (marker parse, sweep filter, retention order) are
  // IndexStore's — ONE copy of the crash contract for both consumers.
  //
  // Writer concurrency is STRICTLY maintainer-owned: two publishers
  // racing one root both compute the same next version and
  // mode("overwrite") into the SAME v<N> directory, so the loser can
  // corrupt the winner's files BEFORE either marker lands — the
  // loser's failed marker create is only a tripwire that the contract
  // was broken, not a safety mechanism. Never run two publishers
  // against one root (p4 isolates roots per application id).

  /** The directory of the current COMMITTED release, if any. */
  def currentReleasePath(s: org.apache.spark.sql.SparkSession,
                         root: String): Option[String] =
    IndexStore.vCommitted(s, root, "v").lastOption
      .map(v => IndexStore.vDir(root, "v", v))

  /** Crash-safe release publish: write the deterministic layout into
    * the next version dir, VALIDATE it by computing the manifest from
    * the written files, and only then commit via the marker — an
    * unreadable or empty layout (zero part files) fails BEFORE the
    * commit, leaving the previous release current. Returns the
    * validated manifest of the just-published version. */
  def publishRelease(docs: DataFrame, root: String, nBuckets: Int = 8,
                     targetFileBytes: Long = DefaultTargetFileBytes,
                     format: String = "parquet"): DataFrame = {
    val s = docs.sparkSession
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val committed = IndexStore.vCommitted(s, root, "v")
    // sweep crashed (uncommitted) version dirs from a previous writer
    IndexStore.vSweepUncommitted(s, root, "v", committed.toSet)
    val next = committed.lastOption.getOrElse(0L) + 1
    val nextDir = IndexStore.vDir(root, "v", next)
    writeLayout(docs, nextDir, targetFileBytes, format)
    // read-back validation BEFORE the marker: the manifest both proves
    // the files are readable and is the return value — a throw here
    // aborts the publish with the previous release still current
    val manifest =
      manifestOf(readRelease(s, nextDir, format), nBuckets).localCheckpoint()
    // an empty read-back almost always means a broken upstream (and for
    // parquet would have thrown at schema inference anyway; the jsonl
    // reader's explicit schema reads an empty dir silently) — refuse
    // uniformly, leaving the previous release current
    if (manifest.head(1).isEmpty)
      throw new IllegalStateException(
        s"refusing to publish an empty release (0 rows read back from $nextDir)")
    fs.create(IndexStore.vMarker(root, "v", next), false).close()
    IndexStore.vRetainLagOne(s, root, "v", committed, next)
    manifest
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
