package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental (delta) release publication — r18, the r17 verdict's #2:
  * a daily 100 TB pipeline cannot rewrite the whole artifact per
  * snapshot, so day-over-day publication must write ONLY the data that
  * changed while every published version stays a complete, immutable,
  * crash-safe release the fromRelease audit family reads unchanged.
  *
  * Layout (a manifest-over-immutable-pool scheme — the shape the table
  * formats standardized, reduced to exactly what a release sink needs):
  *
  *   root/pool/<split>/b<bucket>/g<ver>-<k>.parquet   immutable data
  *   root/v<N>/files.txt                              sorted pool-relative paths
  *   root/v<N>.__commit                               zero-byte marker, written LAST
  *
  * A VERSION is a manifest: the sorted list of pool files composing it.
  * Pool files are bucket-grained — bucket = ReleaseWriter's content-
  * keyed md5 octet mod nBuckets, STABLE across days and relayouts — and
  * carry the full release contract (split as a data column), so reading
  * a version is `spark.read.schema(contract).parquet(files: _*)`: no
  * partition discovery, no directory coupling, and
  * [[ReleaseWriter.manifestOf]] over the read-back is directly
  * comparable to a from-scratch publish of the same logical release
  * (the p10 oracle states exactly that equality).
  *
  * Delta publish = c9's snapshot-diff discipline composed with the
  * commit-marker publish: diff the CURRENT ARTIFACT against today's
  * logical release map-side to (doc_id, md5(text)) — fingerprint-width
  * shuffle, never document bytes — take the touched (split, bucket)
  * pairs (≤ nBuckets × |splits| rows, dashboard-sized, collected), write
  * fresh gen files for ONLY those buckets from today's release, and
  * commit a manifest that references the previous version's files for
  * every untouched bucket. Write volume is O(changed buckets), read
  * volume of the diff is one fingerprint scan of each side — the shape
  * a daily pipeline actually affords. The doc-level fingerprint covers
  * the FULL release contract (text, source, lang, split — every field
  * null-coalesced AND length-prefixed, so neither null realignment nor
  * a separator byte inside text can collide two rows), so a doc whose
  * split or governance
  * metadata moved under unchanged text still lands in the touched set
  * and is rewritten; nothing stale can carry forward by reference.
  *
  * Crash contract (IndexStore's versioning primitives, ONE copy):
  * uncommitted manifest dirs and orphan pool gens are swept at the next
  * publish; the marker is a single atomic namespace create; readers
  * resolve only committed versions, so a crash anywhere before the
  * marker leaves the previous release current and intact (delta writes
  * never touch a committed pool file). Lag-one retention keeps exactly
  * one superseded version; pool files referenced by NO retained
  * manifest are deleted with it. Writer concurrency is maintainer-owned
  * (publishRelease's contract): never run two publishers on one root.
  *
  * Geometry: nBuckets is the release lineage's identity — bucket
  * membership must be stable across days — so it is stamped at first
  * publish and REQUIRED to match on every later one (the index-store
  * geometry discipline).
  */
object IncrementalRelease {

  private val GeometryStamp = "_graft_incr_geometry"
  private def geometryString(nBuckets: Int) = s"nBuckets=$nBuckets"

  private def fsOf(s: SparkSession, root: String) =
    new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def poolDir(root: String) = s"$root/pool"

  // ---- manifest io ---------------------------------------------------

  private def manifestFile(root: String, v: Long): Path =
    new Path(IndexStore.vDir(root, "v", v), "files.txt")

  private def writeManifest(s: SparkSession, root: String, v: Long,
                            entries: Seq[String]): Unit = {
    val fs = fsOf(s, root)
    val out = fs.create(manifestFile(root, v), true)
    try out.write(entries.sorted.mkString("", "\n", "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readManifest(s: SparkSession, root: String, v: Long): Seq[String] = {
    val fs = fsOf(s, root)
    val in = fs.open(manifestFile(root, v))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  /** Pool-relative path of a gen file: `<split>/b<bucket>/g<ver>-<k>.parquet`. */
  private def entryBucket(e: String): (String, Long) = {
    val parts = e.split("/")
    (parts(0), parts(1).stripPrefix("b").toLong)
  }

  // ---- reading a version ----------------------------------------------

  /** Committed versions of the incremental release, ascending. */
  def versions(s: SparkSession, root: String): Seq[Long] =
    IndexStore.vCommitted(s, root, "v")

  /** Read the CURRENT committed version (full release contract — the
    * same frame readRelease returns for a directory release, so every
    * fromRelease audit consumes it unchanged). */
  def readCurrent(s: SparkSession, root: String): DataFrame =
    readVersion(s, root, versions(s, root).lastOption.getOrElse(
      throw new IllegalStateException(s"no committed release under $root")))

  def readVersion(s: SparkSession, root: String, v: Long): DataFrame = {
    val entries = readManifest(s, root, v)
    require(entries.nonEmpty, s"release v$v under $root lists no files")
    s.read.schema(ReleaseWriter.fullSchema)
      .parquet(entries.map(e => s"${poolDir(root)}/$e"): _*)
  }

  // ---- publishing ------------------------------------------------------

  /** Full (day-1 / rebuild) publish: every (split, bucket) group writes
    * fresh gen files. Returns the validated manifest aggregate of the
    * published artifact. */
  def publishFull(docs: DataFrame, root: String, nBuckets: Int = 8): DataFrame =
    publish(docs, root, nBuckets, deltaFrom = None)

  /** Delta (day-N) publish against the current committed version: only
    * buckets carrying an added/changed/removed doc are rewritten; every
    * other bucket's files carry forward by reference. `docs` is the
    * COMPLETE logical release of the new day (the diff finds what
    * changed — callers never pre-compute deltas). No-op (returns the
    * current artifact's manifest aggregate, no new version) when the
    * diff is empty. */
  def publishDelta(docs: DataFrame, root: String, nBuckets: Int = 8): DataFrame =
    publish(docs, root, nBuckets, deltaFrom = versions(docs.sparkSession, root).lastOption)

  private def publish(docs: DataFrame, root: String, nBuckets: Int,
                      deltaFrom: Option[Long]): DataFrame = {
    val s = docs.sparkSession
    val fs = fsOf(s, root)
    if (deltaFrom.isEmpty)
      IndexStore.writeStamp(s, root, GeometryStamp, geometryString(nBuckets))
    else
      IndexStore.requireStamp(s, root, GeometryStamp, geometryString(nBuckets),
        "incremental-release bucket geometry")
    val committed = versions(s, root)
    require(deltaFrom.forall(committed.contains),
      s"delta base v${deltaFrom.get} is not a committed version of $root")
    // sweep a crashed previous attempt: uncommitted manifest dirs, then
    // pool files no committed manifest references (the crashed
    // publish's fresh gens — and nothing else: see gcUnreferencedPool)
    IndexStore.vSweepUncommitted(s, root, "v", committed.toSet)
    gcUnreferencedPool(s, root, committed)
    val next = committed.lastOption.getOrElse(0L) + 1

    val cols = Seq("doc_id", "text", "n_chars") ++
      ReleaseWriter.MetaCols.filter(docs.columns.contains) ++ Seq("split")
    // Stage the release slice only on the DELTA path, where it feeds
    // two consumers (the fingerprint diff and the touched-bucket
    // rewrite). A FULL publish consumes it exactly once — the gen-file
    // write — so staging there materialized the entire release an extra
    // time per publish for zero sharing (r21, guide §1.2: one pass per
    // day-1 rebuild saved at any scale).
    lazy val slimLazy = docs.select(cols.map(col): _*)

    val (toWrite, carried): (DataFrame, Seq[String]) = deltaFrom match {
      case None => (slimLazy, Seq.empty)
      case Some(base) =>
        val slim = graft.plans.Stage(slimLazy)
        // c9's diff discipline: artifact vs new logical release, reduced
        // map-side to (doc_id, fingerprint[, split]) — the join shuffles
        // ~32 B/row at any corpus size. The fingerprint covers the FULL
        // release contract (text AND the governance/split columns).
        // EVERY field is coalesced to an explicit empty-string stand-in
        // (the r18 advice finding: text and split passed raw let
        // concat_ws's null-skipping realign fields, so (null,'s','l','p')
        // and ('s','l','p',null) collided) and LENGTH-PREFIXED, so a
        // separator byte inside document text cannot forge a field
        // boundary either: a doc whose
        // split or metadata moved under unchanged text must land in the
        // touched set, or the stale row is carried forward by reference
        // and the artifact silently diverges from the logical release
        // (the r18 review finding this fingerprint closes).
        def lp(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
          val v = coalesce(c, lit(""))
          concat(length(v).cast("string"), lit(":"), v)
        }
        val fpr = md5(concat(
          lp(col("text")), lp(col("source")), lp(col("lang")), lp(col("split"))))
        val o = readVersion(s, root, base)
          .select(col("doc_id"), fpr.as("__ho"), col("split").as("__so"))
        val n = slim.select(col("doc_id"), fpr.as("__hn"),
          col("split").as("__sn"))
        // touched (split, bucket) pairs — BOTH sides of a diff row (a
        // custom split scheme may move a doc across splits; the content-
        // keyed bucket is doc_id-stable). ≤ nBuckets × |splits| rows.
        val touched = o.join(n, Seq("doc_id"), "full_outer")
          .filter(col("__ho").isNull || col("__hn").isNull ||
            col("__ho") =!= col("__hn"))
          .select(ReleaseWriter.bucketCol(nBuckets).as("bucket"),
            col("__so"), col("__sn"))
          .select(col("bucket"), explode(array_compact(
            array_distinct(array(col("__so"), col("__sn"))))).as("split"))
          .distinct()
          .collect().map(r => (r.getString(1), r.getLong(0))).toSet
        if (touched.isEmpty)
          return ReleaseWriter.manifestOf(readVersion(s, root, base), nBuckets)
            .localCheckpoint()
        val touchedDf = broadcast(
          s.createDataFrame(touched.toSeq.map(t => (t._1, t._2)))
            .toDF("split", "bucket"))
        val rewrite = slim
          .withColumn("bucket", ReleaseWriter.bucketCol(nBuckets))
          .join(touchedDf, Seq("split", "bucket"), "left_semi")
          .drop("bucket")
        val keep = readManifest(s, root, base)
          .filter(e => !touched.contains(entryBucket(e)))
        (rewrite, keep)
    }

    val fresh = writeGenFiles(toWrite, root, next, nBuckets)
    val entries = carried ++ fresh
    if (entries.isEmpty)
      throw new IllegalStateException(
        s"refusing to publish an empty release (no files) under $root")
    writeManifest(s, root, next, entries)
    // read-back validation BEFORE the marker (publishRelease discipline)
    val manifest =
      ReleaseWriter.manifestOf(readVersion(s, root, next), nBuckets).localCheckpoint()
    if (manifest.head(1).isEmpty)
      throw new IllegalStateException(
        s"refusing to publish an empty release (0 rows read back) under $root")
    fs.create(IndexStore.vMarker(root, "v", next), false).close()
    retain(s, root, committed, next)
    manifest
  }

  /** Write `docs` as one pool file set per (split, bucket), gen-stamped
    * with `ver`; returns the pool-relative entries. The staging write
    * partitions by shadow columns (so `split` stays a DATA column in
    * the files) and the rename-in gives the deterministic
    * `g<ver>-<k>.parquet` names the sweep recognizes. One hash shuffle
    * on (split, bucket), sorted by doc_id within each group. */
  private def writeGenFiles(docs: DataFrame, root: String, ver: Long,
                            nBuckets: Int): Seq[String] = {
    val s = docs.sparkSession
    val fs = fsOf(s, root)
    val stage = s"$root/__stage_g$ver"
    fs.delete(new Path(stage), true)
    docs
      .withColumn("__ps", col("split"))
      .withColumn("__pb", ReleaseWriter.bucketCol(nBuckets))
      .repartition(col("__ps"), col("__pb"))
      .sortWithinPartitions(col("__ps"), col("__pb"), col("doc_id"))
      .write.partitionBy("__ps", "__pb").parquet(stage)
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    val stagePath = new Path(stage)
    val it = fs.listFiles(stagePath, true)
    val staged = scala.collection.mutable.ArrayBuffer.empty[Path]
    while (it.hasNext) {
      val f = it.next()
      val nm = f.getPath.getName
      if (!nm.startsWith("_") && !nm.startsWith(".")) staged += f.getPath
    }
    staged.sortBy(_.toString).zipWithIndex.foreach { case (src, i) =>
      // .../__ps=<split>/__pb=<bucket>/part-*.parquet
      val bucket = src.getParent.getName.stripPrefix("__pb=")
      val split = src.getParent.getParent.getName.stripPrefix("__ps=")
      val rel = s"$split/b$bucket/g$ver-$i.parquet"
      val dest = new Path(s"${poolDir(root)}/$rel")
      fs.mkdirs(dest.getParent)
      require(fs.rename(src, dest), s"pool publish rename failed for $rel")
      entries += rel
    }
    fs.delete(stagePath, true)
    entries.toSeq
  }

  /** Delete pool files referenced by NO manifest in `versions` — the
    * ONE GC definition, shared by the crash sweep (versions = all
    * committed: a crashed publish's fresh gens are referenced by
    * nothing) and post-retention GC (versions = the retained set).
    *
    * MEMBERSHIP IS BY MANIFEST REFERENCE, NEVER BY GEN NUMBER: a
    * delta-published version carries forward files from OLDER gens by
    * reference, so after lag-one retention retires the version that
    * CREATED a gen, its files may still compose every retained
    * release. A gen-number sweep ("gen ∉ committed versions") would
    * delete exactly those carried files and corrupt all retained
    * manifests — the r18 review finding this signature replaces;
    * IncrementalReleaseSpec's long-lineage test pins gen-1 files
    * surviving past v1's retirement. */
  private def gcUnreferencedPool(s: SparkSession, root: String,
                                 versions: Seq[Long]): Unit = {
    val fs = fsOf(s, root)
    val pool = new Path(poolDir(root))
    if (!fs.exists(pool)) return
    val referenced = versions.flatMap(v => readManifest(s, root, v)).toSet
    val it = fs.listFiles(pool, true)
    val doomed = scala.collection.mutable.ArrayBuffer.empty[Path]
    while (it.hasNext) {
      val f = it.next()
      val nm = f.getPath.getName
      if (nm.endsWith(".parquet")) {
        val rel = s"${f.getPath.getParent.getParent.getName}/" +
          s"${f.getPath.getParent.getName}/$nm"
        if (!referenced.contains(rel)) doomed += f.getPath
      }
    }
    doomed.foreach(fs.delete(_, false))
  }

  /** Lag-one retention + pool garbage collection: retire versions
    * ≤ next−2 (marker first, IndexStore's order), then GC files
    * referenced by NO retained manifest. */
  private def retain(s: SparkSession, root: String, committed: Seq[Long],
                     next: Long): Unit = {
    IndexStore.vRetainLagOne(s, root, "v", committed, next)
    gcUnreferencedPool(s, root, versions(s, root))
  }
}
