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

  /** Write `docs` (must carry doc_id, text, split, n_chars) under
    * `outDir` partitioned by split, files range-bucketed and sorted by
    * doc_id, then read the files back and return the manifest.
    * `nRangeFiles` is the TOTAL range-partition count across all splits
    * (range keys are (split, doc_id), so one range partition can
    * straddle a split boundary and splits share the writer budget ∝
    * their row share) — size it for the whole release, not per split. */
  def writeRelease(docs: DataFrame, outDir: String, nBuckets: Int = 8,
                   nRangeFiles: Int = 4): DataFrame = {
    docs
      .select(col("doc_id"), col("text"), col("n_chars"), col("split"))
      .repartitionByRange(nRangeFiles, col("split"), col("doc_id"))
      .sortWithinPartitions(col("split"), col("doc_id"))
      .write.mode("overwrite").partitionBy("split").parquet(outDir)
    manifestOf(docs.sparkSession.read.parquet(outDir), nBuckets)
  }

  /** The audit aggregate over a (written or logical) release frame. */
  def manifestOf(release: DataFrame, nBuckets: Int = 8): DataFrame =
    release
      .groupBy(col("split"), bucketCol(nBuckets).as("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars").cast("long")).as("total_chars"),
        sum(digestTerm).as("digest"))
      .orderBy("split", "bucket")
}
