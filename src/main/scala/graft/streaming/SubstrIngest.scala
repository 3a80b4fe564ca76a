package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.DedupQueries

/** STREAMING incremental exact-substring dedup (r17 queue #4) — d12b's
  * stored-index loop (init → probe → append) run as a Structured
  * Streaming sink, completing streaming coverage of the incremental
  * index family (MinHash: `DedupIngest`; line boilerplate: the line
  * index twin; substring: this). Each micro-batch of new documents:
  *
  *  1. PROBES the persisted k-window occurrence counts: emits the
  *     batch docs' maximal duplicated-coverage intervals against
  *     corpus ∪ batch — exactly `dupSubstringsOf(corpus ∪ batch, k)`
  *     restricted to batch docs (StoredSubstrSpec pins that equality
  *     for the underlying probe) — the ingestion filter "which spans
  *     of TODAY'S crawl are already-seen text";
  *  2. hands the spans to `onSpans(spans, batchId)` (scrub queue,
  *     span-removal rewrite, metrics — caller's choice);
  *  3. APPENDS the batch's ids and delta count rows, so the NEXT
  *     batch probes corpus ∪ everything-before-it.
  *
  * Scale shape: the corpus side is touched only through ONE narrow
  * stored-count scan semi-reduced by the guarded-broadcast batch hash
  * set (never a full stored-table materialization, zero corpus
  * re-windowing); the append is O(batch) parquet rows (counts are
  * PARTIAL — probes sum per hash, so appends never rewrite history).
  * State lives in the stored index, not a streaming state store — the
  * stream is stateless and survives any corpus size.
  *
  * Delivery semantics: spans emit at-least-once relative to the
  * streaming checkpoint (key `onSpans` writes by `batchId` — the
  * foreachBatch idempotence discipline). The index append is
  * EXACTLY-ONCE under crash/replay via the tagged-publish contract
  * (`appendStoredSubstrIndexTagged`): deterministic per-batchId file
  * names, and the batch start sweeps a crashed prior attempt's files
  * BEFORE probing, so a replay probes the same corpus state and
  * converges to the same index. Quiesce contract: compact only a
  * cleanly-stopped stream (a compaction absorbs tag files, after
  * which a replay fail-stops at the disjointness gate rather than
  * double-appending).
  */
object SubstrIngest {

  /** Build the foreachBatch writer for a streaming `(doc_id, text)`
    * frame against the appendable substring index at `indexPath`
    * (created by `DedupQueries.initStoredSubstrIndex` — the geometry
    * stamp there must match `k` here, enforced per batch). The caller
    * sets trigger/checkpoint options and calls `.start()`. */
  def substrIngest(docs: DataFrame, indexPath: String,
                   onSpans: (DataFrame, Long) => Unit,
                   k: Int = DedupQueries.SubstrWindow,
                   streamId: Option[String] = None): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      // the batch feeds two lifecycle calls (probe, then append), each
      // with several actions over it — pin it once
      val b = batch.persist()
      try {
        if (!b.isEmpty) {
          // tag namespaced per stream INCARNATION (checkpointed query
          // id): a fresh checkpoint restarts batchIds at 0, and an
          // un-namespaced sweep of "batch 0" would silently un-ingest
          // a previous incarnation's committed batch — r17 advice fix
          val prefix = StreamIdentity.incarnationPrefix(b.sparkSession, streamId)
          graft.sources.IndexStore.requireMonotonicBatch(
            b.sparkSession, indexPath, Seq("ids", "counts"), prefix, batchId)
          val tag = StreamIdentity.batchTag(prefix, batchId)
          // heal a crashed prior attempt of THIS batch before probing:
          // its partial rows are phantom corpus occurrences to the
          // probe and would trip the disjointness gate on the replay
          DedupQueries.sweepSubstrStreamBatch(b.sparkSession, indexPath, tag)
          val spans = DedupQueries.probeStoredSubstrIndex(
            b.sparkSession, indexPath, b, k)
          onSpans(spans, batchId)
          DedupQueries.appendStoredSubstrIndexTagged(
            b.sparkSession, indexPath, b, tag, k)
        }
      } finally b.unpersist()
    }
}
