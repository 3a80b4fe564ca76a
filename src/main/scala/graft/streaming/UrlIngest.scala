package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.UrlQueries

/** STREAMING URL-keyed dedup ingest — d14b's stored-index loop (init →
  * probe → append) run as a Structured Streaming sink: the ninth
  * lifecycle, giving the URL keeper family the same streaming seat the
  * MinHash / line / substring indexes have. Each micro-batch of newly
  * crawled `(doc_id, url)` rows:
  *
  *  1. PROBES the persisted canonical-URL keeper table: per batch doc,
  *     the keeper and the three-way verdict (`dup_of_stored` —
  *     first-crawled wins; `unique`; `dup_in_batch`) — exactly
  *     `probeUrlBatch` against corpus ∪ everything-before-this-batch;
  *  2. hands the verdict frame to `onVerdicts(verdicts, batchId)`
  *     (fetch-dedup filter, refetch scheduler, crawl metrics —
  *     caller's choice);
  *  3. APPENDS the batch's NEW canonical keepers, so the next batch
  *     probes them as stored.
  *
  * Scale shape: the index is touched only through the guarded-
  * broadcast map-side semi join (scanned once per batch, never
  * shuffled); the append is O(new addresses in the batch) parquet
  * rows. State lives in the stored index, not a streaming state store
  * — the stream is stateless and survives any corpus size.
  *
  * Delivery semantics: verdicts emit at-least-once relative to the
  * streaming checkpoint (key `onVerdicts` writes by `batchId` — the
  * foreachBatch idempotence discipline). The keeper append is
  * EXACTLY-ONCE under crash/replay via the tagged-publish contract:
  * deterministic per-batchId file names namespaced by the checkpointed
  * query id (stream incarnation), the batch start sweeps a crashed
  * prior attempt's files BEFORE probing (so a replay probes the same
  * corpus state and converges), and a rewound checkpoint fail-stops at
  * the monotonic-batch gate.
  */
object UrlIngest {

  /** Build the foreachBatch writer for a streaming `(doc_id, url)`
    * frame against the keeper index at `indexPath` (created by
    * `UrlQueries.initStoredUrlIndex`). The caller sets trigger /
    * checkpoint options and calls `.start()`. */
  def urlIngest(docs: DataFrame, indexPath: String,
                onVerdicts: (DataFrame, Long) => Unit,
                streamId: Option[String] = None): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      val b = batch.persist()
      try {
        if (!b.isEmpty) {
          val prefix = StreamIdentity.incarnationPrefix(b.sparkSession, streamId)
          graft.sources.IndexStore.requireMonotonicBatch(
            b.sparkSession, indexPath, Seq("keepers"), prefix, batchId)
          val tag = StreamIdentity.batchTag(prefix, batchId)
          // one canonicalization + one index scan feed BOTH the probe
          // and the fold (UrlQueries.ingestUrlBatch threads the staged
          // frames); verdicts reach the caller before the fold
          UrlQueries.ingestUrlBatch(b.sparkSession, indexPath, b, tag,
            verdicts => onVerdicts(verdicts, batchId))
          ()
        }
      } finally b.unpersist()
    }
}
