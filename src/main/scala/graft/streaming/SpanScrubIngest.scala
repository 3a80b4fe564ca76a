package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.DedupQueries

/** STREAMING duplicated-passage REMOVAL — the fourth stored-index
  * ingest loop (after DedupIngest's MinHash probe/append, EmbedIngest's
  * ANN catalog, and ScrubIngest's decontamination probe): each
  * micro-batch of arriving documents is REWRITTEN against the persisted
  * span index ([[DedupQueries.initStoredSpanIndex]]) — every 8-token
  * window occurring in ≥2 distinct docs across corpus ∪ batch is
  * excised, exactly d9's batch semantics restricted to the batch
  * (StreamingSpec pins the batch-twin equality) — and the batch's span
  * counts are then folded into the index, so the NEXT batch is scrubbed
  * against everything before it.
  *
  * Scale shape per batch: only the batch is tokenized/exploded; the
  * corpus-sized span table is touched through one broadcast hash join
  * on the batch's distinct spans; the append is O(batch) parquet rows.
  * State lives entirely in the stored index — the stream itself is
  * stateless and survives any corpus size.
  *
  * Delivery semantics mirror DedupIngest: rewritten docs are emitted
  * at-least-once relative to the streaming checkpoint (key `onScrubbed`
  * writes by `batchId` for idempotent sinks); the INDEX append is
  * EXACTLY-ONCE under crash/replay — per-batchId sweep-stage-rename
  * publication (`appendStoredSpanIndexTagged`), with the batch start
  * sweeping any crashed prior attempt BEFORE the scrub probe (partial
  * span counts would otherwise inflate duplicate decisions on the
  * replay). A genuine duplicate doc still trips the raw-id gate
  * loudly; compact only a cleanly-stopped stream (DedupIngest's
  * quiesce contract).
  */
object SpanScrubIngest {

  /** Build the foreachBatch writer for a streaming `(doc_id, text)`
    * frame against the appendable span index at `indexPath` (created by
    * `DedupQueries.initStoredSpanIndex`). The caller sets
    * trigger/checkpoint options and calls `.start()`. */
  def spanScrubIngest(docs: DataFrame, indexPath: String,
                      onScrubbed: (DataFrame, Long) => Unit,
                      streamId: Option[String] = None): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      // the batch feeds two lifecycle calls (probe, then append), each
      // with several actions over it — pin it once
      val b = batch.persist()
      try {
        if (!b.isEmpty) {
          // incarnation-namespaced tag — see StreamIdentity (r17 advice)
          val prefix = StreamIdentity.incarnationPrefix(b.sparkSession, streamId)
          graft.sources.IndexStore.requireMonotonicBatch(
            b.sparkSession, indexPath, Seq("ids", "spans"), prefix, batchId)
          val tag = StreamIdentity.batchTag(prefix, batchId)
          DedupQueries.sweepSpanStreamBatch(b.sparkSession, indexPath, tag)
          onScrubbed(DedupQueries.probeSpanScrub(b.sparkSession, indexPath, b),
            batchId)
          DedupQueries.appendStoredSpanIndexTagged(b.sparkSession, indexPath, b, tag)
        }
      } finally b.unpersist()
    }
}
