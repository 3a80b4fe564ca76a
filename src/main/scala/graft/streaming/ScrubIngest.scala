package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.ContaminationQueries

/** STREAMING decontamination scrub — the third stored-index ingest loop
  * (after DedupIngest's MinHash probe/append and EmbedIngest's ANN
  * catalog): each micro-batch of arriving documents is probed against
  * the PERSISTED eval-gram index
  * ([[ContaminationQueries.initStoredEvalIndex]]) and every arrival
  * sharing an n-gram with the benchmark set is emitted to
  * `onFlagged(flagged, batchId)` — quarantine before the corpus ever
  * ingests a leaked eval document.
  *
  * Unlike DedupIngest there is NO append step: the eval set is a fixed
  * benchmark that arrivals never join, so the stream is pure probe —
  * stateless (no streaming state store; the index on disk is the only
  * state), identical semantics per batch to the x2/x3 scrub restricted
  * to the batch (BloomScrubSpec pins that equality), and trivially
  * idempotent on replay (re-probing a batch re-emits the same flags;
  * key the sink by batchId for exactly-once effects, the standard
  * foreachBatch discipline).
  *
  * Scale shape per batch: the eval index rides in as the serialized
  * Bloom filter (compact broadcast, codegen'd membership probe) and a
  * parquet gram table for the exact confirm — only the BATCH is
  * grammed; cost is O(batch postings), independent of how long the
  * stream has run and of corpus size.
  */
object ScrubIngest {

  /** Build the foreachBatch writer for a streaming `(doc_id, text)`
    * frame against the eval index at `indexPath` (created by
    * `ContaminationQueries.initStoredEvalIndex`; the geometry stamp's
    * `n` must match, enforced at BUILD time). The index is fixed for
    * the stream's lifetime, so the stamp check, bloom deserialization
    * and broadcast happen ONCE here — not per micro-batch, which would
    * re-read the bloom parquet and accumulate never-freed broadcast
    * copies on a stream triggering every few seconds. The caller sets
    * trigger/checkpoint options and calls `.start()`. */
  def scrubIngest(docs: DataFrame, indexPath: String,
                  onFlagged: (DataFrame, Long) => Unit,
                  n: Int = 4): DataStreamWriter[Row] = {
    val idx = ContaminationQueries.resolveStoredEvalIndex(
      docs.sparkSession, indexPath, n)
    docs.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      val b = batch.persist()
      try {
        if (!b.isEmpty) {
          onFlagged(ContaminationQueries.probeResolved(b, idx), batchId)
        }
      } finally b.unpersist()
    }
  }
}
