package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.DedupQueries

/** STREAMING incremental near-dup detection — the stored-index ingest
  * loop (init → probe → append, the day-over-day batch shape of
  * `DedupQueries.probeStoredIndex`/`appendStoredIndex`) run as a
  * Structured Streaming sink. Each micro-batch of new documents:
  *
  *  1. PROBES the persisted MinHash signature/band index: emits every
  *     near-dup pair that touches the batch — against the whole corpus
  *     the index has accumulated AND within the batch itself — with
  *     exactly the semantics of a full re-mine restricted to
  *     batch-touching pairs (IncrementalDedupSpec pins that equality
  *     for the underlying probe);
  *  2. hands the pairs to `onPairs(pairs, batchId)` (write to a sink
  *     table, quarantine queue, metrics — caller's choice);
  *  3. APPENDS the batch's ids/signatures/band keys to the index, so
  *     the NEXT batch probes corpus ∪ everything-before-it.
  *
  * Scale shape: per batch the corpus side is touched only through the
  * broadcast band-bucket probe (ids-only, candidate-bounded — no
  * corpus re-shingling, no corpus shuffle) and the append is
  * O(batch) parquet writes. State lives entirely in the stored index,
  * not in a streaming state store, so the stream itself is stateless
  * and survives any corpus size; `DedupQueries.compactStoredIndex`
  * handles the accumulating small files from the maintenance job.
  *
  * Delivery semantics: pairs are emitted at-least-once relative to the
  * streaming checkpoint (key `onPairs` writes by `batchId` to make the
  * sink idempotent, the standard foreachBatch discipline). The INDEX
  * append is EXACTLY-ONCE under crash/replay: each batch's rows
  * publish under deterministic per-batchId file names (sweep-stage-
  * rename, `DedupQueries.appendStoredIndexTagged`), and the batch
  * start sweeps any crashed prior attempt's files BEFORE probing — so
  * a replay probes the same corpus state and converges to the same
  * index, while a genuine duplicate doc (a different batch re-sending
  * an id) still trips the disjointness gate loudly. Quiesce contract:
  * compact only a cleanly-stopped stream (a compaction absorbs tag
  * files, after which a replay cannot recognize its prior attempt —
  * the gate then fail-stops rather than double-appending).
  */
object DedupIngest {

  /** Build the foreachBatch writer for a streaming `(doc_id, text)`
    * frame against the appendable index at `indexPath` (created by
    * `DedupQueries.initStoredIndex` — the geometry stamp there must
    * match `(k, bands)` here, enforced per batch). The caller sets
    * trigger/checkpoint options and calls `.start()`. */
  /** The per-batch dedup body (factored r20 so the composed crawl
    * front-door — [[CrawlIngest]] — and direct drivers share it):
    * sweep a crashed prior attempt → probe → hand pairs to the caller
    * → tagged index fold. Returns the same pair frame handed to
    * `onPairs` (its file listing is pinned at probe time, so
    * evaluating it after this call cannot see the fold's own
    * appends). */
  private[graft] def ingestDedupBatch(s: org.apache.spark.sql.SparkSession,
                                      indexPath: String, batch: DataFrame,
                                      prefix: String, batchId: Long,
                                      k: Int, bands: Int, threshold: Double,
                                      onPairs: (DataFrame, Long) => Unit): DataFrame = {
    graft.sources.IndexStore.requireMonotonicBatch(
      s, indexPath, Seq("ids", "sig", "bands"), prefix, batchId)
    val tag = StreamIdentity.batchTag(prefix, batchId)
    // heal a crashed prior attempt of THIS batch before probing:
    // its partial rows are phantom corpus docs to the probe and
    // would trip the disjointness gate on the replay
    DedupQueries.sweepStreamBatch(s, indexPath, tag)
    val pairs = DedupQueries.probeStoredIndex(
      s, indexPath, batch, k, bands, threshold)
    onPairs(pairs, batchId)
    DedupQueries.appendStoredIndexTagged(s, indexPath, batch, tag, k, bands)
    pairs
  }

  def dedupIngest(docs: DataFrame, indexPath: String,
                  onPairs: (DataFrame, Long) => Unit,
                  k: Int = 16, bands: Int = 4,
                  threshold: Double = 0.5,
                  streamId: Option[String] = None): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      // the batch feeds two lifecycle calls (probe, then append), each
      // with several actions over it — pin it once
      val b = batch.persist()
      try {
        if (!b.isEmpty) {
          // tag namespaced per stream INCARNATION (checkpointed query
          // id), so a fresh-checkpoint restart can never sweep a prior
          // incarnation's committed batch — see StreamIdentity
          val prefix = StreamIdentity.incarnationPrefix(b.sparkSession, streamId)
          ingestDedupBatch(b.sparkSession, indexPath, b.toDF(), prefix,
            batchId, k, bands, threshold, onPairs)
          ()
        }
      } finally b.unpersist()
    }
}
