package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.VectorQueries

/** STREAMING embedding ingest over the stored PQ index — the ANN
  * sibling of [[DedupIngest]]: each micro-batch of new `(vec_id,
  * embedding)` vectors
  *
  *  1. PROBES the accumulated index for each arrival's top-k nearest
  *     catalog items (code-only IVFADC: routing + partition-pruned ADC
  *     scan + bounded top-k — `VectorQueries.adcProbe`; no exact
  *     re-rank, because the stream holds only the 64×-compressed code
  *     table, never the raw corpus embeddings) and hands the matches
  *     to `onNeighbors(matches, batchId)`;
  *  2. APPENDS the batch, encoded with the index's FROZEN codebooks
  *     (`appendStoredPqIndex` — the FAISS discipline: quantizers train
  *     at snapshot time, never per batch), so later arrivals match
  *     against it.
  *
  * Unlike the dedup ingest (which surfaces in-batch pairs too — a
  * duplicate is a duplicate wherever it came from), this probes the
  * PRE-batch index only: "match each arrival against the catalog" is
  * the product semantics (dedup-at-ingest, related-item lookup), and
  * in-batch self-matches would rank an item against things that are
  * not yet catalog. State lives in the stored index — the stream
  * itself is stateless and the per-batch cost is O(batch routing +
  * pruned code scan + batch encode), independent of history length.
  * Same delivery semantics as DedupIngest: at-least-once emission
  * (key `onNeighbors` writes by batchId); the INDEX append is
  * EXACTLY-ONCE under crash/replay — per-batchId sweep-stage-rename
  * publication (`appendStoredPqIndexTagged`), with the batch start
  * sweeping any crashed prior attempt's code files BEFORE the probe
  * (partial codes would otherwise surface as phantom catalog items on
  * the replay). A genuine duplicate vec_id still trips the gate;
  * compact only a cleanly-stopped stream (DedupIngest's quiesce
  * contract).
  */
object EmbedIngest {

  /** Build the foreachBatch writer for a streaming `(vec_id,
    * embedding)` frame against the appendable PQ index at `indexPath`
    * (created by `VectorQueries.initStoredPqIndex`). The caller sets
    * trigger/checkpoint options and calls `.start()`. */
  def annIngest(emb: DataFrame, indexPath: String,
                onNeighbors: (DataFrame, Long) => Unit,
                nprobe: Int = 4, topK: Int = 3,
                streamId: Option[String] = None): DataStreamWriter[Row] =
    emb.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      val b = batch.persist()
      try {
        if (!b.isEmpty) {
          val s = b.sparkSession
          // incarnation-namespaced tag — see StreamIdentity (r17 advice)
          val prefix = StreamIdentity.incarnationPrefix(s, streamId)
          graft.sources.IndexStore.requireMonotonicBatch(
            s, indexPath, Seq("codes"), prefix, batchId)
          val tag = StreamIdentity.batchTag(prefix, batchId)
          VectorQueries.sweepPqStreamBatch(s, indexPath, tag)
          val idx = VectorQueries.readStoredPqIndex(s, indexPath)
          val probes = b.select(col("vec_id").as("q"), col("embedding").as("qe"))
          onNeighbors(VectorQueries.adcProbe(s, idx, probes, nprobe, topK), batchId)
          VectorQueries.appendStoredPqIndexTagged(s, indexPath, b, tag)
        }
      } finally b.unpersist()
    }
}
