package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.OlapQueries

/** STREAMING maintenance of the stored monthly sketch table (the q30
  * lifecycle run as a Structured Streaming sink) — the lambda-
  * architecture dashboard pattern: order events arrive continuously,
  * each micro-batch folds its monthly HLL partials into the PERSISTED
  * sketch table (`OlapQueries.appendSketchTable`), and rollups keep
  * reading months×batches sketch rows with zero raw-order rescan.
  *
  *  1. APPEND: the batch's per-(yr, mo) partial sketches land as new
  *     rows tagged `q<queryId>_b<batchId>` (see [[StreamIdentity]]) —
  *     O(batch) work, history is
  *     never rewritten; the lgK geometry stamp is enforced per batch.
  *  2. `onRollup(quarterlyRollup, batchId)` hands the caller the
  *     refreshed rollup over the stored table (dashboard refresh,
  *     sink table, alerting — caller's choice). Register-max union is
  *     order-independent, so the rollup after batch N equals a batch
  *     job that appended the same N slices in any order.
  *
  * State lives entirely in the stored parquet table — the stream holds
  * no state-store entries and survives any history size. Delivery is
  * EXACTLY-ONCE under crash/replay: each batch lands via
  * `appendSketchTableReplayable` — sweep any previous attempt's
  * deterministically-named files, stage, publish by rename — so a
  * batch replayed after a crash between its append and the checkpoint
  * commit converges to the same table instead of fail-stopping
  * (StreamingSpec pins replay equality against the batch twin). A tag
  * already absorbed by a compaction is skipped: compaction requires
  * quiesced ingest, so an absorbed tag was a completed append.
  *
  * Reference trigger: the reference's workload summarises simulation
  * batches as they complete (simulation.R:204-276); this is the same
  * accumulate-partials-then-summarise shape with mergeable sketch
  * state instead of exact sums.
  */
object SketchIngest {

  /** Build the foreachBatch writer for a streaming orders frame (must
    * carry `o_orderdate`, `o_custkey`) against the appendable sketch
    * table at `path` (created by `OlapQueries.initSketchTable` — the
    * lgK stamped there must match `lgK` here, enforced per batch). The
    * caller sets trigger/checkpoint options and calls `.start()`. */
  def sketchIngest(orders: DataFrame, path: String,
                   onRollup: (DataFrame, Long) => Unit,
                   lgK: Int = 12,
                   streamId: Option[String] = None): DataStreamWriter[Row] =
    orders.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      val b = batch.persist()
      try {
        if (!b.isEmpty) {
          // incarnation-namespaced tag — see StreamIdentity (r17 advice)
          val prefix = StreamIdentity.incarnationPrefix(b.sparkSession, streamId)
          graft.sources.IndexStore.requireMonotonicBatch(
            b.sparkSession, path, Seq("months"), prefix, batchId)
          OlapQueries.appendSketchTableReplayable(
            b.sparkSession, path, b, StreamIdentity.batchTag(prefix, batchId), lgK)
          onRollup(OlapQueries.quarterlyRollup(b.sparkSession, path, lgK), batchId)
        }
      } finally b.unpersist()
    }
}
