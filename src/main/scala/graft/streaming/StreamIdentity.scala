package graft.streaming

import org.apache.spark.sql.SparkSession

/** Per-incarnation namespace for streaming ingest batch tags (r18,
  * closes the r17 advice finding on `SubstrIngest`).
  *
  * THE BUG THIS PREVENTS: the ingest objects used to tag appends
  * `stream_<batchId>` alone. Micro-batch ids restart at 0 for a FRESH
  * checkpoint, so restarting ingestion with a new checkpoint against an
  * existing index made the batch-0 sweep delete a PREVIOUS incarnation's
  * committed batch-0 tagged files before probing — silently un-ingesting
  * that batch (missed duplicates forever) instead of fail-stopping,
  * because removing its ids rows also disarmed the disjointness gate.
  *
  * THE FIX: namespace every tag with the streaming query's CHECKPOINTED
  * id — `q<queryId>_b<batchId>`. Spark stamps the id on the micro-batch
  * execution thread (local property `sql.streaming.queryId`); it is
  * stable across restarts from the SAME checkpoint (it lives in the
  * checkpoint's metadata file, which is exactly what makes replays of
  * the same incarnation recognizable) and fresh for a fresh checkpoint.
  * So: a crash/replay of batch N sweeps and republishes ITS OWN files
  * and converges; a fresh-checkpoint restart gets a new namespace whose
  * batch-0 sweep can touch nothing of the old incarnation, and the
  * disjointness gate then fail-stops on re-sent doc_ids — loud, the
  * correct behavior the old scheme silently bypassed.
  *
  * Defense in depth: the ingests also call
  * `IndexStore.requireMonotonicBatch` before sweeping, which fail-stops
  * a REWOUND incarnation (same query id, batchId lower than a tag
  * already committed — only reachable by hand-editing the checkpoint's
  * offsets while keeping its metadata). A genuine replay can only be of
  * the LATEST batch (Spark re-runs at most the one uncommitted batch),
  * so "a committed tag with a HIGHER batchId exists" proves the current
  * call is not a replay.
  */
object StreamIdentity {

  /** Local-property key `StreamExecution` sets on its micro-batch
    * thread (public Spark behavior since 2.x: `StreamExecution.
    * QUERY_ID_KEY`); the value is the query's checkpointed id. */
  private[streaming] val QueryIdKey = "sql.streaming.queryId"

  /** The incarnation namespace for tags: `q<id>` from the checkpointed
    * query id, or from an explicit caller-supplied `streamId` (for
    * driving the ingest body outside a real streaming query — tests,
    * backfills). Filename-safe by construction (tag charset is
    * [A-Za-z0-9_-]; query ids are UUIDs). */
  def incarnationPrefix(s: SparkSession, streamId: Option[String] = None): String =
    prefixOf(streamId
      .orElse(Option(s.sparkContext.getLocalProperty(QueryIdKey)))
      .getOrElse(sys.error(
        "no streaming query id on this thread and no explicit streamId — " +
          "pass streamId to the ingest builder when invoking its batch " +
          "body outside a streaming query")))

  /** The prefix for a KNOWN id — what a restart/replay driver uses to
    * reconstruct a running query's tags (`prefixOf(q.id.toString)`).
    *
    * `q<ascii-safe form>-<md5(raw) prefix>` — the hash suffix is
    * UNCONDITIONAL: a sanitize-only scheme collapses "job 1" and
    * "job1" into one namespace (driver B's batch-0 sweep then deletes
    * driver A's committed batch-0 files — the cross-incarnation
    * un-ingestion this class exists to prevent), and a conditional
    * suffix reopens the same hole across branches (a safe id crafted
    * as '<x>-<hex>' colliding with an unsafe id sanitizing to '<x>').
    * Hashing ALWAYS makes distinct raw ids distinct prefixes up to
    * md5, with the sanitized form kept only for operator readability.
    * Safety is ASCII-only — `publishTaggedAppend` enforces the
    * [A-Za-z0-9_-] tag charset, and Char.isLetterOrDigit alone would
    * pass a non-ASCII id here only to fail every batch at the fold. */
  def prefixOf(rawId: String): String = {
    val safe = rawId.filter(c =>
      (c < 0x80 && c.isLetterOrDigit) || c == '-' || c == '_')
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(rawId.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    s"q${if (safe.nonEmpty) safe else "id"}-$h"
  }

  /** The per-batch tag under an incarnation prefix. */
  def batchTag(prefix: String, batchId: Long): String = s"${prefix}_b$batchId"
}
