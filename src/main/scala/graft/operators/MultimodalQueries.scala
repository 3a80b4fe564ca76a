package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing: media as opaque BINARY payloads with a
  * typed metadata struct, plus decode / feature-extract / frame-sample
  * stages. The container has no image/audio codecs, so the DECODE STEP
  * IS A DETERMINISTIC STUB (byte-level features standing in for pixel
  * decoding — clearly marked below); the Spark-side plumbing (schema,
  * typed Dataset batches, partition-level processing, struct metadata)
  * is real and tested.
  *
  * Scale design: payloads never pass through a shuffle wider than their
  * aggregated features; per-partition batch processing mirrors how a
  * real codec (JNI/native) would be amortized across rows.
  */
object MultimodalQueries {

  /** Synthesize the media table: documents' text bytes as the opaque
    * payload + deterministic typed metadata (format/width/height/frames).
    */
  private def media(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        when(col("doc_id") % 3 === 0, "png").when(col("doc_id") % 3 === 1, "jpeg")
          .otherwise("webp").as("format"),
        (lit(64) + (col("doc_id") % 32) * 16).cast("int").as("width"),
        (lit(64) + (col("doc_id") % 24) * 16).cast("int").as("height"),
        (col("n_chars") / 32 + 1).cast("int").as("n_frames")).as("meta"))

  /** Metadata + payload-size stats per format — pure relational ops over
    * the multimodal schema (oracle-checked; byte lengths are exact). */
  val mMeta = QueryDef(
    "mm1_media_metadata",
    (s, dir) =>
      media(s, dir)
        .groupBy(col("meta.format").as("format"))
        .agg(
          count(lit(1)).as("n_media"),
          sum(length(col("payload")).cast("long")).as("total_bytes"),
          max(col("meta.width")).cast("long").as("max_width"),
          sum(col("meta.n_frames").cast("long")).as("total_frames"))
        .orderBy("format"),
    Some("""
      SELECT CASE WHEN doc_id % 3 = 0 THEN 'png' WHEN doc_id % 3 = 1 THEN 'jpeg'
                  ELSE 'webp' END AS format,
             COUNT(*) AS n_media,
             CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
             CAST(MAX(64 + (doc_id % 32) * 16) AS BIGINT) AS max_width,
             CAST(SUM(n_chars // 32 + 1) AS BIGINT) AS total_frames
      FROM documents GROUP BY 1 ORDER BY 1"""))

  /** Decode + feature-extract over typed partition batches.
    * ??? REAL CODEC GOES HERE: `decodeStub` replaces pixel decoding with
    * a deterministic 16-bin byte histogram (the plumbing — Dataset
    * schema, partition batching, fixed-length feature vectors — is what
    * this operator tests). Oracle-checked: the corpus is pure ASCII, so
    * DuckDB reproduces the byte histogram from codepoints (byte ==
    * unicode(char)); the norm is a left-fold sum on both engines for
    * bit-identical doubles. */
  val mDecode = QueryDef(
    "mm2_decode_features",
    (s, dir) => {
      import s.implicits._
      def decodeStub(payload: Array[Byte]): Array[Double] = {
        val hist = new Array[Double](16)
        var i = 0
        while (i < payload.length) { hist((payload(i) & 0xFF) / 16) += 1.0; i += 1 }
        if (payload.length > 0) { var j = 0; while (j < 16) { hist(j) /= payload.length; j += 1 } }
        hist
      }
      val ds = media(s, dir).select(col("media_id"), col("payload"))
        .as[(Long, Array[Byte])]
      ds.mapPartitions { batch =>
        // partition-level loop = where a native codec handle would live
        batch.map { case (id, bytes) =>
          val f = decodeStub(bytes)
          (id, f, math.sqrt(f.map(x => x * x).sum))
        }
      }.toDF("media_id", "features", "feature_norm")
        .select(col("media_id"),
          round(col("feature_norm"), 6).as("feature_norm"),
          round(element_at(col("features"), 1), 6).as("bin0"),
          round(element_at(col("features"), 8), 6).as("bin7"))
        .orderBy("media_id")
    },
    Some("""
      WITH b AS (
        SELECT doc_id,
               list_transform(range(1, length(text) + 1),
                              i -> unicode(substring(text, i, 1)) // 16) AS bins,
               CAST(length(text) AS DOUBLE) AS n
        FROM documents),
      h AS (
        SELECT doc_id, n,
               -- greatest(n,1) guards the n=0 (empty document) case: the
               -- Spark decodeStub skips normalization and yields all-zero
               -- bins, and 0/1 = 0.0 reproduces that exactly
               list_transform(range(0, 16),
                              k -> len(list_filter(bins, x -> x = k)) / greatest(n, 1)) AS hist
        FROM b)
      SELECT doc_id AS media_id,
             ROUND(sqrt(list_reduce(list_prepend(0.0, list_transform(hist, x -> x * x)),
                                    (a, x) -> a + x)), 6) AS feature_norm,
             ROUND(hist[1], 6) AS bin0,
             ROUND(hist[8], 6) AS bin7
      FROM h ORDER BY media_id"""))

  /** Frame sampling: payload viewed as fixed 32-byte frames, every 4th
    * frame sampled, per-frame digest — binary slicing as expressions.
    * Oracle-checked: md5 of the first sampled frame's bytes matches
    * DuckDB's md5 of the same (ASCII) substring. */
  val mFrames = QueryDef(
    "mm3_frame_sample",
    (s, dir) =>
      media(s, dir)
        .select(col("media_id"), col("payload"), col("meta.n_frames").as("n_frames"))
        .withColumn("sampled_idx", sequence(lit(0), col("n_frames") - 1, lit(4)))
        .withColumn("sampled_frames",
          transform(col("sampled_idx"), i => col("payload").substr(i * 32 + 1, lit(32))))
        .select(
          col("media_id"), col("n_frames"),
          size(col("sampled_idx")).cast("long").as("n_sampled"),
          md5(element_at(col("sampled_frames"), 1)).as("first_frame_md5"))
        .orderBy("media_id"),
    Some("""
      SELECT doc_id AS media_id,
             CAST(n_chars // 32 + 1 AS INT) AS n_frames,
             CAST((n_chars // 32) // 4 + 1 AS BIGINT) AS n_sampled,
             md5(substring(text, 1, 32)) AS first_frame_md5
      FROM documents ORDER BY media_id"""))

  /** Resize stage (mm4): stride decimation of the opaque payload to a
    * ≤64-wide target — the nearest-neighbor downsample shape with the
    * pixel resampler stubbed at the same codec boundary as mm2 (???
    * REAL RESAMPLER GOES HERE: byte stride stands in for 2-D pixel
    * interpolation; the plumbing — stride derived from typed metadata,
    * binary slicing expressions, metadata struct update — is what this
    * operator tests). Output is integer-exact (dims, byte count, byte
    * sum of the resized payload), so the oracle reproduces it from
    * codepoints (pure-ASCII corpus: byte == unicode(char)).
    *
    * Scale: pure map-side expressions per row; payloads never shuffle
    * (the aggregate output is one row per media). */
  val mResize = QueryDef(
    "mm4_resize",
    (s, dir) => {
      val m = media(s, dir)
        .select(col("media_id"), col("payload"), col("meta"))
        .withColumn("stride", ((col("meta.width") + lit(63)) / lit(64)).cast("int"))
      val nOut = greatest(
        (floor((length(col("payload")) - 1) / col("stride")) + 1).cast("long"), lit(0L))
      // sequence(0, -1) yields [0, -1] (auto-negative step), so the
      // empty-payload case must short-circuit to an empty index array
      val idx = when(nOut > 0, sequence(lit(0).cast("long"), nOut - 1))
        .otherwise(array().cast("array<bigint>"))
      val byteAt = (i: org.apache.spark.sql.Column) =>
        conv(hex(col("payload").substr((i * col("stride") + 1).cast("int"), lit(1))),
          16, 10).cast("long")
      m.select(
          col("media_id"), col("stride").cast("long").as("stride"),
          (((col("meta.width") + col("stride") - 1) / col("stride")).cast("long"))
            .as("new_width"),
          (((col("meta.height") + col("stride") - 1) / col("stride")).cast("long"))
            .as("new_height"),
          nOut.as("n_bytes_resized"),
          aggregate(transform(idx, byteAt), lit(0L), (acc, x) => acc + x)
            .as("resized_byte_sum"))
        .orderBy("media_id")
    },
    Some("""
      WITH m AS (
        SELECT doc_id AS media_id, text,
               64 + (doc_id % 32) * 16 AS width,
               64 + (doc_id % 24) * 16 AS height,
               CAST((64 + (doc_id % 32) * 16 + 63) // 64 AS BIGINT) AS stride
        FROM documents)
      -- empty-payload guard mirrors the Spark side's greatest(..., 0)
      -- short-circuit: DuckDB's // truncates toward zero so an empty
      -- payload would yield (0-1)//s + 1 = 1, not 0
      SELECT media_id, stride,
             CAST((width + stride - 1) // stride AS BIGINT) AS new_width,
             CAST((height + stride - 1) // stride AS BIGINT) AS new_height,
             CAST(CASE WHEN octet_length(encode(text)) = 0 THEN 0
                       ELSE (octet_length(encode(text)) - 1) // stride + 1 END
               AS BIGINT) AS n_bytes_resized,
             CAST(list_reduce(list_prepend(0,
               list_transform(range(0, CAST(CASE WHEN octet_length(encode(text)) = 0 THEN 0
                   ELSE (octet_length(encode(text)) - 1) // stride + 1 END AS BIGINT)),
                 i -> unicode(substring(text, CAST(i * stride + 1 AS BIGINT), 1)))),
               (a, x) -> a + x) AS BIGINT) AS resized_byte_sum
      FROM m ORDER BY media_id"""))

  /** Perceptual-hash media dedup (mm5) — the image-dedup step of a
    * multimodal pipeline (LAION/DataComp dedup by aHash/pHash
    * equality): fingerprint each payload with an aHash-style 32-bit
    * code (bit b set iff byte-bin b's mass exceeds the mean bin mass —
    * INTEGER cross-multiplied compare `cnt·32 > total`, no float
    * anywhere) over the SAME stubbed decode boundary as mm2 (??? a
    * real deploy swaps the byte histogram for decoded-pixel cells;
    * the fingerprint packing, grouping and canonical election are the
    * operator), then group EXACT fingerprint matches and emit every
    * member of a ≥2 group with its group size and elected canonical
    * (min media_id).
    *
    * Scale shape: the fingerprint is per-partition map work at the
    * codec boundary (where the native decoder handle would be
    * amortized, the mm2 discipline); the duplicate election is one
    * fingerprint-keyed aggregate + a compact-key join back — payloads
    * never ride a shuffle. Exact-match semantics keep the oracle
    * exact; banded-Hamming widening would follow d3's shape.
    */
  val mPhashDedup = QueryDef(
    "mm5_phash_dedup",
    (s, dir) => {
      import s.implicits._
      def phashStub(payload: Array[Byte]): Long = {
        val cnt = new Array[Long](32)
        var i = 0
        while (i < payload.length) { cnt((payload(i) & 0xFF) / 8) += 1L; i += 1 }
        val total = payload.length.toLong
        var fp = 0L
        var b = 0
        while (b < 32) { if (cnt(b) * 32L > total) fp |= (1L << b); b += 1 }
        fp
      }
      val fps = media(s, dir).select(col("media_id"), col("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bytes) => (id, phashStub(bytes)) })
        .toDF("media_id", "phash")
      val staged = graft.plans.Stage(fps)
      val groups = staged.groupBy("phash")
        .agg(count(lit(1)).as("group_size"),
          min(col("media_id")).as("canonical_id"))
        .filter(col("group_size") >= 2)
      staged.join(groups, Seq("phash"))
        .select(col("media_id"), col("phash"),
          col("group_size"), col("canonical_id"))
        .orderBy("media_id")
    },
    Some("""
      WITH codes AS (
        SELECT doc_id AS media_id, unicode(substring(text, i, 1)) // 8 AS b
        FROM documents, UNNEST(range(1, len(text) + 1)) AS t(i)),
      bins AS (
        SELECT media_id, b, COUNT(*) AS c FROM codes GROUP BY media_id, b),
      tot AS (SELECT media_id, SUM(c) AS t FROM bins GROUP BY media_id),
      fp AS (
        -- LEFT JOIN from documents so an EMPTY payload keeps its row
        -- with fingerprint 0, exactly like the Spark stub (mm2's
        -- empty-document guard, fingerprint form)
        SELECT d.doc_id AS media_id,
               COALESCE(SUM(CASE WHEN c * 32 > t THEN (CAST(1 AS BIGINT) << b)
                                 ELSE 0 END), 0) AS phash
        FROM documents d
             LEFT JOIN bins ON bins.media_id = d.doc_id
             LEFT JOIN tot ON tot.media_id = d.doc_id
        GROUP BY d.doc_id),
      grp AS (
        SELECT phash, COUNT(*) AS group_size, MIN(media_id) AS canonical_id
        FROM fp GROUP BY phash HAVING COUNT(*) >= 2)
      SELECT fp.media_id, CAST(fp.phash AS BIGINT) AS phash,
             grp.group_size, grp.canonical_id
      FROM fp JOIN grp USING (phash)
      ORDER BY fp.media_id"""))

  val all: Seq[QueryDef] = Seq(mMeta, mDecode, mFrames, mResize, mPhashDedup)
}
