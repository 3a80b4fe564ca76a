package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{BpeMatcher, SubwordExpressions}
import graft.sources.Tables

/** Stored-vocab subword (BPE-style) tokenization (t19) — the
  * token-EXACT counter for everything a trainer bills in subword
  * tokens. Every other token-denominated operator (t1 stats, c5
  * budget, t12 chunking, t13 packing, p5 card) counts WHITESPACE
  * tokens; real training stacks count BPE/SentencePiece pieces, and
  * the two diverge 30–60% at corpus scale. t19 closes that gap with
  * the same two-phase discipline as the PQ index family:
  *
  *  1. VOCAB FIT, once per corpus snapshot, stored: the top-`vocabSize`
  *     character substrings (lengths 2–4) of the corpus's words by
  *     frequency (ties piece-ASC) — a deterministic, SQL-restatable
  *     stand-in for BPE merge training whose ENCODE side is exactly the
  *     production shape (greedy longest-match against a frozen vocab;
  *     single characters are the implicit fallback alphabet, so every
  *     word always encodes). Persisted via IndexStore with a
  *     source-fingerprint meta stamp: a regenerated corpus refits, a
  *     re-run reuses.
  *  2. ENCODE, per query, one codegen'd map pass: [[BpeMatcher]] /
  *     `BpeStats` emit struct(n_tokens_bpe, bpe_digest) per document —
  *     no explode, no join; the only shuffle is the presentation sort.
  *
  * The DuckDB oracle restates BOTH phases closed-form — the vocab as a
  * substring-frequency top-k, the greedy encode as a recursive CTE
  * consuming the longest matching prefix per step — so the per-doc
  * subword counts AND the position-keyed piece-sequence digest are
  * hash-compared cross-engine (not a pin: a single mis-encoded piece
  * in any word of any document moves the digest).
  *
  * Scale shape: the fit is one explode→count→top-k pass (the t7 vocab
  * scan shape, ~3 candidate pieces per corpus char) paid once per
  * snapshot; the encode adds zero shuffles to any consumer. At 100 TB
  * the stored vocab is a driver-sized artifact (64 pieces here;
  * production vocabs are ~100k entries ≈ a few MB — still a broadcast
  * reference object, the MinHashK/PQ-books pattern).
  */
object SubwordQueries {

  private[graft] val vocabSize = 64

  /** All 2–4-char substrings of every corpus word (the BPE-ish
    * candidate stream: ~3 pieces per corpus character). */
  private def vocabCandidates(docs: DataFrame): DataFrame = {
    val words = QueryDef.spread(docs)
      .select(explode(split(col("text"), " ")).as("w"))
    val len = length(col("w"))
    def subs(l: Int) = when(len >= l,
      transform(sequence(lit(1), len - l + 1), i => col("w").substr(i, lit(l))))
      .otherwise(typedlit(Seq.empty[String]))
    words.select(explode(concat(subs(2), subs(3), subs(4))).as("piece"))
  }

  /** Fit the frozen vocab: top-`vocabSize` pieces by (count DESC,
    * piece ASC) — deterministic tie-break, identical in the oracle. */
  private[graft] def fitVocab(docs: DataFrame): Array[String] =
    vocabCandidates(docs)
      .groupBy("piece").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("piece").asc)
      .limit(vocabSize)
      .select("piece").collect().map(_.getString(0))

  // read-back memo, keyed like the PQ index memo: applicationId + dir +
  // the source-fingerprint meta, so a regenerated corpus within one
  // application computes a new key and refits instead of serving stale
  // pieces; superseded-snapshot entries are evicted
  private val vocabMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, String, String), Array[String]]()

  /** Build-once-then-read the persisted vocab table (rank, piece). */
  def storedVocab(s: SparkSession, dir: String): Array[String] = {
    val path = graft.sources.IndexStore.indexPath(dir, s"bpe_vocab_$vocabSize")
    val meta = s"v1|size=$vocabSize|" +
      s"src=${graft.sources.IndexStore.sourceStamp(s, s"$dir/documents.parquet")}"
    val appId = s.sparkContext.applicationId
    vocabMemo.keySet.removeIf(k => k._1 == appId && k._2 == dir && k._3 != meta)
    vocabMemo.computeIfAbsent((appId, dir, meta), _ => {
      graft.sources.IndexStore.ensure(s, path, meta) {
        import s.implicits._
        fitVocab(Tables.documents(s, dir)).zipWithIndex
          .map { case (p, i) => (i, p) }.toSeq.toDF("rank", "piece")
          .repartition(1).write.mode("overwrite").parquet(s"$path/vocab")
      }
      s.read.parquet(s"$path/vocab").orderBy("rank")
        .collect().map(_.getString(1))
    })
  }

  val tBpeTokens = QueryDef(
    "t19_bpe_tokens",
    (s, dir) => {
      val matcher = new BpeMatcher(storedVocab(s, dir))
      Tables.documents(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .select(col("doc_id"),
          size(col("tk")).cast("long").as("n_tokens_ws"),
          SubwordExpressions.bpeStats(col("tk"), matcher).as("s"))
        .select(col("doc_id"), col("n_tokens_ws"),
          col("s.n_tokens_bpe").as("n_tokens_bpe"),
          round(col("s.n_tokens_bpe").cast("double") / col("n_tokens_ws"), 6)
            .as("bpe_per_ws"),
          col("s.bpe_digest").as("bpe_digest"))
        .orderBy("doc_id")
    },
    Some("""
      WITH words AS (
        SELECT doc_id, tk[i] AS w, i AS widx
        FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
             UNNEST(range(1, len(tk) + 1)) AS t(i)),
      cand AS (
        SELECT substring(w, i, l) AS piece
        FROM words,
             UNNEST(range(1, len(w) + 1)) AS t(i),
             (VALUES (2), (3), (4)) AS ll(l)
        WHERE i + l - 1 <= len(w)),
      vc AS (
        SELECT piece FROM (
          SELECT piece, COUNT(*) AS c FROM cand GROUP BY piece
          ORDER BY c DESC, piece ASC LIMIT 64)),
      enc AS (
        WITH RECURSIVE e(doc_id, widx, rem, n_pieces, dig) AS (
          SELECT doc_id, widx, w, 0, CAST(0 AS BIGINT) FROM words
          UNION ALL
          SELECT doc_id, widx, substring(rem, len(best) + 1), n_pieces + 1,
                 (dig * 31 + len(best) + ascii(best)) % 1000000007
          FROM (
            SELECT doc_id, widx, rem, n_pieces, dig,
                   CASE WHEN substring(rem, 1, 4) IN (SELECT piece FROM vc)
                          THEN substring(rem, 1, 4)
                        WHEN substring(rem, 1, 3) IN (SELECT piece FROM vc)
                          THEN substring(rem, 1, 3)
                        WHEN substring(rem, 1, 2) IN (SELECT piece FROM vc)
                          THEN substring(rem, 1, 2)
                        ELSE substring(rem, 1, 1) END AS best
            FROM e WHERE rem <> ''))
        SELECT doc_id, widx, n_pieces, dig FROM e WHERE rem = ''),
      agg AS (
        SELECT doc_id,
               CAST(SUM(n_pieces) AS BIGINT) AS n_tokens_bpe,
               CAST(SUM(widx * 1000003 + dig) AS BIGINT) AS bpe_digest
        FROM enc GROUP BY doc_id),
      ws AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens_ws
        FROM documents)
      SELECT ws.doc_id, ws.n_tokens_ws, agg.n_tokens_bpe,
             ROUND(CAST(agg.n_tokens_bpe AS DOUBLE) / ws.n_tokens_ws, 6)
               AS bpe_per_ws,
             agg.bpe_digest
      FROM ws JOIN agg USING (doc_id) ORDER BY ws.doc_id"""))

  /** Token-EXACT budget selection (c11) — c5's budget machinery
    * denominated in SUBWORD tokens: the r13 verdict's core critique of
    * the token-denominated operators was that a whitespace-budgeted
    * release materially misses a trainer's subword token target (the
    * fixture already diverges >1.3×; real stacks 30–60%). c11 closes
    * it by composition: the same t2 quality rule, the same
    * bin-threshold + recursive-range budget selector (no un-partitioned
    * window — `SampleQueries.tokenBudgetSelect` scaladoc), but
    * `n_tokens` is `BpeStats` against the stored t19 vocab. One staged
    * feature pass (quality + subword count in the same projection);
    * everything downstream is c5's bounded-state plan.
    *
    * The oracle restates the full composition closed-form: t19's vocab
    * fit + recursive greedy encode feeding c5's naive global cumsum
    * window — the plan that dies at scale is exactly what DuckDB can
    * afford at sf, which is the point of the oracle split. */
  private[graft] def bpeQualityFrame(docs: DataFrame,
                                     matcher: BpeMatcher): DataFrame = {
    import graft.plans.Stage.StageOps
    QueryDef.spread(docs)
      .select(col("doc_id"), col("n_chars"), split(col("text"), " ").as("tk"))
      .select(col("doc_id"),
        SubwordExpressions.bpeStats(col("tk"), matcher)
          .getField("n_tokens_bpe").as("n_tokens"),
        TextQueries.qualityExpr(col("tk"), col("n_chars")).as("quality"))
      .staged // feeds the bin aggregate + both filtered reads (c5 shape)
  }

  val cTokenBudgetBpe = QueryDef(
    "c11_token_budget_bpe",
    (s, dir) => {
      val matcher = new BpeMatcher(storedVocab(s, dir))
      SampleQueries.tokenBudgetSelect(
          bpeQualityFrame(Tables.documents(s, dir), matcher), budget = 40000L)
        .select(col("doc_id"), col("n_tokens").as("n_tokens_bpe"), col("quality"))
        .orderBy(col("quality").desc, col("doc_id"))
    },
    Some("""
      WITH words AS (
        SELECT doc_id, tk[i] AS w
        FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
             UNNEST(range(1, len(tk) + 1)) AS t(i)),
      cand AS (
        SELECT substring(w, i, l) AS piece
        FROM words,
             UNNEST(range(1, len(w) + 1)) AS t(i),
             (VALUES (2), (3), (4)) AS ll(l)
        WHERE i + l - 1 <= len(w)),
      vc AS (
        SELECT piece FROM (
          SELECT piece, COUNT(*) AS c FROM cand GROUP BY piece
          ORDER BY c DESC, piece ASC LIMIT 64)),
      enc AS (
        WITH RECURSIVE e(doc_id, rem, n_pieces) AS (
          SELECT doc_id, w, 0 FROM words
          UNION ALL
          SELECT doc_id, substring(rem, len(best) + 1), n_pieces + 1
          FROM (
            SELECT doc_id, rem, n_pieces,
                   CASE WHEN substring(rem, 1, 4) IN (SELECT piece FROM vc)
                          THEN substring(rem, 1, 4)
                        WHEN substring(rem, 1, 3) IN (SELECT piece FROM vc)
                          THEN substring(rem, 1, 3)
                        WHEN substring(rem, 1, 2) IN (SELECT piece FROM vc)
                          THEN substring(rem, 1, 2)
                        ELSE substring(rem, 1, 1) END AS best
            FROM e WHERE rem <> ''))
        SELECT doc_id, n_pieces FROM e WHERE rem = ''),
      bpe AS (
        SELECT doc_id, CAST(SUM(n_pieces) AS BIGINT) AS n_tokens_bpe
        FROM enc GROUP BY doc_id),
      b AS (
        SELECT doc_id, n_chars, string_split(text, ' ') AS tk,
               CAST(len(string_split(text, ' ')) AS DOUBLE) AS nt
        FROM documents),
      q AS (
        SELECT doc_id,
               ROUND(CASE WHEN n_chars BETWEEN 100 AND 5000 THEN 0.5 ELSE 0.0 END
                 + len(list_filter(tk, t -> t IN ('the','a','and','of','to','in'))) / nt * 0.25
                 + len(list_distinct(tk)) / nt * 0.25, 6) AS quality
        FROM b),
      sel AS (
        SELECT q.doc_id, bpe.n_tokens_bpe, q.quality,
               SUM(bpe.n_tokens_bpe) OVER (ORDER BY q.quality DESC, q.doc_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM q JOIN bpe USING (doc_id))
      SELECT doc_id, n_tokens_bpe, quality FROM sel WHERE cum <= 40000
      ORDER BY quality DESC, doc_id"""))

  val all: Seq[QueryDef] = Seq(tBpeTokens, cTokenBudgetBpe)
}
