package graft.operators

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deterministic corpus sampling / mixing — the reproducibility-critical
  * step of assembling a pretraining mix: each source gets a target keep
  * rate and membership is decided by a CONTENT-KEYED hash of the doc id,
  * never by `rand()` (partition-order-dependent) or reservoir state.
  * Rerunning on any cluster layout, or on yesterday's corpus plus new
  * docs, keeps exactly the same docs — the property training-data
  * pipelines need for ablations and incremental rebuilds.
  *
  * Mechanism: md5(doc_id) is identical in every engine; the first two
  * hex chars partition docs into 256 stable buckets and a per-source
  * lexicographic threshold keeps ~rate·256/256 of them. Pure codegen'd
  * expressions; linear scan, no shuffle at all for the sample itself.
  */
object SampleQueries {

  /** (source → keep threshold over the 256 md5 buckets): src0 80%,
    * src1 60%, src2 40%, src3 20%, everything else 10%. */
  private val thresholds = Seq(
    "src0" -> "cc", // 204/256 ≈ 79.7%
    "src1" -> "99", // 153/256 ≈ 59.8%
    "src2" -> "66", // 102/256 ≈ 39.8%
    "src3" -> "33") // 51/256  ≈ 19.9%
  private val defaultThreshold = "1a" // 26/256 ≈ 10.2%

  // shared by c1 (sample) and c2 (audit) so the two can never disagree
  // on the bucketing scheme
  private val bucket = substring(md5(col("doc_id").cast("string")), 1, 2)
  private val cut = thresholds.foldRight(lit(defaultThreshold): org.apache.spark.sql.Column) {
    case ((src, thr), acc) => when(col("source") === src, thr).otherwise(acc)
  }

  val cSample = QueryDef(
    "c1_corpus_sample",
    (s, dir) => {
      Tables.documents(s, dir)
        .withColumn("bucket", bucket)
        .filter(col("bucket") < cut)
        .select(col("doc_id"), col("source"), col("bucket"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id, source, substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
      FROM documents
      WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
            CASE source WHEN 'src0' THEN 'cc' WHEN 'src1' THEN '99'
                        WHEN 'src2' THEN '66' WHEN 'src3' THEN '33' ELSE '1a' END
      ORDER BY doc_id"""))

  /** Realized mix audit: per-source kept/total/rate — the check every
    * mixing job runs before shipping a corpus. */
  val cMixAudit = QueryDef(
    "c2_mix_audit",
    (s, dir) => {
      Tables.documents(s, dir)
        .withColumn("kept", (bucket < cut).cast("long"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_total"), sum(col("kept")).as("n_kept"),
          round(sum(col("kept")).cast("double") / count(lit(1)), 6).as("realized_rate"))
        .orderBy("source")
    },
    Some("""
      WITH k AS (
        SELECT source,
               CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
                         CASE source WHEN 'src0' THEN 'cc' WHEN 'src1' THEN '99'
                                     WHEN 'src2' THEN '66' WHEN 'src3' THEN '33' ELSE '1a' END
                    THEN 1 ELSE 0 END AS kept
        FROM documents)
      SELECT source, COUNT(*) AS n_total, CAST(SUM(kept) AS BIGINT) AS n_kept,
             ROUND(CAST(SUM(kept) AS DOUBLE) / COUNT(*), 6) AS realized_rate
      FROM k GROUP BY source ORDER BY source"""))

  /** Deterministic train/val/test assignment — the split every dataset
    * build needs: content-keyed (same doc → same split on any cluster
    * layout, any corpus increment), leakage-safe (a doc can never land
    * in two splits), and auditable. A SECOND hash octet (chars 3-4)
    * decides the split, independent of the c1 KEEP octet (chars 1-2) —
    * sampling rate and split assignment must not correlate. 80/10/10 by
    * hex thresholds: < 'cc' → train (204/256), < 'e6' → val (26/256),
    * else test (26/256). Pure expressions; the audit groupBy is the
    * only shuffle. */
  /** The content-keyed split assignment (hash octet chars 3-4,
    * 80/10/10 by hex thresholds) — ONE definition shared by c3 and the
    * p1 curation pipeline, so the release split can never drift from
    * the standalone split operator. (The DuckDB oracle SQL necessarily
    * restates it as a CASE.) */
  private[graft] def splitCol: org.apache.spark.sql.Column = {
    val splitBucket = substring(md5(col("doc_id").cast("string")), 3, 2)
    when(splitBucket < "cc", "train")
      .when(splitBucket < "e6", "val").otherwise("test")
  }

  val cSplit = QueryDef(
    "c3_train_split",
    (s, dir) => {
      Tables.documents(s, dir)
        .withColumn("split", splitCol)
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("min_doc_id"),
          sum(col("n_chars").cast("long")).as("total_chars"))
        .orderBy("source", "split")
    },
    Some("""
      WITH a AS (
        SELECT source, doc_id, n_chars,
               CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 3, 2) < 'cc' THEN 'train'
                    WHEN substring(md5(CAST(doc_id AS VARCHAR)), 3, 2) < 'e6' THEN 'val'
                    ELSE 'test' END AS split
        FROM documents)
      SELECT source, split, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc_id,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM a GROUP BY source, split ORDER BY source, split"""))

  /** Exact-count stratified sampling: the n smallest md5(doc_id) per
    * source — "give me exactly 10 reproducible docs per stratum", the
    * eval-set / human-review draw. Content-keyed like c1, so the draw
    * is stable across cluster layouts and corpus increments (a new doc
    * enters the sample only by displacing the current rank-n).
    *
    * Scale shape — the naive form (row_number over every stratum) sorts
    * the WHOLE corpus; this one never does. Two-phase:
    *   1. per-stratum counts (tiny agg) → keep-probability
    *      p = min(1, 4n/N_s); pre-filter on the first 8 hash hex chars
    *      keeps ~4n candidate rows per stratum (Binomial(N_s, 4n/N_s)),
    *      so the rank window runs over O(n) rows per stratum, not N_s.
    *   2. exactness guard: the pre-filter is monotone in the ranking
    *      order (both are md5-lexicographic), so the survivor set is
    *      rank-downward-closed — survivors_s ≥ n PROVES the true top-n
    *      survived; any stratum with survivors_s < n (P ≈ e^{-n} by
    *      Chernoff, and impossible when p=1) is re-ranked unfiltered.
    *      Either path yields exactly the oracle's full-window answer.
    * All stats joins are broadcast (one row per source); the slim
    * (source, doc_id, hash) projection is staged once and feeds both
    * passes — two scans of 3 columns, zero full sorts.
    */
  /** The c4 two-phase exact top-n-per-group machinery as a SHARED
    * helper (c4 stratified draw, c10 per-source cap — both need "the n
    * smallest `ord` per group" without a corpus-wide rank window).
    * `base` carries (groupCol, doc_id, "ord" = a 32-hex md5 ranking
    * key, + any pass-through columns); returns the rank-≤-n rows with
    * `sample_rank`. Phase 1: per-group counts (tiny agg, broadcast) →
    * keep-probability p = min(1, margin·n/N_g); the first-8-hex-char
    * pre-filter keeps ~margin·n candidate rows per group, so the rank
    * window runs over O(n) rows per group, never N_g. Phase 2
    * exactness guard: the pre-filter is monotone in the ranking order
    * (both md5-lexicographic), so survivors_g ≥ n PROVES the true
    * top-n survived; any group with fewer survivors (P ≈ e^{-n} by
    * Chernoff, impossible when p=1) is re-ranked unfiltered. Either
    * path yields exactly the full-window answer. */
  private[graft] def exactTopNPerGroup(base0: org.apache.spark.sql.DataFrame,
                                       groupCol: String, n: Int,
                                       margin: Double = 4.0)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.plans.Stage.StageOps
    val base = base0.staged // one materialization feeds counts + both branches
    val counts = base.groupBy(groupCol).agg(count(lit(1)).as("__n_g"))
    val hfrac = conv(substring(col("ord"), 1, 8), 16, 10).cast("double") /
      lit(4294967296.0)
    val surv = base.join(broadcast(counts), groupCol)
      .filter(hfrac < least(lit(1.0), lit(margin * n) / col("__n_g")))
      .drop("__n_g")
    val okS = surv.groupBy(groupCol).agg(count(lit(1)).as("__n_surv"))
      .filter(col("__n_surv") >= n).select(groupCol)
    val candidates = surv.join(broadcast(okS), Seq(groupCol), "left_semi")
      .unionByName(base.join(broadcast(okS), Seq(groupCol), "left_anti"))
    val w = Window.partitionBy(groupCol).orderBy("ord", "doc_id")
    candidates
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= n)
  }

  val cStratified = QueryDef(
    "c4_stratified_sample",
    (s, dir) => {
      val base = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          md5(col("doc_id").cast("string")).as("ord"))
      exactTopNPerGroup(base, "source", n = 10)
        .select("source", "doc_id", "sample_rank")
        .orderBy("source", "sample_rank")
    },
    Some("""
      WITH r AS (
        SELECT source, doc_id,
               ROW_NUMBER() OVER (PARTITION BY source
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS sample_rank
        FROM documents)
      SELECT source, doc_id, CAST(sample_rank AS BIGINT) AS sample_rank
      FROM r WHERE sample_rank <= 10 ORDER BY source, sample_rank"""))

  /** Token-budget selection (c5): keep the highest-quality documents
    * whose running token total stays within a fixed training budget —
    * the "take the best B tokens" step of corpus assembly. Selection
    * rule: rank by (quality DESC, doc_id ASC); a doc is kept iff its
    * INCLUSIVE running token sum ≤ B (a prefix of the ranking, since
    * the cumsum is monotone).
    *
    * The naive formulation — `SUM(n_tokens) OVER (ORDER BY quality
    * DESC)` with no PARTITION BY — is the oracle below, and is exactly
    * the plan that dies at scale: an un-partitioned window moves the
    * ENTIRE corpus to one task. The Spark side computes the same set
    * with bounded state instead:
    *  1. one scan aggregates token totals per ROUNDED quality value
    *     (quality is round(·,6) in [0,1], so ≤ 1e6+1 bins — bounded by
    *     the rounding grid, not the corpus; the driver fold over the
    *     sorted bins is ≤ ~16 MB),
    *  2. the driver walks bins best-first to find the crossing bin and
    *     the budget remaining when entering it,
    *  3. every doc STRICTLY above the crossing bin is kept by a plain
    *     map-side filter; the crossing bin — which can itself be
    *     corpus-sized on a template-heavy corpus — is refined
    *     RECURSIVELY by contiguous doc_id-range sub-bins (≤ 4096
    *     ranges per level, ≤ 5 levels for a 2⁶³ id space), so driver
    *     state stays O(levels · 4096) and only the final ≤ 4096-id
    *     leaf range ever pays a window cumsum.
    * Same exact result, no global sort, no full-corpus single-task
    * window. Quality is t2's rule (shared stopword list).
    */
  /** The t2 quality rule + token count over any documents-shaped frame
    * — one staged feature pass, shared by c5 and the p2 release
    * pipeline (keeps extra columns like `source`). */
  private[graft] def qualityTokenFrame(docs: org.apache.spark.sql.DataFrame,
                                           extraCols: Seq[String] = Nil)
      : org.apache.spark.sql.DataFrame = {
    import graft.plans.Stage.StageOps
    val keep = (Seq(col("doc_id"), col("n_chars")) ++ extraCols.map(col)) :+
      split(col("text"), " ").as("tk")
    val out = (Seq(col("doc_id")) ++ extraCols.map(col)) ++ Seq(
      size(col("tk")).cast("long").as("n_tokens"),
      // ONE quality definition (TextQueries.qualityExpr) — c5/p2 can
      // never drift from the t2 rule
      TextQueries.qualityExpr(col("tk"), col("n_chars")).as("quality"))
    QueryDef.spread(docs).select(keep: _*).select(out: _*)
      .staged // one feature pass feeds the bin agg + both filtered reads
  }

  /** Bin-threshold budget selection over a STAGED frame carrying
    * (n_tokens, quality, doc_id, ...): returns the rows of the maximal
    * (quality DESC, doc_id ASC) prefix whose inclusive token cumsum
    * stays ≤ budget — the exact global-window answer with no
    * un-partitioned window (see c5 scaladoc for the plan argument).
    * Extra columns pass through untouched. */
  /** Generic bin-threshold fold: walk (binKey, tokenTotal) rows in
    * already-sorted selection order, keep whole bins while they fit,
    * return (crossing bin, budget remaining entering it) — or None if
    * everything fits. */
  private def crossingBin[K](bins: Seq[(K, Long)], budget: Long): Option[(K, Long)] = {
    var acc = 0L
    var cross = Option.empty[(K, Long)]
    bins.foreach { case (k, tot) =>
      if (cross.isEmpty) {
        if (acc + tot <= budget) acc += tot
        else cross = Some((k, budget - acc))
      }
    }
    cross
  }

  /** Max sub-ranges collected per refinement level AND the leaf width
    * that finally pays the window cumsum. Driver state per level is
    * ≤ this many (range, total) tuples; levels = ⌈log₄₀₉₆(id-range)⌉
    * ≤ 5 even for a 2⁶³ id space — so total driver state is O(levels ·
    * fanout), independent of corpus size (VERDICT r12 #2). */
  private val subBinFanout = 4096L

  /** Recursive range refinement inside the crossing quality bin: split
    * [lo, hi] into ≤ `subBinFanout` contiguous doc_id sub-ranges,
    * driver-fold their token totals (selection order within the bin is
    * doc_id ASC = sub-range ASC then doc_id ASC), keep whole ranges
    * below the crossing one, recurse into the crossing range until it
    * is ≤ `subBinFanout` ids wide — only that LEAF pays a window
    * cumsum. Each level is one range-filtered aggregate over the
    * staged bin; sub-range ids use exact integer `div` (a double
    * divide would lose exactness above 2⁵³). */
  private def tokenBudgetRefine(bin: org.apache.spark.sql.DataFrame,
                                    lo: Long, hi: Long, brem: Long)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val width = hi - lo + 1
    if (width <= subBinFanout) {
      val w = Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      bin.filter(col("doc_id").between(lo, hi))
        .withColumn("__cum", sum(col("n_tokens")).over(w))
        .filter(col("__cum") <= brem)
        .drop("__cum")
    } else {
      val sub = (width + subBinFanout - 1) / subBinFanout
      val ranged = bin.filter(col("doc_id").between(lo, hi))
      val subBins = ranged
        .groupBy(expr(s"(doc_id - ${lo}L) div ${sub}L").as("__sb"))
        .agg(sum("n_tokens").as("tot"))
        .orderBy(col("__sb").asc).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      crossingBin(subBins.toSeq, brem) match {
        // unreachable: the caller picked this range because its total
        // STRICTLY exceeds brem, and the sub-range totals sum to that
        // same total — kept as a total-correct fallback only
        case None => ranged
        case Some((sbc, sbrem)) =>
          val cLo = lo + sbc * sub
          val cHi = math.min(hi, cLo + sub - 1)
          bin.filter(col("doc_id").between(lo, cLo - 1))
            .unionByName(tokenBudgetRefine(bin, cLo, cHi, sbrem))
      }
    }
  }

  private[graft] def tokenBudgetSelect(base: org.apache.spark.sql.DataFrame,
                                           budget: Long): org.apache.spark.sql.DataFrame = {
    // per-bin id bounds ride the SAME aggregate as the token totals, so
    // the crossing bin's [lo, hi] needs no second driver action (r21 —
    // the old shape ran a separate min/max job against the staged base
    // per call; c15 pays this twice per run)
    val bins = base.groupBy("quality")
      .agg(sum("n_tokens").as("tot"),
        min("doc_id").as("lo"), max("doc_id").as("hi"))
      .orderBy(col("quality").desc).collect()
      .map(r => (r.getDouble(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
    crossingBin(bins.toSeq.map { case (q, (tot, _, _)) => (q, tot) }, budget) match {
      case None => base // the whole corpus fits the budget
      case Some((qc, brem)) =>
        val full = base.filter(col("quality") > qc)
        // The crossing BIN can itself be corpus-sized (the rounding
        // grid bounds the bin COUNT, not bin size — a template-heavy
        // corpus puts millions of docs on one quality value), so the
        // range trick RECURSES inside it: contiguous doc_id sub-ranges
        // with bounded fanout per level, driver state O(levels ·
        // fanout) regardless of how many docs share the crossing
        // quality value, and only the final ≤ subBinFanout-id leaf
        // pays the window cumsum.
        val bin = base.filter(col("quality") === qc)
        val (_, lo, hi) = bins.find(_._1 == qc).map(b => b._2).get
        full.unionByName(tokenBudgetRefine(bin, lo, hi, brem))
    }
  }

  val cTokenBudget = QueryDef(
    "c5_token_budget",
    (s, dir) => {
      val base = qualityTokenFrame(Tables.documents(s, dir))
      tokenBudgetSelect(base, budget = 15000L)
        .select(col("doc_id"), col("n_tokens"), col("quality"))
        .orderBy(col("quality").desc, col("doc_id"))
    },
    Some("""
      WITH b AS (
        SELECT doc_id, n_chars, string_split(text, ' ') AS tk,
               CAST(len(string_split(text, ' ')) AS DOUBLE) AS nt
        FROM documents),
      q AS (
        SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
               ROUND(CASE WHEN n_chars BETWEEN 100 AND 5000 THEN 0.5 ELSE 0.0 END
                 + len(list_filter(tk, t -> t IN ('the','a','and','of','to','in'))) / nt * 0.25
                 + len(list_distinct(tk)) / nt * 0.25, 6) AS quality
        FROM b),
      c AS (
        SELECT doc_id, n_tokens, quality,
               SUM(n_tokens) OVER (ORDER BY quality DESC, doc_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM q)
      SELECT doc_id, n_tokens, quality FROM c WHERE cum <= 15000
      ORDER BY quality DESC, doc_id"""))

  /** k-anonymity release audit (c6): before shipping a corpus with
    * quasi-identifier metadata, count the population of every QI
    * combination — any group under k is a re-identification risk the
    * release either suppresses or generalizes. QI here = (lang,
    * source), k = 3. One QI-keyed aggregate with map-side partials;
    * output size is the QI cardinality, never the corpus. */
  val cKAnonymity = QueryDef(
    "c6_k_anonymity",
    (s, dir) =>
      Tables.documents(s, dir)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("k_ok", col("n_docs") >= 3)
        .orderBy("lang", "source"),
    Some("""
      SELECT lang, source, COUNT(*) AS n_docs, COUNT(*) >= 3 AS k_ok
      FROM documents GROUP BY lang, source ORDER BY lang, source"""))

  /** Temperature-weighted mixture resampling (c7) — the multilingual
    * rebalancing step of corpus assembly (the "sampling temperature" of
    * multilingual pretraining: raise rare languages' share, shrink the
    * head): target share of language ℓ is n_ℓ^τ / Σ n^τ with τ = 0.5,
    * scaled to a half-corpus release, capped at keep-everything —
    * within the hash resolution: rates quantize to 2^-32 steps and the
    * strict `<` means a rate-1.0 language still drops a doc whose octet
    * is exactly ffffffff (one in 4×10⁹). Unlike c2's FIXED per-source
    * rates, the rates here are COMPUTED from the corpus itself — a
    * two-pass plan.
    *
    * Determinism across engines: membership is the c1/c3 content-keyed
    * hash discipline on its own INDEPENDENT octet (md5 chars 5–12 —
    * chars 1–2 are c1's keep octet, 3–4 are c3's split octet), and the
    * computed rate is materialized as an 8-hex-char threshold
    * (⌊rate·2³²⌋, clamped to 2³²−1) so both engines compare fixed-width
    * hex strings, never floats.
    *
    * Scale shape: pass 1 is a lang-keyed count (map-side partials,
    * |langs| rows); the rate table is broadcast; pass 2 is a pure
    * map-side filter — the corpus itself is never shuffled (the final
    * orderBy is presentation for the oracle compare). */
  /** Frame-parametrized c7 (specs feed degenerate corpora — empty,
    * single-language — that the driver tables do not contain).
    * [[mixResampleKept]] returns the kept rows with ALL input columns
    * (c10 composes the per-source cap on top and needs `text`). */
  private[graft] def mixResampleKept(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_l"))
    // the tau-weight denominator is a float SUM whose accumulation order
    // differs between engines (Spark partial aggregation vs DuckDB row
    // order) — the repo's decimal-sum discipline applies: round each
    // sqrt to 6dp, sum EXACTLY as decimal, and use the same rounded
    // term in the numerator, so both engines compute bit-identical
    // rates from identical inputs
    val snl = round(sqrt(col("n_l")), 6)
    val tot = counts.agg(
      sum(snl.cast(org.apache.spark.sql.types.DecimalType(28, 6)))
        .cast("double").as("z"),
      sum(col("n_l")).as("n_all"))
    val rate = least(
      lit(1.0),
      snl / col("z") * floor(col("n_all") / lit(2)) / col("n_l"))
    val rates = counts.crossJoin(broadcast(tot))
      .select(col("lang"),
        lpad(lower(hex(least(floor(rate * lit(4294967296.0)),
          lit(4294967295.0)).cast("long"))), 8, "0").as("thr"))
    docs.join(broadcast(rates), "lang")
      .filter(substring(md5(col("doc_id").cast("string")), 5, 8) < col("thr"))
      .drop("thr")
  }

  private[graft] def mixResampleOf(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    mixResampleKept(docs)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy("doc_id")

  val cMixResample = QueryDef(
    "c7_mix_resample",
    (s, dir) => mixResampleOf(Tables.documents(s, dir)),
    Some("""
      WITH c AS (SELECT lang, COUNT(*) AS n_l FROM documents GROUP BY lang),
      t AS (SELECT CAST(SUM(CAST(ROUND(SQRT(n_l), 6) AS DECIMAL(28,6))) AS DOUBLE) AS z,
                   SUM(n_l) AS n_all FROM c),
      r AS (
        SELECT lang,
               printf('%08x', CAST(LEAST(FLOOR(LEAST(1.0,
                 (ROUND(SQRT(n_l), 6) / z) * FLOOR(n_all / 2) / n_l) * 4294967296.0),
                 4294967295.0) AS BIGINT)) AS thr
        FROM c, t)
      SELECT d.doc_id, d.lang, d.source
      FROM documents d JOIN r USING (lang)
      WHERE substring(md5(CAST(d.doc_id AS VARCHAR)), 5, 8) < r.thr
      ORDER BY d.doc_id"""))

  /** Deterministic global shuffle (c8) — the training-order assignment
    * step between curation and the trainer: every doc gets a shard and
    * an explicit position inside it, both derived from content-keyed
    * hash octets (chars 17–24 → shard, chars 25–32 → in-shard order;
    * independent of c1's keep, c3's split, c7's resample and p4's
    * bucket octets). The shard draw is 8 hex chars (32 bits), not 4:
    * a 16-bit draw mod nShards carries relative modulo bias
    * ≈ nShards/65536 — 15% at the 10k shards a 100 TB corpus wants —
    * while 32 bits makes it ≈ nShards/2³², negligible at any sane
    * shard count. The result is a reproducible corpus-wide
    * permutation — rerun on any cluster layout, or after an
    * incremental rebuild, docs land in the same shard at the same
    * relative order — which is what makes training runs repeatable and
    * data ablations diffable.
    *
    * Scale shape: the shard column is a pure map-side expression; the
    * only shuffle is the per-shard rank — ONE exchange keyed by the
    * compact shard id followed by a per-shard sort on an 8-hex-char
    * key (at 100 TB, `nShards` scales with the corpus so each shard's
    * sort fits an executor: 10k shards × ~10 GB; shard populations are
    * binomial around n/nShards, so no skew by construction). There is
    * no global ORDER BY — position is per-shard, which is exactly what
    * a sharded trainer consumes. */
  private[graft] def shardShuffleOf(
      docs: org.apache.spark.sql.DataFrame, nShards: Int)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = md5(col("doc_id").cast("string"))
    val shard = (conv(substring(h, 17, 8), 16, 10).cast("long") % nShards)
    docs.select(col("doc_id"), shard.as("shard"),
        substring(h, 25, 8).as("__o"))
      .withColumn("pos",
        row_number().over(
          Window.partitionBy(col("shard")).orderBy(col("__o"), col("doc_id")))
          .cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  val cShardShuffle = QueryDef(
    "c8_shard_shuffle",
    (s, dir) => shardShuffleOf(Tables.documents(s, dir), nShards = 8)
      .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 17, 8))
               AS BIGINT) % 8 AS shard,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 17, 8))
                 AS BIGINT) % 8
               ORDER BY substring(md5(CAST(doc_id AS VARCHAR)), 25, 8), doc_id)
               AS BIGINT) AS pos
      FROM documents ORDER BY doc_id"""))

  /** Corpus snapshot diff (c9) — the data-versioning audit between two
    * corpus snapshots: per (source, status) counts of added / removed /
    * changed / unchanged documents, where "changed" means the same
    * doc_id now carries different content. Every dataset release
    * publishes this diff next to its card, and incremental rebuild
    * correctness is checked against it ("yesterday + diff ≡ today").
    *
    * Scale shape: both snapshots are reduced MAP-SIDE to
    * (doc_id, md5(text), source) — the full-outer join carries 16-byte
    * fingerprints keyed by the compact id, never document bytes, so
    * the diff's shuffle is ~32 bytes/row at any corpus size; the audit
    * is one (source, status)-keyed aggregate with map-side partials.
    */
  private[graft] def snapshotDiffOf(
      oldSnap: org.apache.spark.sql.DataFrame,
      newSnap: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val o = oldSnap.select(col("doc_id"), md5(col("text")).as("__ho"),
      col("source").as("__so"))
    val n = newSnap.select(col("doc_id"), md5(col("text")).as("__hn"),
      col("source").as("__sn"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(
        coalesce(col("__sn"), col("__so")).as("source"),
        when(col("__ho").isNull, "added")
          .when(col("__hn").isNull, "removed")
          .when(col("__ho") === col("__hn"), "unchanged")
          .otherwise("changed").as("status"),
        col("doc_id"))
      .groupBy(col("source"), col("status"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc_id"))
      .orderBy("source", "status")
  }

  val cSnapshotDiff = QueryDef(
    "c9_snapshot_diff",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      // "yesterday" is QueryDef-only scaffolding — Scaffold.previousSnapshot
      snapshotDiffOf(Scaffold.previousSnapshot(docs), docs)
    },
    Some("""
      WITH old AS (
        SELECT doc_id,
               CASE WHEN doc_id % 19 = 0 THEN text || ' legacy revision'
                    ELSE text END AS text,
               source
        FROM documents WHERE doc_id % 17 <> 0
        UNION ALL
        SELECT doc_id - (SELECT MIN(doc_id) FROM documents)
                      + (SELECT MAX(doc_id) + 1 FROM documents) AS doc_id,
               text, source
        FROM documents WHERE doc_id % 23 = 0),
      o AS (SELECT doc_id, md5(text) AS ho, source AS so FROM old),
      n AS (SELECT doc_id, md5(text) AS hn, source AS sn FROM documents),
      d AS (
        SELECT COALESCE(n.sn, o.so) AS source,
               CASE WHEN o.ho IS NULL THEN 'added'
                    WHEN n.hn IS NULL THEN 'removed'
                    WHEN o.ho = n.hn THEN 'unchanged'
                    ELSE 'changed' END AS status,
               COALESCE(n.doc_id, o.doc_id) AS doc_id
        FROM o FULL OUTER JOIN n USING (doc_id))
      SELECT source, status, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc_id
      FROM d GROUP BY source, status ORDER BY source, status"""))

  /** Per-source document cap + epoch planner (c10) — the standard
    * anti-boilerplate discipline of corpus assembly (Dolma/CCNet
    * style): after the c7 temperature resample sets each LANGUAGE's
    * share, no single SOURCE may contribute more than `nCap` documents
    * (a boilerplate-heavy crawl dump would otherwise dominate its
    * language's slice), and an under-target source is repeated for up
    * to `maxEpochs` training epochs to reach its token target rather
    * than upsampled doc-by-doc.
    *
    * Deterministic end to end: the cap keeps each source's `nCap`
    * smallest values of an INDEPENDENT content-keyed draw. Every octet
    * of md5(doc_id) is already claimed (c1 keep 1–2, c3 split 3–4, c7
    * resample 5–12, p4 bucket 13–16, c8 shard/order 17–32), so the cap
    * salts the hash INPUT instead: md5('cap:' || doc_id) — a fresh
    * 128-bit draw, independent of all of the above, same reproducibility
    * contract (any cluster layout, any corpus increment: a new doc
    * enters the cap only by displacing the current rank-nCap).
    * Epochs: n_epochs = clamp(ceil(targetTokens / kept_tokens), 1,
    * maxEpochs) per source — whole-corpus repetition, the form trainers
    * consume (exact integer semantics in both engines below 2⁵³).
    *
    * Scale shape: c7's membership is a broadcast-rate map-side filter;
    * the cap rank goes through [[exactTopNPerGroup]] (the c4 two-phase
    * machinery — O(nCap) rows per source reach the rank window, never
    * the source's corpus share); the epoch table is |sources| rows,
    * broadcast back. No corpus-sized shuffle anywhere. */
  private[graft] def sourceCapOf(docs: org.apache.spark.sql.DataFrame,
                                 nCap: Int, targetTokens: Long,
                                 maxEpochs: Int,
                                 keyCol: String = "source")
      : org.apache.spark.sql.DataFrame = {
    // keyCol generalizes the cap key: "source" for c10; the c13
    // registered-domain column for domain-keyed caps — the draw, the
    // two-phase rank and the epoch table are key-agnostic
    val base = mixResampleKept(docs)
      .select(col("doc_id"), col(keyCol),
        md5(concat(lit("cap:"), col("doc_id").cast("string"))).as("ord"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val capped = exactTopNPerGroup(base, keyCol, nCap)
    val epochs = capped.groupBy(keyCol)
      .agg(sum(col("n_tokens")).as("kept_tokens"))
      .withColumn("n_epochs",
        least(lit(maxEpochs.toLong),
          greatest(lit(1L),
            ceil(lit(targetTokens.toDouble) / col("kept_tokens")).cast("long"))))
    capped.join(broadcast(epochs), keyCol)
      .select(col(keyCol), col("doc_id"),
        col("sample_rank").as("cap_rank"), col("n_tokens"),
        col("kept_tokens"), col("n_epochs"))
      .orderBy(keyCol, "cap_rank")
  }

  val cSourceCap = QueryDef(
    "c10_source_cap",
    (s, dir) => sourceCapOf(Tables.documents(s, dir),
      nCap = 8, targetTokens = 1000L, maxEpochs = 4),
    Some("""
      WITH c AS (SELECT lang, COUNT(*) AS n_l FROM documents GROUP BY lang),
      t AS (SELECT CAST(SUM(CAST(ROUND(SQRT(n_l), 6) AS DECIMAL(28,6))) AS DOUBLE) AS z,
                   SUM(n_l) AS n_all FROM c),
      r AS (
        SELECT lang,
               printf('%08x', CAST(LEAST(FLOOR(LEAST(1.0,
                 (ROUND(SQRT(n_l), 6) / z) * FLOOR(n_all / 2) / n_l) * 4294967296.0),
                 4294967295.0) AS BIGINT)) AS thr
        FROM c, t),
      kept AS (
        SELECT d.doc_id, d.source,
               md5('cap:' || CAST(d.doc_id AS VARCHAR)) AS ord,
               CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
        FROM documents d JOIN r USING (lang)
        WHERE substring(md5(CAST(d.doc_id AS VARCHAR)), 5, 8) < r.thr),
      rk AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                    ORDER BY ord, doc_id) AS cap_rank
        FROM kept),
      cap AS (SELECT * FROM rk WHERE cap_rank <= 8),
      ep AS (
        SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS kept_tokens,
               CAST(LEAST(4, GREATEST(1, CEIL(1000.0 / SUM(n_tokens)))) AS BIGINT)
                 AS n_epochs
        FROM cap GROUP BY source)
      SELECT cap.source, cap.doc_id, CAST(cap.cap_rank AS BIGINT) AS cap_rank,
             cap.n_tokens, ep.kept_tokens, ep.n_epochs
      FROM cap JOIN ep USING (source)
      ORDER BY cap.source, cap.cap_rank"""))

  /** Epoch-expanded training shard plan (c12) — the manifest a trainer
    * actually consumes, produced by composing the round's sampling
    * stack: c10 decides WHICH docs and HOW MANY epochs per source; c12
    * expands each kept doc into its epochs and assigns every (doc,
    * epoch) a shard and an in-shard position via an EPOCH-SALTED
    * content hash (md5('epoch:'‖e‖':'‖doc_id) — the c10 salted-input
    * discipline, independent of every plain-hash octet), so each epoch
    * is an INDEPENDENT deterministic reshuffle of the corpus — the
    * per-epoch reordering training runs require, yet bit-reproducible
    * on any cluster layout and diffable across corpus increments.
    *
    * Scale shape: the epoch explode is bounded by maxEpochs× the
    * CAPPED corpus; the shard/order draws are pure map-side
    * expressions; the only shuffle is c8's per-(epoch, shard) rank,
    * keyed by the compact (epoch, shard) pair — shard populations stay
    * binomial per epoch by construction, and nShards scales with the
    * corpus exactly as in c8. */
  /** The c12 tail over an arbitrary capped frame carrying (doc_id,
    * source, n_tokens, n_epochs): epoch explode + epoch-salted
    * shard/pos assignment. ONE definition shared by c12 and the c18
    * quota-driven chain so the two plans can never state different
    * expansion semantics. */
  private[graft] def epochExpandOf(capped: org.apache.spark.sql.DataFrame,
                                   nShards: Int)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = md5(concat(lit("epoch:"), col("epoch").cast("string"),
      lit(":"), col("doc_id").cast("string")))
    capped
      .select(col("doc_id"), col("source"), col("n_tokens"),
        explode(sequence(lit(1L), col("n_epochs"))).as("epoch"))
      .withColumn("__h", h)
      .select(col("epoch"),
        (conv(substring(col("__h"), 1, 8), 16, 10).cast("long") % nShards)
          .as("shard"),
        substring(col("__h"), 9, 8).as("__o"),
        col("doc_id"), col("source"), col("n_tokens"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("epoch"), col("shard"))
          .orderBy(col("__o"), col("doc_id"))).cast("long"))
      .select("epoch", "shard", "pos", "doc_id", "source", "n_tokens")
      .orderBy("epoch", "shard", "pos")
  }

  private[graft] def epochShardPlanOf(docs: org.apache.spark.sql.DataFrame,
                                      nCap: Int, targetTokens: Long,
                                      maxEpochs: Int, nShards: Int)
      : org.apache.spark.sql.DataFrame =
    epochExpandOf(sourceCapOf(docs, nCap, targetTokens, maxEpochs), nShards)

  val cEpochShardPlan = QueryDef(
    "c12_epoch_shard_plan",
    (s, dir) => epochShardPlanOf(Tables.documents(s, dir),
      nCap = 8, targetTokens = 1000L, maxEpochs = 4, nShards = 8),
    Some("""
      WITH c AS (SELECT lang, COUNT(*) AS n_l FROM documents GROUP BY lang),
      t AS (SELECT CAST(SUM(CAST(ROUND(SQRT(n_l), 6) AS DECIMAL(28,6))) AS DOUBLE) AS z,
                   SUM(n_l) AS n_all FROM c),
      r AS (
        SELECT lang,
               printf('%08x', CAST(LEAST(FLOOR(LEAST(1.0,
                 (ROUND(SQRT(n_l), 6) / z) * FLOOR(n_all / 2) / n_l) * 4294967296.0),
                 4294967295.0) AS BIGINT)) AS thr
        FROM c, t),
      kept AS (
        SELECT d.doc_id, d.source,
               md5('cap:' || CAST(d.doc_id AS VARCHAR)) AS ord,
               CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
        FROM documents d JOIN r USING (lang)
        WHERE substring(md5(CAST(d.doc_id AS VARCHAR)), 5, 8) < r.thr),
      rk AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                    ORDER BY ord, doc_id) AS cap_rank
        FROM kept),
      cap AS (SELECT * FROM rk WHERE cap_rank <= 8),
      ep AS (
        SELECT source,
               CAST(LEAST(4, GREATEST(1, CEIL(1000.0 / SUM(n_tokens)))) AS BIGINT)
                 AS n_epochs
        FROM cap GROUP BY source),
      expand AS (
        SELECT cap.doc_id, cap.source, cap.n_tokens, e.epoch
        FROM cap JOIN ep USING (source),
             UNNEST(generate_series(1, ep.n_epochs)) AS e(epoch)),
      h AS (
        SELECT doc_id, source, n_tokens, epoch,
               md5('epoch:' || CAST(epoch AS VARCHAR) || ':' ||
                   CAST(doc_id AS VARCHAR)) AS hh
        FROM expand),
      sh AS (
        SELECT doc_id, source, n_tokens, epoch,
               CAST(('0x' || substring(hh, 1, 8)) AS BIGINT) % 8 AS shard,
               substring(hh, 9, 8) AS o
        FROM h)
      SELECT CAST(epoch AS BIGINT) AS epoch, shard,
             CAST(ROW_NUMBER() OVER (PARTITION BY epoch, shard
               ORDER BY o, doc_id) AS BIGINT) AS pos,
             doc_id, source, n_tokens
      FROM sh ORDER BY epoch, shard, pos"""))

  /** Registered-domain-keyed document cap (c13) — the c10 discipline
    * with the cap key upgraded from the coarse ingest `source` label to
    * the REGISTERED DOMAIN (eTLD+1) of each document's URL: crawl
    * corpora cap per domain (a single boilerplate-heavy site must not
    * dominate even when an ingest source mixes thousands of sites).
    * Composition: [[Scaffold.syntheticUrl]] synthesizes the URL (the
    * driver corpus has none — QueryDef-only closed form, restated in
    * the oracle), the native `RegisteredDomain` kernel extracts eTLD+1
    * against the STORED suffix-rule snapshot ([[storedSuffixRules]] —
    * the t19 stored-table discipline; a real deploy swaps in the
    * publicsuffix.org snapshot), and [[sourceCapOf]] runs unchanged
    * with `keyCol = "domain"`.
    *
    * The oracle restates the URL synthesis, the longest-match suffix
    * rule (the stored snapshot's rules are 1- and 2-label, so the
    * match is a two-branch CASE; the kernel handles any depth) AND the
    * full c10 cap/epoch machinery closed-form. Scale shape: domain
    * extraction is one map-side kernel call; everything else is c10's
    * plan with a finer key — MORE groups, SMALLER windows, so the
    * two-phase rank machinery only gets healthier at 100 TB. */
  private val pslSnapshot: Array[String] = Array(
    "ac.uk", "co.uk", "com.au", "au", "com", "de", "io", "net", "org", "uk")

  private val suffixMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Array[String]]()

  /** Build-once-then-read the persisted suffix-rule snapshot (rank,
    * rule) — versioned like a real PSL download, no corpus fit. */
  private[graft] def storedSuffixRules(s: org.apache.spark.sql.SparkSession,
                                       dir: String): Array[String] = {
    val path = graft.sources.IndexStore.indexPath(dir, "psl_rules_v1")
    val meta = s"psl-snapshot-v1|n=${pslSnapshot.length}"
    suffixMemo.computeIfAbsent((s.sparkContext.applicationId, path), _ => {
      graft.sources.IndexStore.ensure(s, path, meta) {
        import s.implicits._
        pslSnapshot.zipWithIndex.map { case (r, i) => (i, r) }.toSeq
          .toDF("rank", "rule")
          .repartition(1).write.mode("overwrite").parquet(s"$path/rules")
      }
      s.read.parquet(s"$path/rules").orderBy("rank")
        .collect().map(_.getString(1))
    })
  }

  val cDomainCap = QueryDef(
    "c13_domain_cap",
    (s, dir) => {
      val rules = new graft.functions.SuffixRules(storedSuffixRules(s, dir))
      val docs = Tables.documents(s, dir)
        .withColumn("domain", graft.functions.DomainExpressions
          .registeredDomain(Scaffold.syntheticUrl, rules))
      sourceCapOf(docs, nCap = 4, targetTokens = 1000L, maxEpochs = 4,
        keyCol = "domain")
    },
    Some("""
      WITH c AS (SELECT lang, COUNT(*) AS n_l FROM documents GROUP BY lang),
      t AS (SELECT CAST(SUM(CAST(ROUND(SQRT(n_l), 6) AS DECIMAL(28,6))) AS DOUBLE) AS z,
                   SUM(n_l) AS n_all FROM c),
      r AS (
        SELECT lang,
               printf('%08x', CAST(LEAST(FLOOR(LEAST(1.0,
                 (ROUND(SQRT(n_l), 6) / z) * FLOOR(n_all / 2) / n_l) * 4294967296.0),
                 4294967295.0) AS BIGINT)) AS thr
        FROM c, t),
      u AS (
        SELECT doc_id,
               string_split(string_split(
                 'https://' ||
                 ['','www.','blog.','cdn.news.'][CAST(('0x' ||
                   substring(md5('url:' || CAST(doc_id AS VARCHAR)), 1, 2))
                   AS BIGINT) % 4 + 1] ||
                 'd' || CAST(CAST(('0x' ||
                   substring(md5('url:' || CAST(doc_id AS VARCHAR)), 3, 4))
                   AS BIGINT) % 40 AS VARCHAR) ||
                 '.' ||
                 ['com','org','net','io','de','co.uk','ac.uk','xyz'][CAST(('0x' ||
                   substring(md5('url:' || CAST(doc_id AS VARCHAR)), 7, 2))
                   AS BIGINT) % 8 + 1] ||
                 '/p/' || CAST(doc_id AS VARCHAR),
                 '//')[2], '/')[1] AS host
        FROM documents),
      dmn AS (
        SELECT doc_id,
               CASE WHEN len(lab) >= 3 AND (lab[-2] || '.' || lab[-1])
                        IN ('ac.uk','co.uk','com.au')
                      THEN lab[-3] || '.' || lab[-2] || '.' || lab[-1]
                    WHEN len(lab) >= 2 AND lab[-1]
                        IN ('au','com','de','io','net','org','uk')
                      THEN lab[-2] || '.' || lab[-1]
                    WHEN len(lab) >= 2 THEN lab[-2] || '.' || lab[-1]
                    ELSE host END AS domain
        FROM (SELECT doc_id, host, string_split(host, '.') AS lab FROM u)),
      kept AS (
        SELECT d.doc_id, dmn.domain,
               md5('cap:' || CAST(d.doc_id AS VARCHAR)) AS ord,
               CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
        FROM documents d JOIN r USING (lang) JOIN dmn USING (doc_id)
        WHERE substring(md5(CAST(d.doc_id AS VARCHAR)), 5, 8) < r.thr),
      rk AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY domain
                    ORDER BY ord, doc_id) AS cap_rank
        FROM kept),
      cap AS (SELECT * FROM rk WHERE cap_rank <= 4),
      ep AS (
        SELECT domain, CAST(SUM(n_tokens) AS BIGINT) AS kept_tokens,
               CAST(LEAST(4, GREATEST(1, CEIL(1000.0 / SUM(n_tokens)))) AS BIGINT)
                 AS n_epochs
        FROM cap GROUP BY domain)
      SELECT cap.domain, cap.doc_id, CAST(cap.cap_rank AS BIGINT) AS cap_rank,
             cap.n_tokens, ep.kept_tokens, ep.n_epochs
      FROM cap JOIN ep USING (domain)
      ORDER BY cap.domain, cap.cap_rank"""))

  /** DSIR-style importance-scored selection (c14) — distribution-
    * matching data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every document
    * by how much more likely its tokens are under a TARGET unigram LM
    * (fit on a curated slice — here `lang = 'en'`, the t24 reference
    * discipline) than under the RAW-corpus unigram LM, then keep docs
    * through the noisy threshold rule GPT-3's quality filter published
    * (Brown et al. 2020 App. A): keep iff
    * `pareto(9) > 1 - sigmoid(score)`, with the Pareto draw derived
    * from a salted content hash instead of `np.random` — deterministic
    * on any cluster layout, yet preserving the paper's "low-scoring
    * docs still enter with small probability" behavior that guards
    * against distribution collapse.
    *
    * Per-token log ratio (add-α smoothing over the shared raw vocab V):
    *   lr(w) = ln((c_t(w)+α)/(N_t+αV)) − ln((c_r(w)+α)/(N_r+αV))
    * Doc score = length-normalized Σ count(w)·lr(w) (the per-token
    * average keeps the value grid bounded — t24's argument — and makes
    * the keep rule length-equitable; the UNnormalized sum is the same
    * dsum one line away for callers that want faithful Gumbel-top-k
    * resampling). Tokens unseen in the target slice hit the smoothed
    * floor via a left join (c_t = 0); every token is in the raw LM by
    * construction. Empty target slice aborts loudly (t24 discipline).
    *
    * Scale shape: one tokenize scan → (doc, token)-keyed count
    * aggregate with map-side partials (staged — feeds both LM fits and
    * the scoring join); both LM tables are distinct-token-sized AQE
    * broadcast candidates; the per-doc rollup is one doc-keyed
    * aggregate; score, sigmoid, Pareto draw and keep are pure map-side
    * codegen'd expressions. No global window, no driver-side corpus
    * state — the N_t/N_r/V probe reads three numbers off the staged
    * distinct-token frame.
    *
    * Determinism: lr rounded at 6, decimal-cast weighted sum, mean
    * rounded at 4, sigmoid/Pareto rounded at 6 (the t14/t24 float
    * discipline); the keep compare is between two round-6 values.
    *
    * EAGER-WORK CAVEAT (the lshAnn note): the N_r/V/N_t probes run two
    * Spark jobs at DataFrame-CONSTRUCTION time, reading the staged
    * distinct-token frame (never the raw corpus twice). Callers
    * composing this into a larger lazily-built plan should construct
    * it once and reuse the returned frame.
    */
  private[graft] def dsirSelectOf(docs0: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import graft.plans.Stage.StageOps
    val alpha = 0.5
    val docTok = QueryDef.spread(
        docs0.select(col("doc_id"), col("source"), col("lang"),
          explode(split(col("text"), " ")).as("w")))
      .filter(col("w") =!= "")
      .groupBy("doc_id", "source", "lang", "w")
      .agg(count(lit(1)).as("cnt"))
      .staged
    val raw = docTok.groupBy("w").agg(sum("cnt").as("cr")).staged
    val rawTotals = raw.agg(sum("cr"), count(lit(1))).head
    // loud beats a bare NPE: an empty / all-whitespace corpus has no
    // raw LM to fit (same discipline as the target-slice require below)
    require(!rawTotals.isNullAt(0),
      "c14_dsir_select: corpus has no tokens — cannot fit the raw LM")
    val nr = rawTotals.getLong(0).toDouble
    val v = rawTotals.getLong(1).toDouble
    val ref = docTok.filter(col("lang") === "en")
      .groupBy("w").agg(sum("cnt").as("ct"))
    val refTotal = ref.agg(sum("ct")).head
    // Loud beats lossy: an empty target slice means the target LM was
    // never fit — every score would be the smoothing floor, and the
    // keep rule would silently degrade to pure noise.
    require(!refTotal.isNullAt(0),
      "c14_dsir_select: target slice (lang = 'en') is empty — " +
        "cannot fit the target LM")
    val nt = refTotal.getLong(0).toDouble
    val lr = raw.join(ref, Seq("w"), "left")
      .select(col("w"),
        round(log((coalesce(col("ct"), lit(0L)) + alpha) / (nt + alpha * v)) -
          log((col("cr") + alpha) / (nr + alpha * v)), 6).as("lr"))
    val u = (conv(substring(
        md5(concat(col("doc_id").cast("string"), lit(":c14"))), 1, 8),
      16, 10).cast("double") + 0.5) / lit(4294967296.0)
    docTok.join(lr, Seq("w"))
      .groupBy("doc_id", "source", "lang")
      .agg(sum("cnt").as("n_tokens"),
        // + 0.0 normalizes IEEE -0.0 → +0.0: DuckDB's ROUND keeps the
        // sign of a tiny-negative mean while Spark's BigDecimal HALF_UP
        // round does not, and the driver's hash stringifies the sign
        // ("-0.000000" ≠ "0.000000") even though the values compare
        // equal — both engines normalize (r15 verdict finding #1)
        (round(QueryDef.dsum(col("lr") * col("cnt"), 6).cast("double") /
          sum("cnt"), 4) + lit(0.0)).as("dsir_logratio"))
      .withColumn("score",
        round(lit(1.0) / (lit(1.0) + exp(-col("dsir_logratio"))), 6))
      .withColumn("kept",
        round(pow(lit(1.0) - u, lit(-1.0 / 9.0)) - 1.0, 6) >
          lit(1.0) - col("score"))
      .select("doc_id", "source", "lang", "n_tokens", "dsir_logratio",
        "score", "kept")
      .orderBy("doc_id")
  }

  val cDsirSelect = QueryDef(
    "c14_dsir_select",
    (s, dir) => dsirSelectOf(Tables.documents(s, dir)),
    Some("""
      WITH dt AS (
        SELECT doc_id, source, lang, w, COUNT(*) AS cnt
        FROM (SELECT doc_id, source, lang, UNNEST(string_split(text, ' ')) AS w
              FROM documents)
        WHERE w <> '' GROUP BY doc_id, source, lang, w),
      raw AS (SELECT w, SUM(cnt) AS cr FROM dt GROUP BY w),
      ref AS (SELECT w, SUM(cnt) AS ct FROM dt WHERE lang = 'en' GROUP BY w),
      tot AS (SELECT CAST(SUM(cr) AS DOUBLE) AS nr,
                     CAST(COUNT(*) AS DOUBLE) AS v FROM raw),
      tref AS (SELECT CAST(SUM(ct) AS DOUBLE) AS nt FROM ref),
      lr AS (SELECT raw.w,
                    ROUND(ln((COALESCE(ct, 0) + 0.5) / (nt + 0.5 * v)) -
                          ln((cr + 0.5) / (nr + 0.5 * v)), 6) AS lr
             FROM raw LEFT JOIN ref ON raw.w = ref.w
                  CROSS JOIN tot CROSS JOIN tref),
      sc AS (SELECT doc_id, source, lang,
                    CAST(SUM(cnt) AS BIGINT) AS n_tokens,
                    ROUND(CAST(SUM(CAST(lr * cnt AS DECIMAL(30,6))) AS DOUBLE)
                      / SUM(cnt), 4) + 0.0 AS dsir_logratio
             FROM dt JOIN lr ON dt.w = lr.w
             GROUP BY doc_id, source, lang)
      SELECT doc_id, source, lang, n_tokens, dsir_logratio,
             ROUND(1.0 / (1.0 + exp(-dsir_logratio)), 6) AS score,
             (ROUND(POWER(1.0 -
                 (CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':c14'),
                    1, 8)) AS BIGINT) + 0.5) / 4294967296.0,
                 -1.0 / 9.0) - 1.0, 6)
               > 1.0 - ROUND(1.0 / (1.0 + exp(-dsir_logratio)), 6)) AS kept
      FROM sc ORDER BY doc_id"""))

  /** Two-phase anneal schedule (c15) — the mid-training data curriculum
    * production recipes converged on (MiniCPM's stable→decay phases,
    * the LLaMA-3 / OLMo-2 "annealing" stage): reserve the HIGHEST-
    * quality `annealBudget` tokens for the learning-rate-decay phase,
    * then fill the `mainBudget`-token main phase from the REMAINDER by
    * an unbiased deterministic hash draw — quality-ranking the main
    * phase too would skew the base mix, and the anneal docs must not
    * repeat in the main phase. Emits phase-labeled doc rows (phase ∈
    * {anneal, main}) with true quality — the plan a phase-aware
    * trainer consumes.
    *
    * Both selections are c5's bin-threshold machinery (exact
    * global-window answer, no unpartitioned window): the anneal phase
    * ranks by (quality DESC, doc_id), the main phase ranks by a
    * round-6 hash uniform (md5(doc_id‖':c15') first octet — the c14
    * salted-hash discipline; rounding keeps the bin grid ≤ 1e6+1
    * values, and the exact-tie analysis is in the scaladoc of the
    * draw: h/2³² can never land exactly on the 5e-7 grid, so the
    * round is unambiguous cross-engine). The only new exchange is the
    * doc_id-keyed anti-join removing the anneal set from the main
    * draw — AQE broadcasts it while the anneal budget is small, and
    * it degrades to a hash join, never a sort, at any scale.
    */
  private[graft] def annealPlanOf(docs: org.apache.spark.sql.DataFrame,
                                  annealBudget: Long, mainBudget: Long)
      : org.apache.spark.sql.DataFrame = {
    import graft.plans.Stage.StageOps
    val base = qualityTokenFrame(docs)
    // anneal staged: it feeds the anti-join probe AND the final union —
    // and it is budget-bounded, so the checkpoint is tiny (r21)
    val anneal = tokenBudgetSelect(base, annealBudget)
      .select(col("doc_id"), col("n_tokens"), col("quality"))
      .staged
    // remainder staged: the main-phase tokenBudgetSelect executes its
    // input once per driver probe plus once per output branch (bins
    // aggregate, kept-bins read, crossing-bin refinement) — unstaged,
    // each execution re-ran the anti-join and the whole anneal subplan
    // (r21, guide §1.2: 3–5 redundant passes per c15 run)
    val remainder = base
      .join(anneal.select("doc_id"), Seq("doc_id"), "left_anti")
      .staged
    val u = round(conv(substring(
        md5(concat(col("doc_id").cast("string"), lit(":c15"))), 1, 8),
      16, 10).cast("double") / lit(4294967296.0), 6)
    val mainBase = remainder
      .withColumnRenamed("quality", "q_true")
      .withColumn("quality", u)
    val main = tokenBudgetSelect(mainBase, mainBudget)
      .select(col("doc_id"), col("n_tokens"), col("q_true").as("quality"))
    anneal.withColumn("phase", lit("anneal"))
      .unionByName(main.withColumn("phase", lit("main")))
      .select("phase", "doc_id", "n_tokens", "quality")
      .orderBy("phase", "doc_id")
  }

  val cAnnealPlan = QueryDef(
    "c15_anneal_plan",
    (s, dir) => annealPlanOf(Tables.documents(s, dir),
      annealBudget = 4000L, mainBudget = 8000L),
    Some("""
      WITH b AS (
        SELECT doc_id, n_chars, string_split(text, ' ') AS tk,
               CAST(len(string_split(text, ' ')) AS DOUBLE) AS nt
        FROM documents),
      q AS (
        SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
               ROUND(CASE WHEN n_chars BETWEEN 100 AND 5000 THEN 0.5 ELSE 0.0 END
                 + len(list_filter(tk, t -> t IN ('the','a','and','of','to','in'))) / nt * 0.25
                 + len(list_distinct(tk)) / nt * 0.25, 6) AS quality
        FROM b),
      ann AS (
        SELECT doc_id, n_tokens, quality FROM (
          SELECT doc_id, n_tokens, quality,
                 SUM(n_tokens) OVER (ORDER BY quality DESC, doc_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM q)
        WHERE cum <= 4000),
      ru AS (
        SELECT doc_id, n_tokens, quality,
               ROUND(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':c15'),
                 1, 8)) AS BIGINT) / 4294967296.0, 6) AS u
        FROM q WHERE doc_id NOT IN (SELECT doc_id FROM ann)),
      mn AS (
        SELECT doc_id, n_tokens, quality FROM (
          SELECT doc_id, n_tokens, quality,
                 SUM(n_tokens) OVER (ORDER BY u DESC, doc_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM ru)
        WHERE cum <= 8000)
      SELECT 'anneal' AS phase, doc_id, n_tokens, quality FROM ann
      UNION ALL
      SELECT 'main' AS phase, doc_id, n_tokens, quality FROM mn
      ORDER BY phase, doc_id"""))

  /** Stored-blocklist domain gate (c16) — the URL-level filter every
    * web pipeline runs BEFORE anything content-based (the UT1 /
    * adult-and-malware blocklist step of CCNet/RefinedWeb): extract
    * each document's registered domain (c13's stored suffix-rule
    * kernel) and gate it against a blocklist of registered domains.
    * Emits every doc with its domain and `blocked` verdict — the
    * downstream pipeline filters on it, the audit aggregates it.
    *
    * The blocklist is a PARAMETER (a one-column `domain` frame —
    * production swaps in the UT1 snapshot via the same IndexStore
    * discipline as the suffix rules); the c16 QueryDef derives a
    * deterministic synthetic list (domains whose salted md5 lands in
    * the first quarter of the first-hex space) because the driver
    * corpus ships no curated list — the GATE is the operator.
    *
    * Scale shape: domain extraction is one map-side kernel call; the
    * membership probe is a left-semi-shaped left join keyed by domain
    * with the blocklist guarded-broadcast (real lists are 10⁵–10⁷
    * rows — comfortably broadcastable; above the guard it degrades to
    * a hash join on the compact domain key, never a sort).
    */
  private[graft] def blocklistGateOf(docsWithDomain: org.apache.spark.sql.DataFrame,
                                     blocklist: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val bl = QueryDef.guardedBroadcast(
      blocklist.select(col("domain")).distinct()
        .withColumn("__hit", lit(true)),
      maxRows = 10000000L)
    docsWithDomain
      .join(bl, Seq("domain"), "left")
      .select(col("doc_id"), col("domain"),
        coalesce(col("__hit"), lit(false)).as("blocked"))
      .orderBy("doc_id")
  }

  val cBlocklistGate = QueryDef(
    "c16_blocklist_gate",
    (s, dir) => {
      val rules = new graft.functions.SuffixRules(storedSuffixRules(s, dir))
      val docs = Tables.documents(s, dir)
        .withColumn("domain", graft.functions.DomainExpressions
          .registeredDomain(Scaffold.syntheticUrl, rules))
      // deterministic synthetic blocklist: ~1/4 of observed domains by
      // an independent salted hash — the oracle restates the same rule
      val bl = docs.select(col("domain")).distinct()
        .filter(substring(md5(concat(col("domain"), lit(":blk"))), 1, 1) < "4")
      blocklistGateOf(docs, bl)
    },
    Some("""
      WITH u AS (
        SELECT doc_id,
               string_split(string_split(
                 'https://' ||
                 ['','www.','blog.','cdn.news.'][CAST(('0x' ||
                   substring(md5('url:' || CAST(doc_id AS VARCHAR)), 1, 2))
                   AS BIGINT) % 4 + 1] ||
                 'd' || CAST(CAST(('0x' ||
                   substring(md5('url:' || CAST(doc_id AS VARCHAR)), 3, 4))
                   AS BIGINT) % 40 AS VARCHAR) ||
                 '.' ||
                 ['com','org','net','io','de','co.uk','ac.uk','xyz'][CAST(('0x' ||
                   substring(md5('url:' || CAST(doc_id AS VARCHAR)), 7, 2))
                   AS BIGINT) % 8 + 1] ||
                 '/p/' || CAST(doc_id AS VARCHAR),
                 '//')[2], '/')[1] AS host
        FROM documents),
      dmn AS (
        SELECT doc_id,
               CASE WHEN len(lab) >= 3 AND (lab[-2] || '.' || lab[-1])
                        IN ('ac.uk','co.uk','com.au')
                      THEN lab[-3] || '.' || lab[-2] || '.' || lab[-1]
                    WHEN len(lab) >= 2 AND lab[-1]
                        IN ('au','com','de','io','net','org','uk')
                      THEN lab[-2] || '.' || lab[-1]
                    WHEN len(lab) >= 2 THEN lab[-2] || '.' || lab[-1]
                    ELSE host END AS domain
        FROM (SELECT doc_id, host, string_split(host, '.') AS lab FROM u)),
      bl AS (
        SELECT DISTINCT domain FROM dmn
        WHERE substring(md5(domain || ':blk'), 1, 1) < '4')
      SELECT d.doc_id, d.domain,
             (bl.domain IS NOT NULL) AS blocked
      FROM dmn d LEFT JOIN bl ON d.domain = bl.domain
      ORDER BY d.doc_id"""))

  /** Water-filling token-budget allocation (c17) — the mix-planning
    * step between c7's target WEIGHTS and c10's per-source CAPS: given
    * a global training budget B, per-source availability a_s (tokens
    * actually on disk) and target weights w_s (c7's temperature rule,
    * w = round(√a, 6) — rare sources up-weighted), allocate
    *   quota_s = min(a_s, λ·w_s)   with λ solving Σ quota = B —
    * the classic water-filling solution: sources whose availability
    * runs out before their weighted share saturate at a_s, and the
    * remaining budget re-levels across the others. This is the
    * arithmetic every mix plan does when target proportions meet
    * finite sources (the "requested 30% books but only have 12%"
    * problem); emitting it as a plan row per source makes the
    * re-leveling auditable instead of silent.
    *
    * Scale shape: one token-count aggregate with map-side partials →
    * |sources| rows; the water-filling scan is driver-side over those
    * rows (the c5 bin-walk argument — |sources| is dashboard-sized at
    * any corpus size). Quotas are floors of round-6 products, so the
    * plan under-allocates by at most |sources| tokens — never over.
    * Budget ≥ total availability degenerates to quota = a_s for all.
    *
    * Determinism: a_s integer-exact; w_s round-6; the breakpoint scan
    * compares f_j = A_j + ratio_j·(W − W_j) against B with the same
    * doubles on both engines; quota = floor(round(λ·w, 6)).
    */
  private[graft] def waterFillOf(docs: org.apache.spark.sql.DataFrame,
                                 budget: Long)
      : org.apache.spark.sql.DataFrame = {
    val s = docs.sparkSession
    val avail = docs
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n"))
      .groupBy("source").agg(sum("n").as("a"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      // a null source (permitted by the JSONL ingest contract) is a
      // real group — NULLS LAST everywhere in this operator, matching
      // DuckDB's default for the oracle's ORDER BY (r15 ADVICE #2)
      .sortBy(r => nullsLastKey(r._1))
    require(avail.nonEmpty, "c17_water_fill: corpus has no sources")
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = avail.map { case (src, a) => (src, a, r6(math.sqrt(a.toDouble))) }
    val totalA = rows.map(_._2).sum
    val out: Seq[(String, Long, Double, Long, Boolean)] =
      if (budget >= totalA)
        rows.map { case (src, a, w) => (src, a, w, a, true) }.toSeq
      else {
        // sorted by saturation breakpoint a/w; find the first j where
        // allocating λ = ratio_j already covers B → the saturated set
        // is the strict prefix before j
        // tie-break NULLS LAST, mirroring the oracle's
        // ROW_NUMBER() OVER (ORDER BY a / w, source) under DuckDB's
        // nulls-last default — on an exact a/w tie involving the null
        // group both engines must elect the same saturated prefix
        val byRatio = rows.sortBy { case (src, a, w) => (a / w, nullsLastKey(src)) }
        val n = byRatio.length
        val cumA = byRatio.scanLeft(0L)(_ + _._2).tail // A_1..A_n
        val sumW = byRatio.map(x => BigDecimal(x._3)).sum
        val cumW = byRatio.scanLeft(BigDecimal(0))(_ + _._3).tail
        var j = 0
        var found = false
        while (j < n - 1 && !found) {
          val ratio = byRatio(j)._2 / byRatio(j)._3
          val fj = (if (j == 0) 0L else cumA(j - 1)).toDouble +
            ratio * (sumW - (if (j == 0) BigDecimal(0) else cumW(j - 1))).toDouble
          if (fj >= budget) found = true else j += 1
        }
        // budget < totalA ⇒ mathematically some f_j ≥ budget; the loop
        // CLAMPS to the last breakpoint (j = n-1) rather than trusting
        // float-exact f_n ≥ budget, so a few-ulp shortfall can never
        // flip the whole corpus to "saturated" and over-allocate
        val aPrev = if (j == 0) 0L else cumA(j - 1)
        val wRest = (sumW - (if (j == 0) BigDecimal(0) else cumW(j - 1))).toDouble
        val lam = (budget - aPrev).toDouble / wRest
        val saturated = byRatio.take(j).map(_._1).toSet
        rows.map { case (src, a, w) =>
          if (saturated(src)) (src, a, w, a, true)
          else (src, a, w, math.floor(r6(lam * w)).toLong, false)
        }.toSeq
      }
    import s.implicits._
    out.toDF("source", "available_tokens", "weight", "quota_tokens",
        "saturated")
      .orderBy(asc_nulls_last("source"))
  }

  /** NULLS-LAST sort key for a nullable string — matches DuckDB's
    * default ASC null placement so driver-side sorts and oracle
    * ORDER BYs elect identical orders (and never NPE on null). */
  private def nullsLastKey(s: String): (Int, String) =
    if (s == null) (1, "") else (0, s)

  val cWaterFill = QueryDef(
    "c17_water_fill",
    (s, dir) => waterFillOf(Tables.documents(s, dir), budget = 10000L),
    Some("""
      WITH a AS (
        SELECT source,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS a
        FROM documents GROUP BY source),
      b AS (SELECT source, a, ROUND(SQRT(a), 6) AS w FROM a),
      r AS (SELECT *, a / w AS ratio,
                   ROW_NUMBER() OVER (ORDER BY a / w, source) AS k
            FROM b),
      c AS (SELECT *,
                   SUM(a) OVER (ORDER BY k) AS ca,
                   SUM(CAST(w AS DECIMAL(28,6))) OVER (ORDER BY k) AS cwd
            FROM r),
      tot AS (SELECT SUM(a) AS ta,
                     SUM(CAST(w AS DECIMAL(28,6))) AS twd
              FROM b),
      -- the weight tail subtracts in DECIMAL and casts ONCE, mirroring
      -- the Scala BigDecimal order of operations exactly
      f AS (SELECT c.*, tot.ta,
                   CAST(tot.twd - (c.cwd - CAST(c.w AS DECIMAL(28,6)))
                     AS DOUBLE) AS wtail
            FROM c CROSS JOIN tot),
      f2 AS (SELECT *, (ca - a) + ratio * wtail AS fj FROM f),
      -- first breakpoint covering B, CLAMPED to the last breakpoint
      -- when float shortfall leaves none (the Scala loop's clamp)
      j AS (SELECT * FROM f2
            WHERE fj >= 10000 OR k = (SELECT MAX(k) FROM f2)
            ORDER BY k LIMIT 1),
      lam AS (SELECT CASE WHEN (SELECT ta FROM tot) <= 10000 THEN NULL
                          ELSE (10000 - (j.ca - j.a)) / j.wtail
                     END AS lam
              FROM j)
      SELECT rb.source, rb.a AS available_tokens, rb.w AS weight,
             CASE WHEN (SELECT ta FROM tot) <= 10000 THEN rb.a
                  WHEN rb.k < (SELECT k FROM j) THEN rb.a
                  ELSE CAST(FLOOR(ROUND((SELECT lam FROM lam) * rb.w, 6)) AS BIGINT)
             END AS quota_tokens,
             ((SELECT ta FROM tot) <= 10000 OR rb.k < (SELECT k FROM j))
               AS saturated
      FROM r AS rb
      ORDER BY rb.source"""))

  // ---- c18: the quota-driven mix-planning chain (r17 queue #6) -------

  /** Quota-driven per-source TOKEN cap — the c10 cap re-denominated in
    * c17's water-fill quotas: keep each source's docs in 'cap:'-draw
    * order while the INCLUSIVE cumulative token count stays within the
    * source's quota (the c5 cum-≤-budget rule, applied per source), and
    * plan n_epochs = clamp(⌈quota / kept_tokens⌉, 1, maxEpochs) — repeat
    * the kept slice toward its own quota, not a global target.
    *
    * Scale shape — the c5 two-phase discipline PER SOURCE (c10's
    * scaladoc promise, kept here too: a source's full corpus share
    * never reaches a sort): per-(source, bin) token sums (bin = the
    * draw's first octet, 256 uniform bins; map-side partials) locate
    * each source's crossing bin on a |sources|×256-row broadcast
    * frame; bins wholly under quota pass with NO window, bins past it
    * drop map-side, and only the crossing bin's docs (≈1/256 of a
    * source) pay the cumulative window. Boundary classification is
    * exact: a bin with cum ≤ quota keeps every doc (each inclusive
    * doc-cum ≤ bin-cum), a bin with prev ≥ quota keeps none (each
    * doc-cum > prev), and the crossing bin's window adds `prev` as the
    * offset — bitwise the one-window rule the oracle states.
    *
    * A source whose quota admits no doc (quota < its first doc's
    * tokens, incl. quota 0) disappears from the plan — there is
    * nothing to schedule for it. Sources are joined by equality; the
    * null-source group c17 tolerates would need a null-safe join here
    * (the driver corpus has none — JsonlIngestSpec's contract note). */
  private[graft] def sourceTokenCapOf(kept: org.apache.spark.sql.DataFrame,
                                      quotas: org.apache.spark.sql.DataFrame,
                                      maxEpochs: Int)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.plans.Stage.StageOps
    val base = kept
      .select(col("doc_id"), col("source"),
        md5(concat(lit("cap:"), col("doc_id").cast("string"))).as("ord"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .join(broadcast(quotas.select(col("source"), col("quota_tokens"))),
        "source")
      .withColumn("bin", substring(col("ord"), 1, 2))
      .staged
    val binCum = base.groupBy(col("source"), col("bin"))
      .agg(sum(col("n_tokens")).as("bt"))
      .withColumn("cum", sum(col("bt")).over(
        Window.partitionBy(col("source")).orderBy(col("bin"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("prev", col("cum") - col("bt"))
      .select("source", "bin", "cum", "prev")
    val flagged = base.join(broadcast(binCum), Seq("source", "bin"))
    val wholeBins = flagged.filter(col("cum") <= col("quota_tokens"))
    val crossing = flagged.filter(
      col("prev") < col("quota_tokens") && col("cum") > col("quota_tokens"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("ord"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val crossKept = crossing
      .withColumn("__c", sum(col("n_tokens")).over(w) + col("prev"))
      .filter(col("__c") <= col("quota_tokens")).drop("__c")
    val capped = wholeBins.unionByName(crossKept)
      .select("source", "doc_id", "ord", "n_tokens", "quota_tokens").staged
    val eps = capped.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("kept_tokens"),
        max(col("quota_tokens")).as("__q"))
      .withColumn("n_epochs",
        least(lit(maxEpochs.toLong),
          greatest(lit(1L),
            ceil(col("__q").cast("double") / col("kept_tokens")).cast("long"))))
      .select("source", "kept_tokens", "n_epochs")
    capped.join(broadcast(eps), "source")
      .select(col("source"), col("doc_id"), col("n_tokens"),
        col("quota_tokens"), col("kept_tokens"), col("n_epochs"))
  }

  /** The composed mix-planning chain c7→c17→c10→c12 (r17 queue #6 —
    * the p1/p7 one-declarative-plan discipline applied to the sampling
    * stack): temperature-resample the corpus (c7), water-fill the token
    * budget into per-source quotas over the RESAMPLED corpus (c17),
    * cap each source to its quota with epoch planning
    * ([[sourceTokenCapOf]]), and expand into the epoch-salted
    * shard/position manifest a trainer consumes (c12's shared tail).
    * Each stage is the standalone operator's own building block —
    * MixChainSpec pins the composition equal to chaining them by hand —
    * and the whole chain is DuckDB-oracle-checked end to end.
    *
    * Scale shape: c7 is a broadcast-rate map-side filter over the ONE
    * staged kept frame (feeding both c17's aggregate and the cap
    * scan); c17 is |sources| driver rows; the cap is the two-phase
    * bin plan above; the expansion's only shuffle is the per-(epoch,
    * shard) rank exactly as c12. */
  private[graft] def mixPlanChainOf(docs: org.apache.spark.sql.DataFrame,
                                    budget: Long, maxEpochs: Int, nShards: Int)
      : org.apache.spark.sql.DataFrame = {
    val kept = graft.plans.Stage(mixResampleKept(docs))
    epochExpandOf(sourceTokenCapOf(kept, waterFillOf(kept, budget), maxEpochs),
      nShards)
  }

  val cMixPlanChain = QueryDef(
    "c18_mix_plan_chain",
    (s, dir) => mixPlanChainOf(Tables.documents(s, dir),
      budget = 6000L, maxEpochs = 4, nShards = 8),
    Some("""
      WITH c AS (SELECT lang, COUNT(*) AS n_l FROM documents GROUP BY lang),
      t AS (SELECT CAST(SUM(CAST(ROUND(SQRT(n_l), 6) AS DECIMAL(28,6))) AS DOUBLE) AS z,
                   SUM(n_l) AS n_all FROM c),
      r AS (
        SELECT lang,
               printf('%08x', CAST(LEAST(FLOOR(LEAST(1.0,
                 (ROUND(SQRT(n_l), 6) / z) * FLOOR(n_all / 2) / n_l) * 4294967296.0),
                 4294967295.0) AS BIGINT)) AS thr
        FROM c, t),
      kept AS (
        SELECT d.* FROM documents d JOIN r USING (lang)
        WHERE substring(md5(CAST(d.doc_id AS VARCHAR)), 5, 8) < r.thr),
      -- c17 water fill over the RESAMPLED corpus
      a AS (
        SELECT source,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS a
        FROM kept GROUP BY source),
      b AS (SELECT source, a, ROUND(SQRT(a), 6) AS w FROM a),
      r2 AS (SELECT *, a / w AS ratio,
                    ROW_NUMBER() OVER (ORDER BY a / w, source) AS k
             FROM b),
      c2 AS (SELECT *,
                    SUM(a) OVER (ORDER BY k) AS ca,
                    SUM(CAST(w AS DECIMAL(28,6))) OVER (ORDER BY k) AS cwd
             FROM r2),
      tot AS (SELECT SUM(a) AS ta,
                     SUM(CAST(w AS DECIMAL(28,6))) AS twd
              FROM b),
      f AS (SELECT c2.*, tot.ta,
                   CAST(tot.twd - (c2.cwd - CAST(c2.w AS DECIMAL(28,6)))
                     AS DOUBLE) AS wtail
            FROM c2 CROSS JOIN tot),
      f2 AS (SELECT *, (ca - a) + ratio * wtail AS fj FROM f),
      j AS (SELECT * FROM f2
            WHERE fj >= 6000 OR k = (SELECT MAX(k) FROM f2)
            ORDER BY k LIMIT 1),
      lam AS (SELECT CASE WHEN (SELECT ta FROM tot) <= 6000 THEN NULL
                          ELSE (6000 - (j.ca - j.a)) / j.wtail
                     END AS lam
              FROM j),
      q AS (SELECT rb.source,
                   CASE WHEN (SELECT ta FROM tot) <= 6000 THEN rb.a
                        WHEN rb.k < (SELECT k FROM j) THEN rb.a
                        ELSE CAST(FLOOR(ROUND((SELECT lam FROM lam) * rb.w, 6))
                               AS BIGINT)
                   END AS quota_tokens
            FROM r2 rb),
      -- quota-driven per-source token cap (inclusive cum <= quota)
      base AS (
        SELECT doc_id, source,
               md5('cap:' || CAST(doc_id AS VARCHAR)) AS ord,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM kept),
      cum AS (
        SELECT base.*, q.quota_tokens,
               SUM(n_tokens) OVER (PARTITION BY base.source ORDER BY ord, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM base JOIN q USING (source)),
      cap AS (SELECT * FROM cum WHERE cum <= quota_tokens),
      ep AS (
        SELECT source,
               CAST(LEAST(4, GREATEST(1,
                 CEIL(CAST(MAX(quota_tokens) AS DOUBLE) / SUM(n_tokens))))
                 AS BIGINT) AS n_epochs
        FROM cap GROUP BY source),
      -- c12's epoch-salted expansion
      expand AS (
        SELECT cap.doc_id, cap.source, cap.n_tokens, e.epoch
        FROM cap JOIN ep USING (source),
             UNNEST(generate_series(1, ep.n_epochs)) AS e(epoch)),
      h AS (
        SELECT doc_id, source, n_tokens, epoch,
               md5('epoch:' || CAST(epoch AS VARCHAR) || ':' ||
                   CAST(doc_id AS VARCHAR)) AS hh
        FROM expand),
      sh AS (
        SELECT doc_id, source, n_tokens, epoch,
               CAST(('0x' || substring(hh, 1, 8)) AS BIGINT) % 8 AS shard,
               substring(hh, 9, 8) AS o
        FROM h)
      SELECT CAST(epoch AS BIGINT) AS epoch, shard,
             CAST(ROW_NUMBER() OVER (PARTITION BY epoch, shard
               ORDER BY o, doc_id) AS BIGINT) AS pos,
             doc_id, source, n_tokens
      FROM sh ORDER BY epoch, shard, pos"""))

  // ---- c19: embedding-cluster-balanced resampling (r18) ---------------

  /** Cluster-balanced temperature resampling — c7's multilingual
    * rebalance with the group key computed from CONTENT GEOMETRY
    * instead of a metadata column: docs are assigned to embedding
    * clusters and over-represented clusters are flattened with the same
    * τ = 0.5 / half-corpus / hex-threshold discipline. This is the
    * semantic-diversity step of modern curation (the SemDeDup/DoReMi
    * observation: source labels under-describe redundancy — a crawl
    * source is internally clustered, and cluster-proportional
    * flattening is what actually diversifies the mix).
    *
    * Clustering is HASH-SEEDED nearest-seed partition, not k-means: the
    * k seeds are the vectors with the smallest salted draw
    * md5('c19:'‖vec_id) (content-keyed, layout-invariant, incremental-
    * append-stable until a new vector displaces a seed), and every
    * vector routes to the seed minimizing ‖c‖²/2 − x·c (the IVF argmin
    * form, exact for any norms). Unlike the fitted k-means of v5/v8,
    * every step has a closed form BOTH engines can state — so this is
    * the family's DuckDB-oracle-checked member (v5/v8 stay pins), at
    * the cost of centers that are samples rather than means — the
    * k-center-style one-pass trade.
    *
    * Cross-engine determinism: seed selection orders by the md5 hex
    * string; distances are doubles accumulated in ascending index
    * order from identical float inputs (the v1 dot discipline — d is
    * halfNorm − dot, never ±0-ambiguous: halfNorm > 0 and a finite
    * x−y is +0.0 when equal); ties break to the smaller seed id; rates
    * quantize to the c7 hex threshold; membership is the salted draw
    * md5('cmix:'‖vec_id) (every unsalted octet is claimed — the c10
    * discipline).
    *
    * Scale shape: the seed table is driver-k (collected like the IVF
    * centroid table); assignment is a pure MAP-SIDE argmin over k
    * literal centers (zero shuffle, codegen'd dot kernels); cluster
    * counts are ONE aggregate to k rows; the rate table broadcasts
    * back; membership is map-side; the final audit aggregate is k
    * rows. The corpus is never shuffled. */
  /** The k hash-seeded centers: smallest salted draw, collected to the
    * driver (k-bounded, the IVF centroid-table shape). */
  private[graft] def clusterSeeds(emb: org.apache.spark.sql.DataFrame,
                                  k: Int): Array[(Long, Array[Double])] =
    emb
      .withColumn("__d", md5(concat(lit("c19:"), col("vec_id").cast("string"))))
      .orderBy(col("__d"), col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)

  /** Map-side nearest-seed assignment over literal centers: one row per
    * vector, `(vec_id, cluster)`, zero shuffle. */
  private[graft] def clusterAssign(emb: org.apache.spark.sql.DataFrame,
                                   seeds: Array[(Long, Array[Double])])
      : org.apache.spark.sql.DataFrame = {
    val fdot = graft.functions.VectorExpressions.fdot _
    val distStructs = array(seeds.map { case (sid, v) =>
      val c = array(v.map(lit): _*)
      struct((lit(v.map(x => x * x).sum / 2.0) - fdot(col("embedding"), c)).as("d"),
        lit(sid).as("seed"))
    }: _*)
    emb.select(col("vec_id"),
      array_min(distStructs).getField("seed").as("cluster"))
  }

  private[graft] def clusterMixOf(emb: org.apache.spark.sql.DataFrame,
                                  k: Int): org.apache.spark.sql.DataFrame = {
    val seeds = clusterSeeds(emb, k)
    require(seeds.nonEmpty, "c19 cluster mix needs a non-empty embedding frame")
    val assigned = clusterAssign(emb, seeds)
    val counts = assigned.groupBy(col("cluster")).agg(count(lit(1)).as("n_c"))
    val snl = round(sqrt(col("n_c")), 6)
    val tot = counts.agg(
      sum(snl.cast(org.apache.spark.sql.types.DecimalType(28, 6)))
        .cast("double").as("z"),
      sum(col("n_c")).as("n_all"))
    val rate = least(
      lit(1.0),
      snl / col("z") * floor(col("n_all") / lit(2)) / col("n_c"))
    val rates = counts.crossJoin(broadcast(tot))
      .select(col("cluster"),
        lpad(lower(hex(least(floor(rate * lit(4294967296.0)),
          lit(4294967295.0)).cast("long"))), 8, "0").as("thr"))
    assigned.join(broadcast(rates), "cluster")
      .withColumn("__keep",
        substring(md5(concat(lit("cmix:"), col("vec_id").cast("string"))), 1, 8)
          < col("thr"))
      .groupBy(col("cluster"))
      .agg(
        count(lit(1)).as("n_vecs"),
        sum(col("__keep").cast("long")).as("n_kept"),
        sum(when(col("__keep"), col("vec_id")).otherwise(lit(0L))).as("kept_vec_sum"),
        min(col("thr")).as("rate_thr"))
      .orderBy("cluster")
  }

  val cClusterMix = QueryDef(
    "c19_cluster_mix",
    (s, dir) => clusterMixOf(
      Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")), k = 8),
    Some("""
      WITH sd AS (
        SELECT vec_id AS seed, embedding AS se
        FROM embeddings
        ORDER BY md5('c19:' || CAST(vec_id AS VARCHAR)), vec_id
        LIMIT 8),
      a AS (
        SELECT e.vec_id, s.seed,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(range(1, len(s.se) + 1),
                   i -> CAST(s.se[i] AS DOUBLE) * CAST(s.se[i] AS DOUBLE))),
                 (acc, v) -> acc + v) / 2.0
               - list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(range(1, len(s.se) + 1),
                   i -> CAST(e.embedding[i] AS DOUBLE) * CAST(s.se[i] AS DOUBLE))),
                 (acc, v) -> acc + v) AS d
        FROM embeddings e, sd s),
      asg AS (
        SELECT vec_id, seed AS cluster
        FROM (SELECT vec_id, seed,
                     ROW_NUMBER() OVER (PARTITION BY vec_id
                                        ORDER BY d ASC, seed ASC) AS rn
              FROM a)
        WHERE rn = 1),
      c AS (SELECT cluster, COUNT(*) AS n_c FROM asg GROUP BY cluster),
      t AS (SELECT CAST(SUM(CAST(ROUND(SQRT(n_c), 6) AS DECIMAL(28,6))) AS DOUBLE) AS z,
                   SUM(n_c) AS n_all FROM c),
      r AS (
        SELECT cluster,
               printf('%08x', CAST(LEAST(FLOOR(LEAST(1.0,
                 (ROUND(SQRT(n_c), 6) / z) * FLOOR(n_all / 2) / n_c) * 4294967296.0),
                 4294967295.0) AS BIGINT)) AS thr
        FROM c, t),
      m AS (
        SELECT asg.vec_id, asg.cluster, r.thr,
               substring(md5('cmix:' || CAST(asg.vec_id AS VARCHAR)), 1, 8) < r.thr AS keep
        FROM asg JOIN r USING (cluster))
      SELECT cluster, COUNT(*) AS n_vecs,
             CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             CAST(SUM(CASE WHEN keep THEN vec_id ELSE 0 END) AS BIGINT) AS kept_vec_sum,
             MIN(thr) AS rate_thr
      FROM m GROUP BY cluster ORDER BY cluster"""))

  // ---- c20: curriculum ordering plan (r18) -----------------------------

  /** Curriculum data-ordering plan — the pacing step between curation
    * and the trainer (curriculum-learning data schedules: present
    * cleaner text first, the long tail later; the complement of c15's
    * anneal BUDGET, which picks what to train on at the end — c20
    * orders the whole corpus): stage = quality tercile (0 = easiest /
    * highest t2 quality first), and WITHIN each stage the c8
    * deterministic shard + position so a sharded trainer consumes
    * stages in order with a reproducible permutation inside each.
    *
    * Terciles use t24's value-cutoff discipline — quality quantizes to
    * a 6dp grid, so cutoffs walk the ≤ grid-sized bin histogram on the
    * driver and every doc with the same value lands in the same stage
    * (no unpartitioned global rank, no cross-engine tie ambiguity).
    * Shard/order octets come from the SALTED draw md5('cur:'‖doc_id):
    * the curriculum's order must be independent of c8's training-order
    * octets (a correlated draw would replay the same permutation) and
    * every unsalted octet is claimed (the c10 discipline).
    *
    * Scale shape: ONE staged feature pass (the shared t2 frame); the
    * bin histogram is grid-sized and collected; stage/shard are pure
    * map-side expressions; the only shuffle is the (stage, shard)-keyed
    * rank — the c8 exchange shape, 3 × nShards balanced partitions, no
    * global sort anywhere. */
  private[graft] def curriculumPlanOf(docs: org.apache.spark.sql.DataFrame,
                                      nShards: Int)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = qualityTokenFrame(docs)
    val bins = q.groupBy(col("quality")).agg(count(lit(1)).as("c"))
      .collect() // ≤ 6dp-grid bins, never corpus-sized (t24's argument)
      .map(r => (r.getDouble(0), r.getLong(1)))
      .sortBy(-_._1) // easiest (highest quality) first
    val total = bins.map(_._2).sum
    require(total > 0, "c20 curriculum plan: empty corpus")
    def cutAtRank(k: Long): Double = {
      var cum = 0L
      val it = bins.iterator
      var cut = Double.NegativeInfinity
      while (cum < k && it.hasNext) { val (value, c) = it.next(); cum += c; cut = value }
      cut
    }
    val cut1 = cutAtRank((total + 2) / 3)
    val cut2 = cutAtRank((2 * total + 2) / 3)
    val stage = when(col("quality") >= cut1, lit(0L))
      .when(col("quality") >= cut2, lit(1L)).otherwise(lit(2L))
    val h = md5(concat(lit("cur:"), col("doc_id").cast("string")))
    val shard = conv(substring(h, 1, 8), 16, 10).cast("long") % nShards
    // no global sort here: the trainer-facing plan's only exchange is
    // the (stage, shard)-keyed rank — presentation ordering lives in
    // the QueryDef wrapper (the c8_shard_shuffle pattern)
    q.select(col("doc_id"), stage.as("stage"), shard.as("shard"),
        substring(h, 9, 8).as("__o"))
      .withColumn("pos",
        row_number().over(
          Window.partitionBy(col("stage"), col("shard"))
            .orderBy(col("__o"), col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("stage"), col("shard"), col("pos"))
  }

  val cCurriculumPlan = QueryDef(
    "c20_curriculum_plan",
    (s, dir) => curriculumPlanOf(Tables.documents(s, dir), nShards = 8)
      .orderBy("doc_id"),
    Some("""
      WITH b AS (
        SELECT doc_id, n_chars, string_split(text, ' ') AS tk,
               CAST(len(string_split(text, ' ')) AS DOUBLE) AS nt
        FROM documents),
      scored AS (
        SELECT doc_id,
               ROUND(CASE WHEN n_chars BETWEEN 100 AND 5000 THEN 0.5 ELSE 0.0 END
                     + (len(list_filter(tk, t -> t IN ('the','a','and','of','to','in'))) / nt) * 0.25
                     + (len(list_distinct(tk)) / nt) * 0.25, 6) AS q
        FROM b),
      bins AS (SELECT q, COUNT(*) AS c FROM scored GROUP BY q),
      cum AS (SELECT q, SUM(c) OVER (ORDER BY q DESC) AS cum FROM bins),
      tot AS (SELECT COUNT(*) AS n FROM scored),
      cuts AS (SELECT
          (SELECT MAX(q) FROM cum, tot WHERE cum >= (n + 2) // 3) AS cut1,
          (SELECT MAX(q) FROM cum, tot WHERE cum >= (2 * n + 2) // 3) AS cut2),
      st AS (
        SELECT doc_id,
               CASE WHEN q >= cut1 THEN 0 WHEN q >= cut2 THEN 1 ELSE 2 END AS stage,
               CAST(('0x' || substring(md5('cur:' || CAST(doc_id AS VARCHAR)), 1, 8))
                 AS BIGINT) % 8 AS shard,
               substring(md5('cur:' || CAST(doc_id AS VARCHAR)), 9, 8) AS o
        FROM scored CROSS JOIN cuts)
      SELECT doc_id, CAST(stage AS BIGINT) AS stage, shard,
             CAST(ROW_NUMBER() OVER (PARTITION BY stage, shard ORDER BY o, doc_id)
               AS BIGINT) AS pos
      FROM st ORDER BY doc_id"""))

  val all: Seq[QueryDef] =
    Seq(cSample, cMixAudit, cSplit, cStratified, cTokenBudget, cKAnonymity,
      cMixResample, cShardShuffle, cSnapshotDiff, cSourceCap, cEpochShardPlan,
      cDomainCap, cDsirSelect, cAnnealPlan, cBlocklistGate, cWaterFill,
      cMixPlanChain, cClusterMix, cCurriculumPlan)
}
