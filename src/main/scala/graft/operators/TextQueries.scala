package graft.operators

import org.apache.spark.sql.functions._

import graft.plans.Stage.StageOps
import graft.sources.Tables

/** Text-analysis operators for training-data pipelines over `documents`:
  * token statistics, quality scoring, language-ID heuristic, rolling
  * fingerprint. All pure Catalyst expressions (whole-stage codegen; no
  * UDFs) with DuckDB oracles.
  */
object TextQueries {

  private val toks = split(col("text"), " ")

  /** Token counting (whitespace tokenizer) + char stats. */
  val tTokenStats = QueryDef(
    "t1_token_stats",
    (s, dir) =>
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          size(toks).cast("long").as("n_tokens"),
          size(array_distinct(toks)).cast("long").as("n_distinct"),
          col("n_chars"),
          round((col("n_chars") - (size(toks) - 1).cast("double")) / size(toks), 6)
            .as("avg_token_len"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
             n_chars,
             ROUND((n_chars - CAST(len(string_split(text, ' ')) - 1 AS DOUBLE))
                   / len(string_split(text, ' ')), 6) AS avg_token_len
      FROM documents ORDER BY doc_id"""))

  /** The t2 stopword lexicon — ONE definition shared by t2, the t16
    * classifier features and the c5/p2 quality-token frame, so the
    * quality rule can never drift between its consumers (same
    * discipline as SampleQueries.splitCol). Canonical array lives in
    * [[graft.functions.QualityRuleKernel]] (the t9 battery's native
    * kernel makes a static codegen call and cannot carry a reference
    * object cheaply); this is the same object, not a copy. */
  private[graft] val stopwords: Seq[String] =
    graft.functions.QualityRuleKernel.stopwords.toSeq

  /** The rule's two ratio sub-expressions, exposed alongside it: the
    * t16 classifier's FEATURES are these same quantities, so they must
    * be the same expressions — a drifted feature copy would degrade
    * the distillation with no test failing. */
  private[graft] def stopRatio(tk: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    size(filter(tk, t => array_contains(array(stopwords.map(lit): _*), t)))
      .cast("double") / size(tk).cast("double")

  private[graft] def typeTokenRatio(tk: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    size(array_distinct(tk)).cast("double") / size(tk).cast("double")

  /** The t2 quality rule over a token-array column + char count:
    * 0.5·length_ok + 0.25·stop_ratio + 0.25·type-token-ratio,
    * rounded to 6 (the rounding is part of the rule — c5's budget
    * bins key on it). */
  private[graft] def qualityExpr(tk: org.apache.spark.sql.Column,
                                 nChars: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round(
      when(nChars >= 100 && nChars <= 5000, 0.5).otherwise(0.0)
        + stopRatio(tk) * 0.25
        + typeTokenRatio(tk) * 0.25, 6)

  /** Quality scoring: stopword ratio, type-token ratio, length flags —
    * the length/punct/stopword-ratio family of pretraining filters. */
  val tQuality = QueryDef(
    "t2_quality_score",
    (s, dir) => {
      val stopArr = array(stopwords.map(lit): _*)
      val nTok = size(toks).cast("double")
      val stopCnt = size(filter(toks, t => array_contains(stopArr, t))).cast("double")
      val ttr = size(array_distinct(toks)).cast("double") / nTok
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          round(stopCnt / nTok, 6).as("stop_ratio"),
          round(ttr, 6).as("type_token_ratio"),
          (col("n_chars") >= 100 && col("n_chars") <= 5000).as("length_ok"),
          qualityExpr(toks, col("n_chars")).as("quality"))
        .orderBy("doc_id")
    },
    Some("""
      WITH b AS (
        SELECT doc_id, n_chars,
               string_split(text, ' ') AS tk,
               CAST(len(string_split(text, ' ')) AS DOUBLE) AS nt
        FROM documents)
      SELECT doc_id,
             ROUND(len(list_filter(tk, t -> t IN ('the','a','and','of','to','in'))) / nt, 6) AS stop_ratio,
             ROUND(len(list_distinct(tk)) / nt, 6) AS type_token_ratio,
             n_chars BETWEEN 100 AND 5000 AS length_ok,
             ROUND(CASE WHEN n_chars BETWEEN 100 AND 5000 THEN 0.5 ELSE 0.0 END
                   + (len(list_filter(tk, t -> t IN ('the','a','and','of','to','in'))) / nt) * 0.25
                   + (len(list_distinct(tk)) / nt) * 0.25, 6) AS quality
      FROM b ORDER BY doc_id"""))

  /** Language-ID by stopword-lexicon hit counts (n-gram-free heuristic;
    * deterministic argmax with fixed tie-break order en>de>fr>es>zh). */
  val tLangId = QueryDef(
    "t3_lang_id",
    (s, dir) => {
      def hits(words: Seq[String]) = {
        val arr = array(words.map(lit): _*)
        size(filter(toks, t => array_contains(arr, t))).cast("long")
      }
      val en = hits(Seq("the", "a", "and", "of"))
      val de = hits(Seq("der", "die", "das", "und"))
      val fr = hits(Seq("le", "la", "et", "les"))
      val es = hits(Seq("el", "los", "y", "es"))
      val zh = hits(Seq("de", "shi", "le", "zai"))
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang").as("labeled_lang"),
          en.as("s_en"), de.as("s_de"), fr.as("s_fr"), es.as("s_es"), zh.as("s_zh"))
        .withColumn("predicted",
          when(col("s_en") >= greatest(col("s_de"), col("s_fr"), col("s_es"), col("s_zh")), "en")
            .when(col("s_de") >= greatest(col("s_fr"), col("s_es"), col("s_zh")), "de")
            .when(col("s_fr") >= greatest(col("s_es"), col("s_zh")), "fr")
            .when(col("s_es") >= col("s_zh"), "es")
            .otherwise("zh"))
        .orderBy("doc_id")
    },
    Some("""
      WITH b AS (
        SELECT doc_id, lang AS labeled_lang, string_split(text, ' ') AS tk FROM documents),
      sc AS (
        SELECT doc_id, labeled_lang,
               CAST(len(list_filter(tk, t -> t IN ('the','a','and','of'))) AS BIGINT) AS s_en,
               CAST(len(list_filter(tk, t -> t IN ('der','die','das','und'))) AS BIGINT) AS s_de,
               CAST(len(list_filter(tk, t -> t IN ('le','la','et','les'))) AS BIGINT) AS s_fr,
               CAST(len(list_filter(tk, t -> t IN ('el','los','y','es'))) AS BIGINT) AS s_es,
               CAST(len(list_filter(tk, t -> t IN ('de','shi','le','zai'))) AS BIGINT) AS s_zh
        FROM b)
      SELECT doc_id, labeled_lang, s_en, s_de, s_fr, s_es, s_zh,
             CASE WHEN s_en >= GREATEST(s_de, s_fr, s_es, s_zh) THEN 'en'
                  WHEN s_de >= GREATEST(s_fr, s_es, s_zh) THEN 'de'
                  WHEN s_fr >= GREATEST(s_es, s_zh) THEN 'fr'
                  WHEN s_es >= s_zh THEN 'es'
                  ELSE 'zh' END AS predicted
      FROM sc ORDER BY doc_id"""))

  /** Rolling document fingerprint: order-sensitive polynomial hash over
    * (length + first-char code) of each token, mod 1e9+7. Exact integer
    * arithmetic on both engines. */
  val tFingerprint = QueryDef(
    "t4_fingerprint",
    (s, dir) => {
      val codes = transform(toks, t => (length(t) + ascii(t)).cast("long"))
      val fp = aggregate(codes, lit(0L), (acc, x) => (acc * 31L + x) % 1000000007L)
      Tables.documents(s, dir)
        .select(col("doc_id"), fp.as("fingerprint"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(string_split(text, ' '),
                                t -> CAST(length(t) + ascii(t) AS BIGINT))),
               (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint
      FROM documents ORDER BY doc_id"""))

  /** Grouped corpus stats per language (A-family agg over documents). */
  val tLangStats = QueryDef(
    "t5_lang_stats",
    (s, dir) =>
      Tables.documents(s, dir)
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          QueryDef.dsumd(col("n_chars"), 0).as("total_chars"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy("lang"),
    Some("""
      SELECT lang, COUNT(*) AS n_docs,
             ROUND(CAST(SUM(CAST(n_chars AS DECIMAL(30,0))) AS DOUBLE), 4) AS total_chars,
             COUNT(DISTINCT source) AS n_sources
      FROM documents GROUP BY lang ORDER BY lang"""))

  /** Repetition metrics (the repeated-n-gram family of pretraining
    * quality filters): per-doc repeated-bigram fraction and the
    * most-frequent-token mass. The top-token pass is explode → two-level
    * aggregate — partial aggregation keeps the shuffle bounded by
    * (doc, distinct token), never by corpus size. */
  val tRepetition = QueryDef(
    "t6_repetition",
    (s, dir) => {
      val docs = Tables.documents(s, dir).filter(size(toks) >= 2)
      val bigrams = transform(sequence(lit(0), size(toks) - 2),
        i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2)))
      val bi = docs.select(col("doc_id"), bigrams.as("bg"), size(toks).cast("double").as("nt"))
        .select(col("doc_id"), col("nt"),
          size(col("bg")).cast("long").as("n_bigrams"),
          round(lit(1.0) - size(array_distinct(col("bg"))).cast("double") /
            size(col("bg")).cast("double"), 6).as("repeated_bigram_frac"))
      val top = docs.select(col("doc_id"), explode(toks).as("tok"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id")).agg(max(col("c")).as("max_c"))
      bi.join(top, "doc_id")
        .select(col("doc_id"), col("n_bigrams"), col("repeated_bigram_frac"),
          round(col("max_c").cast("double") / col("nt"), 6).as("top_token_frac"))
        .orderBy("doc_id")
    },
    Some("""
      WITH b AS (
        SELECT doc_id, string_split(text, ' ') AS tk FROM documents
        WHERE len(string_split(text, ' ')) >= 2),
      bg AS (
        SELECT doc_id,
               list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1]) AS g,
               CAST(len(tk) AS DOUBLE) AS nt
        FROM b),
      bm AS (
        SELECT doc_id, nt, CAST(len(g) AS BIGINT) AS n_bigrams,
               ROUND(1.0 - len(list_distinct(g)) / CAST(len(g) AS DOUBLE), 6) AS repeated_bigram_frac
        FROM bg),
      tc AS (
        SELECT doc_id, t AS tok, COUNT(*) AS c
        FROM b, UNNEST(b.tk) AS u(t) GROUP BY doc_id, t),
      tp AS (SELECT doc_id, MAX(c) AS max_c FROM tc GROUP BY doc_id)
      SELECT bm.doc_id, bm.n_bigrams, bm.repeated_bigram_frac,
             ROUND(CAST(tp.max_c AS DOUBLE) / bm.nt, 6) AS top_token_frac
      FROM bm JOIN tp USING (doc_id) ORDER BY doc_id"""))

  /** Corpus vocabulary: top-20 tokens by term frequency with document
    * frequency — explode → token-keyed aggregate (map-side combine) →
    * TakeOrdered; the canonical vocabulary-building scan. */
  val tVocab = QueryDef(
    "t7_vocab_topk",
    (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), explode(toks).as("tok"))
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
        .orderBy(col("tf").desc, col("tok").asc)
        .limit(20),
    Some("""
      SELECT t AS tok, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
      FROM documents, UNNEST(string_split(text, ' ')) AS u(t)
      GROUP BY t ORDER BY tf DESC, tok ASC LIMIT 20"""))

  /** TF-IDF top-3 distinctive terms per document. Two-level aggregate
    * (doc×term TF with map-side combine, then term-keyed DF), a
    * vocabulary join on the term key, and a per-doc top-k window — the
    * canonical keyword-extraction scan. The RANKING key is integer-exact
    * (tf desc, df asc, term asc) so the row set is bit-deterministic
    * across engines; the reported tf·ln(N/df) score is display-rounded.
    */
  val tTfidf = QueryDef(
    "t8_tfidf_terms",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, dir)
      val nDocs = docs.agg(count(lit(1)).cast("double").as("n_docs"))
      val tf = docs.select(col("doc_id"), explode(toks).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      // tf rows are unique per (doc, tok), so DF is a plain count
      val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      tf.join(df, "tok").crossJoin(broadcast(nDocs))
        .withColumn("tfidf", round(col("tf") * log(col("n_docs") / col("df")), 6))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("doc_id")
            .orderBy(col("tf").desc, col("df").asc, col("tok").asc)))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), col("rnk").cast("long").as("rnk"),
          col("tok"), col("tf"), col("df"), col("tfidf"))
        .orderBy("doc_id", "rnk")
    },
    Some("""
      WITH tf AS (
        SELECT doc_id, u.t AS tok, COUNT(*) AS tf
        FROM documents, UNNEST(string_split(text, ' ')) AS u(t)
        GROUP BY doc_id, u.t),
      df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
      n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
      sc AS (
        SELECT tf.doc_id, tf.tok, tf.tf, df.df,
               ROUND(tf.tf * ln(n.n_docs / df.df), 6) AS tfidf,
               ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                 ORDER BY tf.tf DESC, df.df ASC, tf.tok ASC) AS rnk
        FROM tf JOIN df USING (tok), n)
      SELECT doc_id, rnk, tok, tf, df, tfidf
      FROM sc WHERE rnk <= 3 ORDER BY doc_id, rnk"""))

  /** The 5-rule Gopher-style battery over a (doc_id, n_chars, tk)
    * frame — shared by t9 (full per-rule report) and the p1 curation
    * pipeline (which consumes only the `keep` gate). Array rules are
    * per-row codegen expressions; the top-token mass uses t6's LINEAR
    * explode → two-level-aggregate shape (a nested count-per-distinct-
    * token HOF would be quadratic in document length). */
  private[graft] def qualityRuleFrame(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // ONE native kernel pass per row (r21 optimization round —
    // QualityRuleKernel): max token multiplicity, stop-lexicon
    // occurrences and distinct adjacent bigrams all come from a single
    // per-row hash-map pass, making the battery a zero-shuffle
    // scan→project pipeline. The old shape computed max_c as
    // explode → groupBy(doc, tok) → groupBy(doc) max → join-back —
    // two corpus-keyed exchanges plus a broadcast join per battery
    // call, paid by every release-stack query (guide §2.4). The
    // explode path also silently DROPPED docs with an empty token
    // array (no exploded rows → inner join); every caller pre-filters
    // size(tk) >= 2, and the explicit filter keeps that contract
    // for any future caller.
    val ruleNames = Seq("r_word_count", "r_mean_word_len", "r_stopwords",
      "r_top_token", "r_repeated_bigrams")
    val tokCol = col("tk")
    val ntA = size(tokCol)
    docs.filter(size(col("tk")) >= 1)
      .select(col("doc_id"), col("n_chars"), col("tk"),
        graft.functions.RepetitionExpressions.qualityRuleStats(tokCol).as("__qs"))
      .select(
        col("doc_id"),
        (ntA >= 30 && ntA <= 1000).as("r_word_count"),
        ((col("n_chars") - (ntA - 1).cast("double")) / ntA.cast("double"))
          .between(3.0, 10.0).as("r_mean_word_len"),
        (col("__qs.stop_hits") >= 2).as("r_stopwords"),
        (col("__qs.max_count").cast("double") / ntA.cast("double") <= 0.2).as("r_top_token"),
        (lit(1.0) - col("__qs.distinct_bigrams").cast("double") /
          (ntA - 1).cast("double") <= 0.3).as("r_repeated_bigrams"))
      .withColumn("n_rules_passed",
        ruleNames.map(n => col(n).cast("long")).reduce(_ + _))
      .withColumn("keep", col("n_rules_passed") === 5)
  }

  /** The battery's `keep` gate as ONE row predicate (r21) — the seat
    * for funnel callers that only consume the verdict: the old shape
    * (battery → filter(keep) → select(doc_id) → join back on doc_id)
    * re-keys the corpus on a corpus-sized id set, a full document
    * exchange at scale for a per-row decision.
    * [[graft.functions.QualityRuleKernel.keep]] applies the SAME five
    * rules in one kernel call (bit-identical Java double arithmetic;
    * QualityKeepParitySpec pins it against [[qualityRuleFrame]], and
    * the battery's own size>=1 row-drop is subsumed by r_word_count's
    * 30-token floor). t9/t16 keep the full battery frame — they report
    * per-rule verdicts, not just the gate. */
  private[graft] def qualityKeepExpr(tk: org.apache.spark.sql.Column,
                                     nChars: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    graft.functions.RepetitionExpressions.qualityRuleKeep(tk, nChars)

  /** Gopher-style rule-battery quality filter: the hard keep/drop gates
    * of the pretraining-data playbook (word-count bounds, mean-word-length
    * bounds, minimum stopword evidence, top-token mass cap, repeated-
    * bigram cap) evaluated per document with the per-rule verdicts
    * exposed — the form a pipeline needs to audit WHY a doc was dropped.
    * Rule thresholds adapted to the synthetic corpus so both outcomes
    * occur. */
  val tQualityFilter = QueryDef(
    "t9_quality_filter",
    (s, dir) => qualityRuleFrame(
      Tables.documents(s, dir).filter(size(toks) >= 2)
        .select(col("doc_id"), col("n_chars"), toks.as("tk")))
      .orderBy("doc_id"),
    Some("""
      WITH b AS (
        SELECT doc_id, n_chars, string_split(text, ' ') AS tk
        FROM documents WHERE len(string_split(text, ' ')) >= 2),
      tc AS (
        SELECT doc_id, t AS tok, COUNT(*) AS c
        FROM b, UNNEST(b.tk) AS u(t) GROUP BY doc_id, t),
      tp AS (SELECT doc_id, MAX(c) AS max_c FROM tc GROUP BY doc_id),
      r AS (
        SELECT b.doc_id,
               len(tk) BETWEEN 30 AND 1000 AS r_word_count,
               ((n_chars - CAST(len(tk) - 1 AS DOUBLE)) / len(tk)) BETWEEN 3.0 AND 10.0
                 AS r_mean_word_len,
               len(list_filter(tk, t -> t IN ('the','a','and','of','to','in'))) >= 2
                 AS r_stopwords,
               CAST(tp.max_c AS DOUBLE) / len(tk) <= 0.2 AS r_top_token,
               1.0 - CAST(len(list_distinct(list_transform(range(1, len(tk)),
                        i -> tk[i] || ' ' || tk[i+1]))) AS DOUBLE)
                 / (len(tk) - 1) <= 0.3 AS r_repeated_bigrams
        FROM b JOIN tp USING (doc_id))
      SELECT doc_id, r_word_count, r_mean_word_len, r_stopwords, r_top_token,
             r_repeated_bigrams,
             CAST(r_word_count AS BIGINT) + CAST(r_mean_word_len AS BIGINT)
               + CAST(r_stopwords AS BIGINT) + CAST(r_top_token AS BIGINT)
               + CAST(r_repeated_bigrams AS BIGINT) AS n_rules_passed,
             (CAST(r_word_count AS BIGINT) + CAST(r_mean_word_len AS BIGINT)
               + CAST(r_stopwords AS BIGINT) + CAST(r_top_token AS BIGINT)
               + CAST(r_repeated_bigrams AS BIGINT)) = 5 AS keep
      FROM r ORDER BY doc_id"""))

  /** Corpus-bigram novelty per document: how SURPRISING a doc's word
    * transitions are relative to the whole corpus — the integer-exact
    * core of an n-gram LM quality score (kept in count space, not
    * log-prob space, so the cross-engine comparison is exact). Two-level
    * aggregate (doc×bigram with map-side combine, then corpus counts),
    * a bigram-keyed join back, and a per-doc aggregate: per doc, the
    * number of corpus-unique bigrams, the fraction they make up, and
    * the exact interpolated median corpus frequency of its bigrams. */
  val tBigramNovelty = QueryDef(
    "t10_bigram_novelty",
    (s, dir) => {
      // bigram array is a computed heavy expression: materialize BEFORE
      // the explode or InferFiltersFromGenerate duplicates it into a
      // pre-shuffle filter (see ngramPairs)
      val bigrams = transform(sequence(lit(0), size(col("tk")) - 2),
        i => concat_ws(" ", element_at(col("tk"), i + 1), element_at(col("tk"), i + 2)))
      val docs = QueryDef.spread(Tables.documents(s, dir))
        .select(col("doc_id"), toks.as("tk"))
        .filter(size(col("tk")) >= 2)
        .select(col("doc_id"), bigrams.as("bg"))
        .staged
      val ex = docs.select(col("doc_id"), explode(col("bg")).as("bigram"))
      val corpus = ex.groupBy("bigram").agg(count(lit(1)).as("cfreq"))
      ex.join(corpus, "bigram")
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_bigrams"),
          sum(when(col("cfreq") === 1, 1L).otherwise(0L)).as("n_corpus_unique"),
          round(sum(when(col("cfreq") === 1, 1L).otherwise(0L)).cast("double") /
            count(lit(1)).cast("double"), 6).as("unique_frac"),
          round(expr("percentile(cfreq, 0.5)"), 6).as("median_cfreq"))
        .orderBy("doc_id")
    },
    Some("""
      WITH b AS (
        SELECT doc_id, string_split(text, ' ') AS tk FROM documents
        WHERE len(string_split(text, ' ')) >= 2),
      ex AS (
        SELECT doc_id, g AS bigram
        FROM (SELECT doc_id, list_transform(range(1, len(tk)),
                       i -> tk[i] || ' ' || tk[i+1]) AS gs FROM b),
             UNNEST(gs) AS u(g)),
      c AS (SELECT bigram, COUNT(*) AS cfreq FROM ex GROUP BY bigram)
      SELECT ex.doc_id,
             COUNT(*) AS n_bigrams,
             CAST(SUM(CASE WHEN c.cfreq = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_corpus_unique,
             ROUND(SUM(CASE WHEN c.cfreq = 1 THEN 1 ELSE 0 END)
                   / CAST(COUNT(*) AS DOUBLE), 6) AS unique_frac,
             ROUND(MEDIAN(c.cfreq), 6) AS median_cfreq
      FROM ex JOIN c USING (bigram) GROUP BY ex.doc_id ORDER BY ex.doc_id"""))

  /** Compression-ratio quality signal — the classic cheap detector of
    * repetitive/templated/low-entropy text (boilerplate compresses far
    * better than natural prose; a near-zero ratio flags machine-
    * generated spam, a near-1.0 ratio flags binary junk). Runs zlib
    * (java.util.zip.Deflater, fixed level + strategy → deterministic
    * output length) over typed PARTITION batches with one reused
    * Deflater per partition — the same native-resource-amortization
    * shape as a real codec (cf. mm2); at 100 TB this is a linear scan
    * whose only shuffle is the final tiny ORDER BY. Rows-only (DuckDB
    * has no zlib surface); pinned. */
  val tCompression = QueryDef(
    "t11_compression_ratio",
    (s, dir) => {
      import s.implicits._
      val ds = Tables.documents(s, dir)
        .select(col("doc_id"), col("text")).as[(Long, String)]
      ds.mapPartitions { batch =>
        val buf = new Array[Byte](1 << 16)
        val d = new java.util.zip.Deflater(6, false)
        // release the native zlib state even when the iterator is
        // abandoned mid-partition (limit/take, task kill) — exhaustion
        // alone never fires in those paths; end() is idempotent
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit](_ => d.end())
        new Iterator[(Long, Long, Long, Double)] {
          def hasNext: Boolean = {
            val h = batch.hasNext
            if (!h) d.end() // idempotent; releases native state on exhaustion
            h
          }
          def next(): (Long, Long, Long, Double) = {
            val (id, text) = batch.next()
            val bytes = text.getBytes("UTF-8")
            d.reset() // same level+strategy → byte-identical output
            d.setInput(bytes); d.finish()
            var clen = 0L
            while (!d.finished()) clen += d.deflate(buf)
            (id, bytes.length.toLong, clen,
              if (bytes.length > 0) clen.toDouble / bytes.length else 1.0)
          }
        }
      }.toDF("doc_id", "n_bytes", "n_compressed", "ratio")
        .select(col("doc_id"), col("n_bytes"), col("n_compressed"),
          round(col("ratio"), 6).as("compression_ratio"))
        .orderBy("doc_id")
    })

  /** Fixed-size token chunking with overlap — the context-window prep
    * op of a pretraining pipeline: every document is cut into 64-token
    * chunks on a 48-token stride (16-token overlap so no boundary
    * context is lost), the last chunk ragged. Chunking STOPS once a
    * chunk reaches the document end (last start = ceil((n-64)/48),
    * never floor((n-1)/48)) — the naive stride-while-tokens-remain
    * bound emits a final chunk fully contained in the previous one for
    * every n with n mod 48 in 1..16, i.e. pure duplicate training
    * data. Pure per-row explode of a tiny index sequence (the token
    * array is projected once, sliced per chunk) — no join, no
    * aggregation; the only shuffle is the final ORDER BY, so at 100 TB
    * this is a linear scan that parallelizes with the input splits. */
  val tChunks = QueryDef(
    "t12_doc_chunks",
    (s, dir) => {
      val C = 64; val S = 48
      Tables.documents(s, dir)
        .select(col("doc_id"), toks.as("tk"))
        .select(col("doc_id"), col("tk"),
          explode(sequence(lit(0),
            greatest(lit(0),
              ceil((size(col("tk")) - C) / lit(S.toDouble)).cast("int")))).as("chunk_id"))
        .select(
          col("doc_id"),
          col("chunk_id").cast("long").as("chunk_id"),
          size(slice(col("tk"), col("chunk_id") * S + 1, lit(C))).cast("long")
            .as("n_chunk_tokens"),
          array_join(slice(col("tk"), col("chunk_id") * S + 1, lit(C)), " ")
            .as("chunk_text"))
        .orderBy("doc_id", "chunk_id")
    },
    Some("""
      WITH b AS (
        SELECT doc_id, string_split(text, ' ') AS tk,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
        FROM documents),
      e AS (
        SELECT doc_id, tk,
               UNNEST(generate_series(0,
                 GREATEST(0, CAST(ceil((nt - 64) / 48.0) AS BIGINT)))) AS chunk_id
        FROM b)
      SELECT doc_id,
             CAST(chunk_id AS BIGINT) AS chunk_id,
             CAST(len(list_slice(tk, chunk_id * 48 + 1, chunk_id * 48 + 64)) AS BIGINT)
               AS n_chunk_tokens,
             array_to_string(list_slice(tk, chunk_id * 48 + 1, chunk_id * 48 + 64), ' ')
               AS chunk_text
      FROM e ORDER BY doc_id, chunk_id"""))

  /** Concat-and-split sequence packing — the GPT-style "pack documents
    * into fixed 128-token training sequences" layout: documents are
    * concatenated per source in doc_id order and split every 128
    * tokens, so each doc lands at a deterministic token offset and may
    * span several sequences (pack_first..pack_last). Integer math end
    * to end → exact oracle. The window partitions by source; at 100 TB
    * the partition key would be (source, ingest-shard) — packing is
    * per-shard in any real pipeline, which keeps every window partition
    * bounded — same semantics, narrower key. */
  /** Sequence length shared by t13 (packing) and t20 (pack audit). */
  private[graft] val packLen = 128

  /** The t13 packed frame over any documents-shaped input — ONE
    * definition shared by t13 and the spec-side corruption fixtures, so
    * the audited layout can never drift from the packing operator. */
  private[graft] def sequencePackFrame(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    sequencePackFrameBy(docs, size(toks).cast("long"))

  /** The packing layout under any token DENOMINATION: `nTokens` is the
    * per-doc count expression (whitespace `size(toks)` for t13;
    * `BpeStats` subword counts for t13b — trainer billing). The layout
    * math, window key, and audit contract are identical. */
  private[graft] def sequencePackFrameBy(docs: org.apache.spark.sql.DataFrame,
                                         nTokens: org.apache.spark.sql.Column)
      : org.apache.spark.sql.DataFrame = {
    val L = packLen
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs
      .select(col("doc_id"), col("source"), nTokens.as("n_tokens"))
      .withColumn("tok_offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("tok_offset"),
        floor(col("tok_offset") / L).cast("long").as("pack_first"),
        floor((col("tok_offset") + col("n_tokens") - 1) / L).cast("long").as("pack_last"))
  }

  /** Per-pack SFT loss-mask accounting — the artifact an instruction-
    * tuning trainer needs ON TOP of t13's layout: each document is a
    * (prompt, response) pair, prompt tokens are masked out of the loss,
    * and after concat-and-split packing the trainer bills by LOSS
    * tokens per 128-token sequence, not total tokens. A pack whose
    * span is entirely prompt (loss_tokens = 0) is wasted forward-pass
    * compute — the quantity SFT packers drop or rebalance on, surfaced
    * here as `zero_loss`.
    *
    * The prompt/response boundary is a PARAMETER (`nPrompt`, a column
    * over the base frame's `n_tokens`): real SFT corpora carry explicit
    * role fields; the t25 QueryDef synthesizes ⌈n/4⌉ (the corpus has no
    * role column) — the ACCOUNTING is the operator, the boundary rule
    * is one expression a caller swaps for their role-derived count.
    *
    * Shape: t13's source-keyed offset window (same 100 TB key-widening
    * note), then each doc explodes over ONLY the packs it spans
    * (⌈n/L⌉+1 rows per doc — bounded by doc length, never corpus²) and
    * integer interval intersection splits its token and loss spans per
    * pack; the (source, pack_id) aggregate has map-side partials and
    * |packs| output rows. Integer math end to end → exact oracle.
    */
  private[graft] def sftMaskPackBy(docs: org.apache.spark.sql.DataFrame,
                                   nTokens: org.apache.spark.sql.Column,
                                   nPrompt: org.apache.spark.sql.Column)
      : org.apache.spark.sql.DataFrame = {
    val L = packLen
    val d = sequencePackFrameBy(docs, nTokens)
      .filter(col("n_tokens") > 0) // a 0-count doc spans no pack
      .withColumn("loss_start", col("tok_offset") + nPrompt)
      .withColumn("doc_end", col("tok_offset") + col("n_tokens"))
    d.select(col("source"), col("tok_offset"), col("doc_end"), col("loss_start"),
        explode(sequence(col("pack_first"), col("pack_last"))).as("pack_id"))
      .select(col("source"), col("pack_id"),
        (least(col("doc_end"), (col("pack_id") + 1) * L) -
          greatest(col("tok_offset"), col("pack_id") * L)).as("toks_in"),
        greatest(lit(0L),
          least(col("doc_end"), (col("pack_id") + 1) * L) -
            greatest(col("loss_start"), col("pack_id") * L)).as("loss_in"))
      .groupBy("source", "pack_id")
      .agg(
        sum("toks_in").as("pack_tokens"),
        sum("loss_in").as("loss_tokens"),
        count(lit(1)).as("n_docs"),
        (sum("loss_in") === 0L).as("zero_loss"))
      .orderBy("source", "pack_id")
  }

  val tSftMaskPack = QueryDef(
    "t25_sft_mask_pack",
    (s, dir) => sftMaskPackBy(Tables.documents(s, dir),
      size(toks).cast("long"),
      floor((col("n_tokens") + lit(3)) / lit(4)).cast("long")),
    Some("""
      WITH b AS (
        SELECT doc_id, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        FROM documents),
      o AS (
        SELECT doc_id, source, n,
               CAST(COALESCE(SUM(n) OVER (PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                 AS off
        FROM b),
      d AS (
        SELECT *, off + (n + 3) // 4 AS loss_start, off + n AS doc_end
        FROM o WHERE n > 0),
      e AS (
        SELECT source, off, doc_end, loss_start,
               UNNEST(generate_series(off // 128, (off + n - 1) // 128)) AS pack_id
        FROM d),
      per AS (
        SELECT source, pack_id,
               LEAST(doc_end, (pack_id + 1) * 128) - GREATEST(off, pack_id * 128)
                 AS toks_in,
               GREATEST(0, LEAST(doc_end, (pack_id + 1) * 128)
                 - GREATEST(loss_start, pack_id * 128)) AS loss_in
        FROM e)
      SELECT source, CAST(pack_id AS BIGINT) AS pack_id,
             CAST(SUM(toks_in) AS BIGINT) AS pack_tokens,
             CAST(SUM(loss_in) AS BIGINT) AS loss_tokens,
             COUNT(*) AS n_docs, (SUM(loss_in) = 0) AS zero_loss
      FROM per GROUP BY source, pack_id ORDER BY source, pack_id"""))

  val tSequencePack = QueryDef(
    "t13_sequence_pack",
    (s, dir) => sequencePackFrame(Tables.documents(s, dir))
      .orderBy("source", "doc_id"),
    Some("""
      WITH b AS (
        SELECT doc_id, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents),
      o AS (
        SELECT doc_id, source, n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                 AS tok_offset
        FROM b)
      SELECT doc_id, source, n_tokens, tok_offset,
             CAST(FLOOR(tok_offset / 128.0) AS BIGINT) AS pack_first,
             CAST(FLOOR((tok_offset + n_tokens - 1) / 128.0) AS BIGINT) AS pack_last
      FROM o ORDER BY source, doc_id"""))

  /** Per-source distribution drift (t27) — the data-mix monitoring
    * audit a corpus-assembly dashboard runs per snapshot: the KL
    * divergence of each source's smoothed unigram distribution from
    * the whole-corpus distribution, KL(source ‖ corpus) =
    * Σ_w p_s(w)·ln(p_s(w)/p_c(w)) with add-α smoothing (α=0.5) over
    * the shared corpus vocabulary V — so a source missing a token
    * still contributes its smoothed floor mass, and KL is finite by
    * construction. A source whose token mix matches the corpus scores
    * ≈ 0; boilerplate-heavy or single-domain sources drift high — the
    * number mix-rebalancing jobs (c7/c14) alert on between snapshots.
    *
    * Scale shape: one tokenize scan → (source, w) count aggregate with
    * map-side partials (the same shape as c14's staged counts); the
    * corpus-wide (w, cnt) vocab table derives from it by a second
    * token-keyed aggregate. The per-source KL must sum over the FULL
    * vocab (smoothing gives unseen tokens mass), so the vocab table
    * cross-joins the |sources|-row totals frame (broadcast) and
    * left-joins the (source, w) counts — the grid is |sources|·V rows,
    * token-keyed and map-side-partial-aggregated down to |sources|
    * output rows; at web scale that is a vocab-sized join per source,
    * never a corpus-sized one. Determinism: per-term contribution
    * rounded at 8 (terms are tiny — p·ln ratio ≪ 1), decimal-summed,
    * final KL rounded at 4 (the t14/t24 discipline).
    *
    * EAGER-WORK CAVEAT (the lshAnn note): the N/V probe is one Spark
    * job at construction time over the staged vocab table — construct
    * once and reuse the returned frame when composing.
    */
  private[graft] def klDriftOf(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
      val alpha = 0.5
      val sw = QueryDef.spread(
          docs.select(col("source"), explode(toks).as("w")))
        .filter(col("w") =!= "")
        .groupBy("source", "w").agg(count(lit(1)).as("c_sw"))
        .staged
      val vocab = sw.groupBy("w").agg(sum("c_sw").as("c_w")).staged
      val totals = sw.groupBy("source").agg(sum("c_sw").as("n_s")).staged
      val grand = vocab.agg(sum("c_w"), count(lit(1))).head
      // loud beats a bare NPE on an empty / all-whitespace corpus (the
      // c14/t24 empty-fit discipline)
      require(!grand.isNullAt(0),
        "t27_kl_drift: corpus has no tokens — cannot fit the unigram LMs")
      val n = grand.getLong(0).toDouble
      val v = grand.getLong(1).toDouble
      val ps = (coalesce(col("c_sw"), lit(0L)) + alpha) /
        (col("n_s") + alpha * v)
      val pc = (col("c_w") + alpha) / (n + alpha * v)
      vocab.crossJoin(broadcast(totals))
        .join(sw, Seq("source", "w"), "left")
        .select(col("source"), col("n_s"),
          round(ps * log(ps / pc), 8).as("term"))
        .groupBy("source")
        .agg(max(col("n_s")).as("n_tokens"),
          round(QueryDef.dsum(col("term"), 8).cast("double"), 4).as("kl_nats"))
        .select(col("source"), col("n_tokens"), col("kl_nats"))
        .orderBy("source")
  }

  val tKlDrift = QueryDef(
    "t27_kl_drift",
    (s, dir) => klDriftOf(Tables.documents(s, dir)),
    Some("""
      WITH sw AS (
        SELECT source, w, COUNT(*) AS c_sw
        FROM (SELECT source, UNNEST(string_split(text, ' ')) AS w FROM documents)
        WHERE w <> '' GROUP BY source, w),
      vocab AS (SELECT w, SUM(c_sw) AS c_w FROM sw GROUP BY w),
      totals AS (SELECT source, SUM(c_sw) AS n_s FROM sw GROUP BY source),
      g AS (SELECT CAST(SUM(c_w) AS DOUBLE) AS n,
                   CAST(COUNT(*) AS DOUBLE) AS v FROM vocab),
      terms AS (
        SELECT t.source, t.n_s,
               ROUND(((COALESCE(sw.c_sw, 0) + 0.5) / (t.n_s + 0.5 * g.v)) *
                 ln(((COALESCE(sw.c_sw, 0) + 0.5) / (t.n_s + 0.5 * g.v)) /
                    ((vocab.c_w + 0.5) / (g.n + 0.5 * g.v))), 8) AS term
        FROM vocab CROSS JOIN totals t CROSS JOIN g
             LEFT JOIN sw ON sw.source = t.source AND sw.w = vocab.w)
      SELECT source, CAST(MAX(n_s) AS BIGINT) AS n_tokens,
             ROUND(CAST(SUM(CAST(term AS DECIMAL(30,8))) AS DOUBLE), 4) + 0.0 AS kl_nats
      FROM terms GROUP BY source ORDER BY source"""))

  /** Vocabulary-growth (Heaps-law) audit (t28) — the corpus-health
    * check dedup and diversity reports run: how does the DISTINCT
    * token count grow as the corpus grows? A healthy raw corpus grows
    * ~n^β (β ≈ 0.5–0.7, Heaps' law); a flat curve means boilerplate
    * saturation, a near-linear one means garbled/unique-id noise —
    * both argue for a cleaning pass before training. Corpus prefixes
    * are CONTENT-KEYED (md5(doc_id‖':t28') first octet < threshold at
    * 1/8, 1/4, 1/2, 1), not positional — so the curve is layout- and
    * increment-stable, the c1 sampling discipline.
    *
    * Scale shape: the naive form runs count(distinct) once per prefix
    * — four corpus-wide distinct shuffles. This runs ONE: per token w,
    * one (w)-keyed aggregate computes min(bucket(doc)) over w's docs;
    * w is distinct-at-prefix-p iff that min clears p's threshold, so
    * all four distinct counts are conditional sums over the SAME
    * vocab-sized frame. Doc/token totals per prefix are map-side
    * conditional sums over the doc scan. Output: 4 rows.
    */
  private[graft] def vocabGrowthOf(docsIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
      val cuts = Seq(("p125", "20"), ("p250", "40"), ("p500", "80"),
        ("p1000", "zz")) // 'zz' > every hex octet → the full corpus
      val bucket = substring(
        md5(concat(col("doc_id").cast("string"), lit(":t28"))), 1, 2)
      val docs = QueryDef.spread(
          docsIn.select(col("doc_id"), toks.as("tk"), bucket.as("b")))
        .staged
      val docStats = docs.select(
        cuts.flatMap { case (lab, thr) => Seq(
          sum(when(col("b") < thr, 1L).otherwise(0L)).as(s"nd_$lab"),
          sum(when(col("b") < thr, size(col("tk")).cast("long"))
            .otherwise(0L)).as(s"nt_$lab"))
        }: _*)
      val minb = docs.select(explode(col("tk")).as("w"), col("b"))
        .filter(col("w") =!= "")
        .groupBy("w").agg(min("b").as("mb"))
        .select(cuts.map { case (lab, thr) =>
          sum(when(col("mb") < thr, 1L).otherwise(0L)).as(s"dv_$lab")
        }: _*)
      // unpivot via ONE explode so the two aggregates execute once,
      // not once per prefix row
      docStats.crossJoin(minb)
        .select(explode(array(cuts.map { case (lab, _) =>
          struct(lit(lab).as("prefix"),
            col(s"nd_$lab").as("n_docs"), col(s"nt_$lab").as("n_tokens"),
            col(s"dv_$lab").as("distinct_tokens"))
        }: _*)).as("r"))
        .select(col("r.prefix"), col("r.n_docs"), col("r.n_tokens"),
          col("r.distinct_tokens"))
        .orderBy("prefix")
  }

  val tVocabGrowth = QueryDef(
    "t28_vocab_growth",
    (s, dir) => vocabGrowthOf(Tables.documents(s, dir)),
    Some("""
      WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS tk,
               substring(md5(CAST(doc_id AS VARCHAR) || ':t28'), 1, 2) AS b
        FROM documents),
      cuts AS (
        SELECT * FROM (VALUES ('p125', '20'), ('p250', '40'),
                              ('p500', '80'), ('p1000', 'zz')) AS t(prefix, thr)),
      ds AS (
        SELECT prefix,
               SUM(CASE WHEN b < thr THEN 1 ELSE 0 END) AS n_docs,
               SUM(CASE WHEN b < thr THEN len(tk) ELSE 0 END) AS n_tokens
        FROM d CROSS JOIN cuts GROUP BY prefix),
      mb AS (
        SELECT w, MIN(b) AS mb
        FROM (SELECT UNNEST(tk) AS w, b FROM d) WHERE w <> '' GROUP BY w),
      dv AS (
        SELECT prefix, SUM(CASE WHEN mb < thr THEN 1 ELSE 0 END) AS dvc
        FROM mb CROSS JOIN cuts GROUP BY prefix)
      SELECT ds.prefix, CAST(ds.n_docs AS BIGINT) AS n_docs,
             CAST(ds.n_tokens AS BIGINT) AS n_tokens,
             CAST(dv.dvc AS BIGINT) AS distinct_tokens
      FROM ds JOIN dv USING (prefix) ORDER BY prefix"""))

  /** Corpus bigram language-model scoring (the CCNet-style LM quality
    * filter): an add-α smoothed bigram model (α=0.5) is fit on the
    * corpus itself and every document is scored by its mean bigram
    * log-likelihood — low scores flag boilerplate/garbled text. Docs
    * with fewer than 2 tokens have no bigrams and drop out (same in
    * the oracle).
    *
    * Scale shape: both count tables are token-keyed aggregations with
    * full map-side partial aggregation (vocabulary ≪ corpus by Heaps'
    * law), so their shuffles carry counts, not token instances. The
    * scoring join keys the document bigram stream by (w1,w2) against
    * the probability table — distinct-bigram-sized, the broadcast
    * candidate at scale (AQE picks broadcast when it fits, else both
    * sides hash-partition on the bigram key); the final per-doc mean
    * partial-aggregates before its doc_id shuffle. The token frame is
    * staged once and feeds all three consumers (unigrams, bigrams,
    * scoring) — one tokenization pass, and no Generate-filter
    * re-derivation of the split (SCALE.md expression-plan trap #1).
    * Determinism: per-bigram log-prob rounded at 6 then decimal-summed
    * (order-independent), mean rounded at 4.
    */
  val tNgramLm = QueryDef(
    "t14_ngram_lm",
    (s, dir) => {
      val alpha = 0.5
      val docs = QueryDef.spread(
          Tables.documents(s, dir).select(col("doc_id"), toks.as("tk")))
        .staged
      val uni = docs
        .select(explode(col("tk")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c1"))
      val vocab = uni.agg(count(lit(1)).as("v"))
      val bigrams = docs
        .select(col("doc_id"),
          explode(zip_with(
            slice(col("tk"), lit(1), size(col("tk")) - 1),
            slice(col("tk"), lit(2), size(col("tk")) - 1),
            (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
        .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
        .staged
      val cb = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      val probs = cb
        .join(uni, cb("w1") === uni("w"))
        .crossJoin(broadcast(vocab))
        .select(col("w1"), col("w2"),
          round(log((col("c2") + alpha) / (col("c1") + col("v") * alpha)), 6)
            .as("logp"))
      bigrams
        .join(probs, Seq("w1", "w2"))
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_bigrams"),
          round(QueryDef.dsum(col("logp"), 6).cast("double") / count(lit(1)), 4)
            .as("avg_logp"))
        .orderBy("doc_id")
    },
    Some("""
      WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      pos AS (SELECT doc_id, t, UNNEST(range(1, len(t))) AS i FROM tk),
      bg AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2 FROM pos),
      uni AS (SELECT w, COUNT(*) AS c1
              FROM (SELECT UNNEST(t) AS w FROM tk) GROUP BY w),
      cb AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY w1, w2),
      v AS (SELECT COUNT(*) AS v FROM uni),
      pr AS (SELECT cb.w1, cb.w2,
                    ROUND(ln((c2 + 0.5) / (c1 + 0.5 * v.v)), 6) AS logp
             FROM cb JOIN uni ON cb.w1 = uni.w CROSS JOIN v)
      SELECT bg.doc_id,
             COUNT(*) AS n_bigrams,
             ROUND(CAST(SUM(CAST(logp AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*), 4)
               + 0.0 AS avg_logp
      FROM bg JOIN pr ON bg.w1 = pr.w1 AND bg.w2 = pr.w2
      GROUP BY bg.doc_id ORDER BY doc_id"""))

  /** Reference-LM perplexity gate (the CCNet head/middle/tail split,
    * Wenzek et al. 2020 §4.3): fit the add-α bigram LM on a REFERENCE
    * quality slice only (here `lang = 'en'`, standing in for CCNet's
    * curated per-language Wikipedia corpus), score EVERY document
    * against it, and bucket the corpus into head/middle/tail at the
    * tercile cutoffs of the score distribution. Distinct from t14
    * (self-fit, no OOV possible): a reference model must handle
    * unseen events, so scoring backs off —
    *   - (w1, w2) both modeled:   ln((c2 + α) / (c1 + αV))
    *   - w1 modeled, pair unseen: ln(α / (c1 + αV))   (c2 = 0)
    *   - w1 out of vocabulary:    ln(1 / V)           (uniform)
    * Docs with < 2 tokens have no bigrams and drop out (as in t14).
    *
    * Bucketing is by VALUE cutoffs, not a global ntile: per-doc scores
    * aggregate to (avg_logp → doc count) bins, the driver walks the
    * bins best-first to the ranks ⌈n/3⌉ and ⌈2n/3⌉, and bucket
    * assignment is a map-side comparison against the two cut values —
    * exactly how production CCNet applies percentile cutoffs, and ties
    * at a cutoff all land in the better bucket on both engines (so a
    * degenerate template corpus can legitimately have an empty middle).
    * Bin count is bounded by the round-4 value grid over the score
    * range (ln-scale, ≈ [-25, 0] → ≤ ~250k bins), not by corpus size —
    * the same driver-size argument as c5's quality bins; no
    * unpartitioned window anywhere.
    *
    * Scale shape: the reference LM is two token-keyed count
    * aggregations over the REF SLICE only (map-side partials, vocab ≪
    * corpus); scoring left-joins the all-docs bigram stream by (w1,w2)
    * then by w1 — both reference tables are distinct-token-sized
    * broadcast candidates (AQE decides; else hash on the token key).
    * The bigram stream is staged once and feeds the ref-count branch
    * and the scoring branch (one tokenization pass); V is one count on
    * the staged unigram table. Determinism: per-bigram logp rounded at
    * 6, decimal-summed, mean rounded at 4 (t14's discipline).
    */
  private[graft] def perplexityGateOf(docs0: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val alpha = 0.5
    val docs = QueryDef.spread(
        docs0.select(col("doc_id"), col("lang"), toks.as("tk")))
      .staged
    val bigrams = docs
      .select(col("doc_id"), col("lang"),
        explode(zip_with(
          slice(col("tk"), lit(1), size(col("tk")) - 1),
          slice(col("tk"), lit(2), size(col("tk")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("doc_id"), col("lang"),
        col("p.w1").as("w1"), col("p.w2").as("w2"))
      .staged
    val uniRef = docs.filter(col("lang") === "en")
      .select(explode(col("tk")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c1"))
      .staged // feeds the vocab count AND the scoring join
    val v = uniRef.count().toDouble
    // Loud beats lossy (the Tables.documentsJsonl discipline): with an
    // empty reference slice every token is OOV and ln(1/V) is ln(1/0) —
    // scoring against a model that was never fit must abort, not emit
    // an all-Infinity column that flows into the cutoff walk.
    require(v > 0,
      "t24_perplexity_gate: reference slice (lang = 'en') is empty — " +
        "cannot fit the reference LM")
    val cbRef = bigrams.filter(col("lang") === "en")
      .groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val scored = bigrams
      .join(cbRef, Seq("w1", "w2"), "left")
      .join(uniRef, Seq("w1"), "left")
      .select(col("doc_id"),
        round(
          when(col("c1").isNull, log(lit(1.0) / v))
            .otherwise(log(
              (coalesce(col("c2"), lit(0L)) + alpha) /
                (col("c1") + alpha * v))), 6).as("logp"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(QueryDef.dsum(col("logp"), 6).cast("double") / count(lit(1)), 4)
          .as("avg_logp"))
      .staged
    val bins = scored.groupBy("avg_logp").agg(count(lit(1)).as("c"))
      .collect() // ≤ value-grid bins (see scaladoc), never corpus-sized
      .map(r => (r.getDouble(0), r.getLong(1)))
      .sortBy(-_._1) // best (highest likelihood) first
    val total = bins.map(_._2).sum
    def cutAtRank(k: Long): Double = {
      var cum = 0L
      val it = bins.iterator
      var cut = Double.NegativeInfinity
      while (cum < k && it.hasNext) { val (value, c) = it.next(); cum += c; cut = value }
      cut
    }
    val cut1 = cutAtRank((total + 2) / 3)      // ⌈n/3⌉
    val cut2 = cutAtRank((2 * total + 2) / 3)  // ⌈2n/3⌉
    scored
      .select(col("doc_id"), col("n_bigrams"), col("avg_logp"),
        when(col("avg_logp") >= cut1, "head")
          .when(col("avg_logp") >= cut2, "middle")
          .otherwise("tail").as("bucket"))
      .orderBy("doc_id")
  }

  val tPerplexityGate = QueryDef(
    "t24_perplexity_gate",
    (s, dir) => perplexityGateOf(Tables.documents(s, dir)),
    Some("""
      WITH tk AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
      pos AS (SELECT doc_id, lang, t, UNNEST(range(1, len(t))) AS i FROM tk),
      bg AS (SELECT doc_id, lang, t[i] AS w1, t[i + 1] AS w2 FROM pos),
      uni AS (SELECT w, COUNT(*) AS c1
              FROM (SELECT UNNEST(t) AS w FROM tk WHERE lang = 'en') GROUP BY w),
      cb AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg WHERE lang = 'en' GROUP BY w1, w2),
      v AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM uni),
      sb AS (SELECT bg.doc_id,
                    ROUND(CASE WHEN uni.c1 IS NULL THEN ln(1.0 / v.v)
                               ELSE ln((COALESCE(cb.c2, 0) + 0.5) / (uni.c1 + 0.5 * v.v))
                          END, 6) AS logp
             FROM bg LEFT JOIN cb ON bg.w1 = cb.w1 AND bg.w2 = cb.w2
                     LEFT JOIN uni ON bg.w1 = uni.w
                     CROSS JOIN v),
      scored AS (SELECT doc_id, COUNT(*) AS n_bigrams,
                        ROUND(CAST(SUM(CAST(logp AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*), 4)
                          + 0.0 AS avg_logp
                 FROM sb GROUP BY doc_id),
      bins AS (SELECT avg_logp, COUNT(*) AS c FROM scored GROUP BY avg_logp),
      cum AS (SELECT avg_logp, SUM(c) OVER (ORDER BY avg_logp DESC) AS cum FROM bins),
      tot AS (SELECT COUNT(*) AS n FROM scored),
      cuts AS (SELECT
          (SELECT MAX(avg_logp) FROM cum, tot WHERE cum >= (n + 2) // 3) AS cut1,
          (SELECT MAX(avg_logp) FROM cum, tot WHERE cum >= (2 * n + 2) // 3) AS cut2)
      SELECT s.doc_id, s.n_bigrams, s.avg_logp,
             CASE WHEN s.avg_logp >= cut1 THEN 'head'
                  WHEN s.avg_logp >= cut2 THEN 'middle'
                  ELSE 'tail' END AS bucket
      FROM scored s CROSS JOIN cuts ORDER BY doc_id"""))

  /** Per-partition Misra-Gries summary of capacity m: emits the
    * surviving (token, residual estimate) keys. Deterministic for a
    * fixed partition content ORDER (we only use the key set, whose
    * guarantee is order-independent: any token with in-partition count
    * > n_p/(m+1) survives regardless of arrival order). Amortized O(1)
    * per token: every decrement cancels one prior increment.
    */
  private[graft] def misraGries(it: Iterator[String], m: Int): Iterator[String] = {
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    it.foreach { t =>
      counts.get(t) match {
        case Some(v) => counts.update(t, v + 1)
        case None if counts.size < m => counts.update(t, 1L)
        case None =>
          counts.mapValuesInPlace((_, v) => v - 1)
          counts.filterInPlace((_, v) => v > 0)
      }
    }
    counts.keysIterator
  }

  /** Exact heavy hitters (tokens with frequency > frac of all tokens)
    * via the two-pass sketch-then-confirm shape: pass 1 runs a
    * Misra-Gries summary of capacity m per partition and unions the
    * surviving keys — a token with global count > N/(m+1) must survive
    * in at least one partition (if it were dropped everywhere, its
    * count would be ≤ Σ_p n_p/(m+1) = N/(m+1)), so with frac ≥ 1/(m+1)
    * the union is a PROVEN candidate superset. Pass 2 broadcast-semi-
    * joins the token stream down to candidates and counts exactly.
    *
    * Why not just groupBy-count? Per-task hash state. A plain count
    * over a 100 TB corpus holds the full per-partition vocabulary
    * (100Ms of keys) in every map task; MG holds m entries per task.
    * The output is EXACT either way (the oracle is a plain
    * GROUP BY ... HAVING), which is the point: the sketch bounds
    * memory, not accuracy.
    *
    * The candidate union is ≤ P·m rows — bounded per TASK but NOT
    * globally: P is the map partition count, which grows with the
    * corpus (10⁵–10⁶ tasks at 100 TB × m=1024 ⇒ up to 10⁸+ distinct
    * strings), so broadcasting it unconditionally is the one plan here
    * that dies at the scale the operator advertises. The confirm join
    * therefore goes through the measured guard: candidates are counted
    * (off the staged materialization — the MG pass runs once) and only
    * broadcast under `maxBroadcastCandidates`; above it the semi-join
    * falls back to a shuffle, which is still exact.
    */
  private[graft] def heavyHitters(
      docs: org.apache.spark.sql.DataFrame, frac: Double, m: Int,
      maxBroadcastCandidates: Long = 2000000L)
      : org.apache.spark.sql.DataFrame = {
    require(frac >= 1.0 / (m + 1),
      s"frac=$frac below the MG capacity guarantee 1/(m+1)=${1.0 / (m + 1)}")
    val s = docs.sparkSession
    import s.implicits._
    val tokens = QueryDef.spread(docs.select(toks.as("tk")))
      .select(explode(col("tk")).as("w")).as[String]
    val candidates = tokens.mapPartitions(it => misraGries(it, m))
      .toDF("w").distinct()
    val total = docs.agg(sum(size(toks)).cast("double").as("n"))
    tokens.toDF("w")
      .join(QueryDef.guardedBroadcast(candidates, maxBroadcastCandidates),
        Seq("w"), "left_semi")
      .groupBy("w").agg(count(lit(1)).as("n_tok"))
      .crossJoin(broadcast(total))
      .filter(col("n_tok") > col("n") * frac)
      .select(col("w").as("token"), col("n_tok"),
        round(col("n_tok") / col("n"), 6).as("frac"))
      .orderBy("token")
  }

  val tHeavyHitters = QueryDef(
    "t15_heavy_hitters",
    (s, dir) => heavyHitters(Tables.documents(s, dir), 0.002, 1024),
    Some("""
      WITH tok AS (SELECT UNNEST(string_split(text, ' ')) AS w FROM documents),
      n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM tok),
      c AS (SELECT w, COUNT(*) AS n_tok FROM tok GROUP BY w)
      SELECT w AS token, n_tok, ROUND(n_tok / n.n, 6) AS frac
      FROM c CROSS JOIN n WHERE n_tok > n.n * 0.002 ORDER BY token"""))

  /** BM25 ranked retrieval (t17) over a QUERY TABLE — the real
    * retrieval surface (a workload of queries scored in one pass, the
    * v1 probe-table shape), not a single hardcoded term set. Okapi
    * BM25 with Lucene's idf (ln((N−df+0.5)/(df+0.5)+1), always ≥ 0),
    * k1=1.2, b=0.75.
    *
    * `queries` is (query_id, term) postings. Scale shape: the corpus
    * postings explode is pruned to the workload's DISTINCT term union
    * BEFORE any shuffle (broadcast semi-join under the Generate — a
    * workload touching T terms scans T posting lists, not the corpus
    * vocabulary); tf/df are computed ONCE per (doc, term) and shared by
    * every query using that term; per-query ranking is a keyed window
    * (rank over query_id — never a corpus-wide single-partition sort);
    * the final ORDER BY touches ≤ |queries|·k result rows. Per-term
    * contributions are summed as DECIMAL(30,12) so scores are
    * addition-order-independent and the ranking cross-engine-exact
    * (QueryDef.dsum rationale). A query term absent from the corpus
    * contributes no rows (df would be 0); a query with NO term in the
    * corpus yields no result rows at all — both the t17 fixture's q4
    * covers. The term-union broadcast is a probe table (bounded by the
    * workload, not the corpus — v1's contract), so it is hinted
    * directly rather than measured. */
  private[graft] def bm25Search(
      docs: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame,
      k: Int = 10, k1: Double = 1.2, b: Double = 0.75)
      : org.apache.spark.sql.DataFrame = {
    val stats = docs.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (sum(size(toks)).cast("double") / count(lit(1))).as("avgdl"))
    val terms = queries.select(col("term").as("tok")).distinct()
    // dl rides the PRUNED postings (8 bytes on matching rows only) —
    // a separate (doc_id, dl) table would shuffle corpus-wide lengths
    // for docs that match no workload term
    val tf = docs.select(col("doc_id"), toks.as("tk"))
      .select(col("doc_id"), size(col("tk")).cast("double").as("dl"),
        explode(col("tk")).as("tok"))
      .join(broadcast(terms), Seq("tok"), "left_semi")
      .groupBy("doc_id", "dl", "tok").agg(count(lit(1)).cast("double").as("tf"))
    val df = tf.groupBy("tok").agg(count(lit(1)).cast("double").as("df"))
    val contrib = log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
      (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
      .orderBy(col("sc").desc, col("doc_id").asc)
    tf.join(broadcast(df), "tok").crossJoin(broadcast(stats))
      .withColumn("c", contrib.cast(org.apache.spark.sql.types.DecimalType(30, 12)))
      .join(broadcast(queries.select(col("query_id"), col("term").as("tok"))), "tok")
      .groupBy("query_id", "doc_id")
      .agg(sum(col("c")).as("sc"), count(lit(1)).as("n_terms"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"),
        round(col("sc").cast("double"), 6).as("bm25"),
        col("n_terms"), col("rank").cast("long").as("rank"))
      .orderBy("query_id", "rank")
  }

  /** The t17 fixture workload: a multi-term query, a stopword-heavy
    * one, an overlapping one (shares `spark` with q1 — the shared
    * (doc, term) tf/df work is computed once), and one whose second
    * term is absent from the corpus (zero-posting path). */
  private[graft] val bm25FixtureQueries: Seq[(Long, String)] = Seq(
    1L -> "spark", 1L -> "join", 1L -> "filter", 1L -> "window",
    2L -> "the", 2L -> "data",
    3L -> "query", 3L -> "stream", 3L -> "spark",
    4L -> "data", 4L -> "zzz_absent_term")

  val tBm25 = QueryDef(
    "t17_bm25_search",
    (s, dir) => {
      import s.implicits._
      bm25Search(Tables.documents(s, dir),
        bm25FixtureQueries.toDF("query_id", "term"))
    },
    Some("""
      WITH q(query_id, term) AS (VALUES
        (1, 'spark'), (1, 'join'), (1, 'filter'), (1, 'window'),
        (2, 'the'), (2, 'data'),
        (3, 'query'), (3, 'stream'), (3, 'spark'),
        (4, 'data'), (4, 'zzz_absent_term')),
      tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                    CAST(SUM(len(tk)) AS DOUBLE) / COUNT(*) AS avgdl FROM tk),
      dl AS (SELECT doc_id, CAST(len(tk) AS DOUBLE) AS dl FROM tk),
      tf AS (SELECT doc_id, u.t AS tok, CAST(COUNT(*) AS DOUBLE) AS tf
             FROM tk, UNNEST(tk.tk) AS u(t)
             WHERE u.t IN (SELECT DISTINCT term FROM q)
             GROUP BY doc_id, u.t),
      df AS (SELECT tok, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY tok),
      c AS (
        SELECT q.query_id, tf.doc_id,
               CAST(ln((st.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0) *
                    (tf.tf * 2.2) /
                    (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / st.avgdl))
                 AS DECIMAL(30,12)) AS c
        FROM tf JOIN df USING (tok) JOIN dl USING (doc_id)
             JOIN q ON q.term = tf.tok, st),
      sc AS (SELECT query_id, doc_id, SUM(c) AS sc, COUNT(*) AS n_terms
             FROM c GROUP BY query_id, doc_id),
      r AS (SELECT query_id, doc_id, sc, n_terms,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY sc DESC, doc_id ASC) AS rank
            FROM sc)
      SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
             ROUND(CAST(sc AS DOUBLE), 6) AS bm25, n_terms,
             CAST(rank AS BIGINT) AS rank
      FROM r WHERE rank <= 10 ORDER BY query_id, rank"""))

  /** Sequence-pack integrity audit (t20) — the release-governance
    * artifact for the PACKING stage, mirroring what p3's manifest does
    * for curation: before a packed corpus ships to a trainer, verify
    * from the packed table itself that the layout reconstructs the
    * canonical corpus exactly. Per source, three invariants:
    *  - offsets CONTIGUOUS: every doc's tok_offset equals the previous
    *    doc's offset + length (lag check; the first doc's lag defaults
    *    to 0, so a nonzero start is also a gap) — no token gap, no
    *    overlap, every token appears exactly once;
    *  - end_offset == total_tokens (the prefix-sum closes the books);
    *  - the stored pack_first/pack_last ids agree with the offsets
    *    (n_pack_errors — a corrupted pack-id column would feed the
    *    trainer the wrong sequence boundaries even with clean offsets).
    * Plus the shipping numbers: pack count and tail padding.
    *
    * Takes ANY packed frame (a materialized packed table in
    * production); the QueryDef audits t13's layout. Scale shape: one
    * lag window keyed by source and one aggregate on the SAME key —
    * the aggregate reuses the window's hash exchange, so the audit
    * costs a single source-keyed shuffle; output is |sources| rows.
    * (Offset arithmetic uses the same floor(double) form as t13 —
    * exact below 2⁵³ tokens/source, far above a 100 TB corpus.) */
  private[graft] def packAuditOf(packed: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val L = packLen
    val wl = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
    val expected =
      coalesce(lag(col("tok_offset") + col("n_tokens"), 1).over(wl), lit(0L))
    val packErr =
      col("pack_first") =!= floor(col("tok_offset") / L).cast("long") ||
        col("pack_last") =!=
          floor((col("tok_offset") + col("n_tokens") - 1) / L).cast("long")
    packed
      .withColumn("__gap", (col("tok_offset") =!= expected).cast("long"))
      .withColumn("__perr", packErr.cast("long"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        max(col("tok_offset") + col("n_tokens")).as("end_offset"),
        sum(col("__gap")).as("n_gaps"),
        sum(col("__perr")).as("n_pack_errors"),
        (max(col("pack_last")) + 1L).as("n_packs"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        col("end_offset"), col("n_gaps"), col("n_pack_errors"),
        (col("n_gaps") === 0 && col("end_offset") === col("total_tokens"))
          .as("contiguous"),
        col("n_packs"),
        (col("n_packs") * L - col("total_tokens")).as("pad_tokens"))
      .orderBy("source")
  }

  val tPackAudit = QueryDef(
    "t20_pack_audit",
    (s, dir) => packAuditOf(sequencePackFrame(Tables.documents(s, dir))),
    Some("""
      WITH b AS (
        SELECT doc_id, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents),
      o AS (
        SELECT doc_id, source, n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                 AS tok_offset
        FROM b),
      p AS (
        SELECT *,
               CAST(FLOOR(tok_offset / 128.0) AS BIGINT) AS pack_first,
               CAST(FLOOR((tok_offset + n_tokens - 1) / 128.0) AS BIGINT) AS pack_last
        FROM o),
      g AS (
        SELECT *,
               CASE WHEN tok_offset <> COALESCE(LAG(tok_offset + n_tokens)
                 OVER (PARTITION BY source ORDER BY doc_id), 0) THEN 1 ELSE 0 END AS gap,
               CASE WHEN pack_first <> CAST(FLOOR(tok_offset / 128.0) AS BIGINT)
                      OR pack_last <> CAST(FLOOR((tok_offset + n_tokens - 1) / 128.0) AS BIGINT)
                    THEN 1 ELSE 0 END AS perr
        FROM p)
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
             MAX(tok_offset + n_tokens) AS end_offset,
             CAST(SUM(gap) AS BIGINT) AS n_gaps,
             CAST(SUM(perr) AS BIGINT) AS n_pack_errors,
             (SUM(gap) = 0 AND MAX(tok_offset + n_tokens) = SUM(n_tokens)) AS contiguous,
             MAX(pack_last) + 1 AS n_packs,
             (MAX(pack_last) + 1) * 128 - CAST(SUM(n_tokens) AS BIGINT) AS pad_tokens
      FROM g GROUP BY source ORDER BY source"""))

  /** Pack-boundary span dedup (t21) — the span class t13's packing
    * CREATES and doc-level dedup cannot see: when documents are
    * concatenated into training sequences, the windows that STRADDLE a
    * doc boundary (tail of doc i ‖ head of doc i+1 in pack order) are
    * new content that exists only in the stream. Templated page chrome
    * (boilerplate headers/footers) makes the same straddling window
    * recur at thousands of boundaries — repeated training spans that
    * d7's per-doc windows (interior spans) never inspect. t21 hashes
    * every boundary window (k-token tail ‖ k-token head, k = 8) and
    * reports each window that occurs more than once, with its
    * occurrence count, source spread, and first position.
    *
    * Scale shape: head/tail k-token slices are projected MAP-SIDE
    * (the lag window carries 8-token arrays, never documents); the
    * only shuffles are the t13-keyed source window (same partitioning
    * as packing itself) and the hash-keyed duplicate aggregate with
    * map-side partials (output bounded by distinct duplicated windows,
    * not corpus size). At 100 TB the boundary stream is one row per
    * document — the cheapest possible full-coverage audit of what
    * packing concatenates. */
  private[graft] def packBoundarySpans(docs: org.apache.spark.sql.DataFrame,
                                       k: Int = 8)
      : org.apache.spark.sql.DataFrame = {
    val wl = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
    val head = array_join(slice(col("tk"), 1, k), " ")
    val tail = array_join(
      slice(col("tk"), greatest(lit(1), size(col("tk")) - (k - 1)), lit(k)), " ")
    docs
      .select(col("doc_id"), col("source"), toks.as("tk"))
      .select(col("doc_id"), col("source"), head.as("__h"), tail.as("__t"))
      .withColumn("__bw",
        concat(lag(col("__t"), 1).over(wl), lit(" "), col("__h")))
      .filter(col("__bw").isNotNull) // each source's first doc has no boundary
      .groupBy(md5(col("__bw")).as("window_hash"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("source")).as("n_sources"),
        min(col("doc_id")).as("min_doc_id"))
      .filter(col("n_occurrences") > 1)
      .orderBy("window_hash")
  }

  val tBoundarySpans = QueryDef(
    "t21_boundary_spans",
    (s, dir) => packBoundarySpans(
      // boundary boilerplate is QueryDef-only scaffolding — Scaffold
      Tables.documents(s, dir).withColumn("text", Scaffold.boundaryInjectedText)),
    Some("""
      WITH inj AS (
        SELECT doc_id, source,
               CASE WHEN doc_id % 7 = 0 THEN
                 CASE WHEN doc_id % 5 = 0
                      THEN 'hdrboiler1 hdrboiler2 hdrboiler3 hdrboiler4 hdrboiler5 hdrboiler6 hdrboiler7 hdrboiler8 ' || text
                      ELSE text END
                 || ' ftrboiler1 ftrboiler2 ftrboiler3 ftrboiler4 ftrboiler5 ftrboiler6 ftrboiler7 ftrboiler8'
               WHEN doc_id % 5 = 0 THEN
                 'hdrboiler1 hdrboiler2 hdrboiler3 hdrboiler4 hdrboiler5 hdrboiler6 hdrboiler7 hdrboiler8 ' || text
               ELSE text END AS text
        FROM documents),
      b AS (
        SELECT doc_id, source, string_split(text, ' ') AS tk FROM inj),
      ht AS (
        SELECT doc_id, source,
               array_to_string(list_slice(tk, 1, 8), ' ') AS h8,
               array_to_string(list_slice(tk, GREATEST(1, len(tk) - 7), len(tk)), ' ') AS t8
        FROM b),
      w AS (
        SELECT doc_id, source,
               LAG(t8) OVER (PARTITION BY source ORDER BY doc_id) || ' ' || h8 AS bw
        FROM ht),
      d AS (SELECT doc_id, source, md5(bw) AS h FROM w WHERE bw IS NOT NULL)
      SELECT h AS window_hash, COUNT(*) AS n_occurrences,
             COUNT(DISTINCT source) AS n_sources, MIN(doc_id) AS min_doc_id
      FROM d GROUP BY h HAVING COUNT(*) > 1 ORDER BY window_hash"""))

  // ---- t32: unicode normalization scrub (r18) --------------------------

  /** Encoding canonicalization — the FIRST stage of every real ingest
    * pipeline, run before any hash-keyed operator sees the bytes: a
    * combining-mark "café" and a precomposed "café" are byte-different
    * inputs to exact dedup, MinHash shingles, and every stored index
    * key while being the same text to every reader, and crawl text
    * arrives salted with control bytes, CRLF, and non-breaking spaces.
    *
    * Fixed pipeline order (stated identically in both engines, each
    * step on the output of the previous — the t18 progressive
    * discipline):
    *   1. NFC canonical composition (native kernel, ASCII fast path);
    *   2. strip C0 controls + DEL except \n and \t (`[\x00-\x08\x0B-
    *      \x1F\x7F]` — \r is 0x0D, so CRLF collapses to LF here);
    *   3. non-breaking space (U+00A0) → space;
    *   4. collapse runs of 2+ spaces;
    *   5. trim.
    *
    * Scale shape: pure per-row codegen'd work (the NFC kernel plus
    * literal-pattern regexes — compiled once per task) followed by ONE
    * source-keyed aggregate with map-side partials; the corpus is never
    * shuffled — the same cheapest-map-pass class as t23/t18. Per-row
    * rewrite correctness rides the oracle hash via the md5-prefix
    * digest of every cleaned text. Char counts are CODEPOINTS in both
    * engines (Spark `length` / DuckDB `len`), so the combining-mark
    * composition is visible in `chars_removed`. */
  private[graft] def normalizeScrub(df: org.apache.spark.sql.DataFrame,
                                    textCol: String = "text")
      : org.apache.spark.sql.DataFrame = {
    val t1 = graft.functions.NormalizeExpressions.nfcNormalize(col(textCol))
    val t2 = regexp_replace(t1, "[\\x00-\\x08\\x0B-\\x1F\\x7F]", "")
    val t3 = regexp_replace(t2, "\u00A0", " ")
    val t4 = regexp_replace(t3, " {2,}", " ")
    df.withColumn("cleaned", trim(t4))
  }

  /** Deterministic doc_id-derived mess injection (QueryDef-only
    * scaffolding, the t18 pattern — the driver corpus is clean ASCII,
    * which would make t32 vacuous). Residues mod 5: 0 → combining
    * acute (NFC composes), 1 → BEL control + trailing space, 2 → CRLF
    * + tail line, 3 → non-breaking spaces + doubled spaces, 4 → clean
    * passthrough. */
  private def messyText = {
    val r = col("doc_id") % 5
    when(r === 0, concat(col("text"), lit(" cafe"), lit("\u0301")))
      .when(r === 1, concat(col("text"), lit(" ping"), lit("\u0007"), lit(" ")))
      .when(r === 2, concat(col("text"), lit("\r\n"), lit("tail")))
      .when(r === 3, concat(col("text"), lit(" a"), lit("\u00A0\u00A0"), lit("b  c")))
      .otherwise(col("text"))
  }

  val tNormalizeScrub = QueryDef(
    "t32_normalize_scrub",
    (s, dir) => normalizeScrub(
      Tables.documents(s, dir).withColumn("text", messyText))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum((col("cleaned") =!= col("text")).cast("long")).as("docs_changed"),
        sum(length(col("text")).cast("long")).as("chars_before"),
        sum(length(col("cleaned")).cast("long")).as("chars_after"),
        sum(conv(substring(md5(col("cleaned")), 1, 10), 16, 10)
          .cast("long")).as("cleaned_digest"))
      .orderBy("source"),
    Some("""
      WITH inj AS (
        SELECT source,
               CASE WHEN doc_id % 5 = 0 THEN text || ' cafe' || chr(769)
                    WHEN doc_id % 5 = 1 THEN text || ' ping' || chr(7) || ' '
                    WHEN doc_id % 5 = 2 THEN text || chr(13) || chr(10) || 'tail'
                    WHEN doc_id % 5 = 3 THEN text || ' a' || chr(160) || chr(160) || 'b  c'
                    ELSE text END AS text
        FROM documents),
      sc AS (
        SELECT source, text,
               trim(regexp_replace(regexp_replace(regexp_replace(
                 nfc_normalize(text),
                 '[\x00-\x08\x0B-\x1F\x7F]', '', 'g'),
                 chr(160), ' ', 'g'),
                 ' {2,}', ' ', 'g')) AS cleaned
        FROM inj)
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(CASE WHEN cleaned <> text THEN 1 ELSE 0 END) AS BIGINT) AS docs_changed,
             CAST(SUM(len(text)) AS BIGINT) AS chars_before,
             CAST(SUM(len(cleaned)) AS BIGINT) AS chars_after,
             CAST(SUM(CAST(('0x' || substring(md5(cleaned), 1, 10)) AS BIGINT)) AS BIGINT) AS cleaned_digest
      FROM sc GROUP BY source ORDER BY source"""))

  // ---- t33: language-script consistency audit (r18) --------------------

  /** Script-consistency audit — the metadata-hygiene check between the
    * lang tag and what the BYTES say (mislabeled crawl records, mojibake,
    * wrong-language boilerplate under a correct tag are all caught by
    * "the dominant script disagrees with the tag's expected script"
    * before any model-based lang-id spends a forward pass): per doc,
    * codepoint counts for four letter scripts (ASCII Latin, Cyrillic,
    * Greek, Han), dominant = argmax with a FIXED precedence order on
    * ties (latin > cyrillic > greek > han — cross-engine deterministic),
    * expected = han for zh else latin, verdict = ok / script_mismatch.
    *
    * Scale shape: four literal-pattern regexp counts + the CASE chain —
    * a pure map-side codegen pass — then ONE aggregate keyed by
    * (lang, dominant, verdict), |langs|×4×2 rows max. The corpus is
    * never shuffled — the t23/t18/t32 cheapest-map-pass class. */
  private[graft] def scriptAuditOf(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val t = col("text")
    val nLatin = regexp_count(t, lit("[A-Za-z]")).cast("long")
    val nCyr = regexp_count(t, lit("[\\x{0400}-\\x{04FF}]")).cast("long")
    val nGreek = regexp_count(t, lit("[\\x{0370}-\\x{03FF}]")).cast("long")
    val nHan = regexp_count(t, lit("[\\x{4E00}-\\x{9FFF}]")).cast("long")
    val dominant =
      when(nLatin >= nCyr && nLatin >= nGreek && nLatin >= nHan, "latin")
        .when(nCyr >= nGreek && nCyr >= nHan, "cyrillic")
        .when(nGreek >= nHan, "greek")
        .otherwise("han")
    val expected = when(col("lang") === "zh", "han").otherwise("latin")
    docs
      .select(col("doc_id"), col("lang"),
        nLatin.as("n_latin"), nCyr.as("n_cyrillic"),
        nGreek.as("n_greek"), nHan.as("n_han"),
        dominant.as("dominant_script"),
        when(dominant =!= expected, "script_mismatch")
          .otherwise("ok").as("verdict"))
      .groupBy(col("lang"), col("dominant_script"), col("verdict"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_latin")).as("latin_chars"),
        sum(col("n_cyrillic")).as("cyrillic_chars"),
        sum(col("n_greek")).as("greek_chars"),
        sum(col("n_han")).as("han_chars"),
        min(col("doc_id")).as("min_doc_id"))
      .orderBy("lang", "dominant_script", "verdict")
  }

  val tScriptAudit = QueryDef(
    "t33_script_audit",
    (s, dir) => scriptAuditOf(
      Tables.documents(s, dir).withColumn("text", Scaffold.scriptedText)),
    Some("""
      WITH h1 AS (
        SELECT doc_id, lang, n_chars,
               CASE WHEN lang = 'zh' AND doc_id % 3 = 0
                    THEN text || ' ' || repeat(chr(27721) || chr(23383) || chr(25991) || chr(26412), n_chars)
                    ELSE text END AS text
        FROM documents),
      h2 AS (
        SELECT doc_id, lang,
               CASE WHEN doc_id % 7 = 0
                    THEN text || ' ' || repeat(chr(1090) || chr(1077) || chr(1082) || chr(1089) || chr(1090), n_chars)
                    ELSE text END AS text
        FROM h1),
      v AS (
        SELECT doc_id, lang,
               CASE WHEN doc_id % 11 = 0
                    THEN text || ' ' || chr(945) || chr(946) || chr(947) || chr(948) || chr(949)
                    ELSE text END AS text
        FROM h2),
      c AS (
        SELECT doc_id, lang,
               CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_latin,
               CAST(len(regexp_extract_all(text, '[\x{0400}-\x{04FF}]')) AS BIGINT) AS n_cyrillic,
               CAST(len(regexp_extract_all(text, '[\x{0370}-\x{03FF}]')) AS BIGINT) AS n_greek,
               CAST(len(regexp_extract_all(text, '[\x{4E00}-\x{9FFF}]')) AS BIGINT) AS n_han
        FROM v),
      d AS (
        SELECT *,
               CASE WHEN n_latin >= n_cyrillic AND n_latin >= n_greek AND n_latin >= n_han THEN 'latin'
                    WHEN n_cyrillic >= n_greek AND n_cyrillic >= n_han THEN 'cyrillic'
                    WHEN n_greek >= n_han THEN 'greek'
                    ELSE 'han' END AS dominant_script,
               CASE WHEN lang = 'zh' THEN 'han' ELSE 'latin' END AS expected
        FROM c)
      SELECT lang, dominant_script,
             CASE WHEN dominant_script <> expected THEN 'script_mismatch' ELSE 'ok' END AS verdict,
             COUNT(*) AS n_docs,
             CAST(SUM(n_latin) AS BIGINT) AS latin_chars,
             CAST(SUM(n_cyrillic) AS BIGINT) AS cyrillic_chars,
             CAST(SUM(n_greek) AS BIGINT) AS greek_chars,
             CAST(SUM(n_han) AS BIGINT) AS han_chars,
             MIN(doc_id) AS min_doc_id
      FROM d GROUP BY lang, dominant_script, verdict
      ORDER BY lang, dominant_script, verdict"""))

  val all: Seq[QueryDef] = Seq(tTokenStats, tQuality, tLangId, tFingerprint,
    tLangStats, tRepetition, tVocab, tTfidf, tQualityFilter, tBigramNovelty,
    tCompression, tChunks, tSequencePack, tNgramLm, tHeavyHitters, tBm25,
    tPackAudit, tBoundarySpans, tPerplexityGate, tSftMaskPack, tKlDrift,
    tVocabGrowth, tNormalizeScrub, tScriptAudit)
}
