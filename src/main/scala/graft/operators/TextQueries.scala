package graft.operators

import org.apache.spark.sql.functions._

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

  /** Quality scoring: stopword ratio, type-token ratio, length flags —
    * the length/punct/stopword-ratio family of pretraining filters. */
  val tQuality = QueryDef(
    "t2_quality_score",
    (s, dir) => {
      val stop = Seq("the", "a", "and", "of", "to", "in")
      val stopArr = array(stop.map(lit): _*)
      val nTok = size(toks).cast("double")
      val stopCnt = size(filter(toks, t => array_contains(stopArr, t))).cast("double")
      val ttr = size(array_distinct(toks)).cast("double") / nTok
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          round(stopCnt / nTok, 6).as("stop_ratio"),
          round(ttr, 6).as("type_token_ratio"),
          (col("n_chars") >= 100 && col("n_chars") <= 5000).as("length_ok"),
          round(
            when(col("n_chars") >= 100 && col("n_chars") <= 5000, 0.5).otherwise(0.0) +
            (stopCnt / nTok) * 0.25 + ttr * 0.25, 6).as("quality"))
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

  val all: Seq[QueryDef] = Seq(tTokenStats, tQuality, tLangId, tFingerprint, tLangStats)
}
