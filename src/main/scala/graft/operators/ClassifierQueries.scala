package graft.operators

import org.apache.spark.sql.functions._

import graft.plans.Stage.StageOps
import graft.sources.Tables
import graft.stats.{Design, Glm}

/** Model-based quality filtering (t16) — the distillation shape every
  * large-scale curation pipeline uses (fastText-style quality
  * classifiers are bootstrapped exactly this way: label a corpus slice
  * with a cheap rule, fit a smooth classifier on OTHER features, score
  * everything): weak labels come from the t2 rule filter
  * (quality ≥ 0.64), the model sees only the smooth features
  * (stop_ratio, type-token ratio, log length — NOT the rule's length
  * window), and the fitted model emits a per-document keep probability.
  *
  * Scale design: the feature pass is computed ONCE and staged — the
  * R-parity IRLS ([[graft.stats.Glm.logistic]]) then runs each
  * iteration as one distributed fused-Gramian pass over the staged
  * features (N+1 scans total for N updates), coefficients return to
  * the plan as literals, and scoring is a map-side codegen'd
  * expression. Nothing about the fit or the scoring holds per-row
  * state on the driver; a 100 TB corpus costs the same ~5 scans.
  *
  * Rows-only (IRLS has no SQL analogue); pinned, with the semantics
  * (learning actually happened, R-parity convergence, determinism)
  * gated in QualityClassifierSpec.
  */
object ClassifierQueries {

  /** doc_id, weak label y, and the three model features — one pass.
    * The label is THE t2 rule (shared TextQueries.qualityExpr ≥ 0.64)
    * and the ratio features are the rule's OWN sub-expressions
    * (TextQueries.stopRatio/typeTokenRatio), so neither the
    * distillation target nor the features can drift from the filter. */
  private[graft] def featureFrame(s: org.apache.spark.sql.SparkSession,
                                  dir: String): org.apache.spark.sql.DataFrame =
    QueryDef.spread(Tables.documents(s, dir))
      .select(col("doc_id"), col("n_chars"), split(col("text"), " ").as("tk"))
      .select(col("doc_id"),
        TextQueries.stopRatio(col("tk")).as("stop_ratio"),
        TextQueries.typeTokenRatio(col("tk")).as("ttr"),
        log(size(col("tk")).cast("double")).as("log_len"),
        when(TextQueries.qualityExpr(col("tk"), col("n_chars")) >= 0.64, 1.0)
          .otherwise(0.0).as("y"))
      .staged

  private[graft] val design: Design = Design(
    Design.intercept,
    ("stop_ratio", col("stop_ratio")),
    ("ttr", col("ttr")),
    ("log_len", col("log_len")))

  val tQualityClassifier = QueryDef(
    "t16_quality_classifier",
    (s, dir) => {
      val base = featureFrame(s, dir)
      val fit = Glm.logistic(base, design, col("y"))
      base.select(col("doc_id"), col("y").cast("long").as("label"),
          round(fit.predict(design), 6).as("p_keep"))
        .withColumn("keep", col("p_keep") >= 0.5)
        .orderBy("doc_id")
    })

  val all: Seq[QueryDef] = Seq(tQualityClassifier)
}
