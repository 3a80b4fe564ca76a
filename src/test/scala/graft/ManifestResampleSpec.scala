package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{PipelineQueries, SampleQueries}

/** Semantics of the round-12 operators: the p3 curation manifest (the
  * per-document decision lineage behind p1) and the c7 temperature
  * resampler (computed-rate multilingual rebalancing).
  */
class ManifestResampleSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.01"

  test("p3 statuses partition the corpus and kept rows equal p1's audit") {
    val docs = graft.sources.Tables.documents(spark, dir)
    val manifest = PipelineQueries.pManifest.fn(spark, dir).cache()
    try {
      // every doc gets exactly one status, and only legal statuses occur
      assert(manifest.count() == docs.count())
      assert(manifest.select("doc_id").distinct().count() == docs.count())
      val legal = Set("dropped_duplicate", "held_out_eval", "dropped_quality",
        "dropped_contaminated", "kept_train", "kept_val", "kept_test")
      val got = manifest.select("status").distinct().collect().map(_.getString(0)).toSet
      assert(got.subsetOf(legal), s"illegal statuses: ${got -- legal}")

      // the kept rollup IS p1's audit (same stage definitions by
      // construction — this asserts the composition didn't drift)
      val keptRollup = manifest
        .filter(col("status").startsWith("kept_"))
        .groupBy(col("source"), regexp_replace(col("status"), "^kept_", "").as("split"))
        .agg(count(lit(1)).as("n_docs"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      val p1Audit = PipelineQueries.pCuration.fn(spark, dir)
        .select(col("source"), col("split"), col("n_docs"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(keptRollup == p1Audit)
    } finally manifest.unpersist()
  }

  test("p3 precedence: duplicate beats eval beats quality on a constructed corpus") {
    import spark.implicits._
    // long high-quality text passing all five t9 rules (30..1000 tokens,
    // mean word len 3..10, >=2 stopwords, no dominant token, low bigram rep)
    val good = (1 to 40).map(i => s"the word$i and term$i of item$i").mkString(" ")
    val good2 = (1 to 40).map(i => s"the name$i and part$i of unit$i").mkString(" ")
    val rows = Seq(
      (1L, good, "s", "en", good.length.toLong),        // canonical copy
      (2L, good, "s", "en", good.length.toLong),        // exact duplicate -> dropped_duplicate
      (37L, good2, "s", "en", good2.length.toLong),     // eval id (37|id) -> held_out_eval
      (74L, "short text", "s", "en", 10L),              // eval AND low-quality -> eval wins
      (3L, "tiny", "s", "en", 4L))                      // fails quality floor
    val df = rows.toDF("doc_id", "text", "source", "lang", "n_chars")
    val m = PipelineQueries.curationManifestOf(df)
      .collect().map(r => (r.getLong(0), r.getString(3))).toMap
    assert(m(2L) == "dropped_duplicate")
    assert(m(37L) == "held_out_eval")
    assert(m(74L) == "held_out_eval")
    assert(m(3L) == "dropped_quality")
    assert(m(1L).startsWith("kept_") || m(1L) == "dropped_contaminated")
  }

  test("p4 release write: manifest reproduces across rewrites and layouts, and matches the logical frame") {
    import graft.sources.ReleaseWriter
    val released = PipelineQueries.releasedDocs(spark, dir)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSeq
    val logical = rows(ReleaseWriter.manifestOf(released))
    assert(logical.nonEmpty, "empty release — test is vacuous")

    val out = java.nio.file.Files.createTempDirectory("graft_rel_spec").toString + "/rel"
    val first = rows(ReleaseWriter.writeRelease(released, out))
    // the manifest comes from the WRITTEN files and equals the logical frame
    assert(first == logical)
    // a rewrite reproduces it bit-for-bit
    assert(rows(ReleaseWriter.writeRelease(released, out)) == first)
    // and an adversarial input layout cannot change it (content-keyed
    // buckets, order-invariant digest)
    assert(rows(ReleaseWriter.writeRelease(
      released.repartition(13), out, nRangeFiles = 2)) == first)
    // a corrupted release (one doc dropped) is CAUGHT by the manifest
    val tampered = ReleaseWriter.manifestOf(
      released.filter(col("doc_id") =!= released.select(min("doc_id"))
        .head().getLong(0)))
    assert(rows(tampered) != first, "manifest failed to detect a dropped row")
  }

  test("p5 dataset card agrees with p1's audit and covers every released doc") {
    val card = PipelineQueries.pReleaseReport.fn(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val audit = PipelineQueries.pCuration.fn(spark, dir)
      .groupBy("split").agg(sum("n_docs").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(card == audit, s"card split counts $card != audit $audit")
    assert(card.values.sum > 0, "empty release — test is vacuous")
  }

  test("c7 temperature-flattens the language mix and is layout-invariant") {
    val docs = graft.sources.Tables.documents(spark, dir)
    val natural = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val kept = SampleQueries.cMixResample.fn(spark, dir).cache()
    try {
      val keptN = kept.groupBy("lang").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val total = natural.values.sum.toDouble
      val keptTotal = keptN.values.sum.toDouble
      // direction: the head language's share must SHRINK, the rarest
      // language's share must GROW (tau = 0.5 flattening)
      val head = natural.maxBy(_._2)._1
      val tail = natural.minBy(_._2)._1
      assert(keptN(head) / keptTotal < natural(head) / total,
        s"head lang $head share did not shrink")
      assert(keptN(tail) / keptTotal > natural(tail) / total,
        s"tail lang $tail share did not grow")
      // realized counts track the tau-weighted targets within binomial
      // noise (4 sigma)
      val z = natural.values.map(n => math.sqrt(n.toDouble)).sum
      val t = math.floor(total / 2)
      natural.foreach { case (l, n) =>
        val rate = math.min(1.0, math.sqrt(n.toDouble) / z * t / n)
        val sigma = math.sqrt(n * rate * (1 - rate))
        assert(math.abs(keptN(l) - n * rate) <= 4 * sigma + 1,
          s"$l kept ${keptN(l)} vs target ${n * rate}")
      }
      // determinism across partition layouts: membership is content-keyed
      val before = kept.select("doc_id").collect().map(_.getLong(0)).toSet
      val relaid = SampleQueries.cMixResample.fn(spark, dir)
        .repartition(13).select("doc_id").collect().map(_.getLong(0)).toSet
      assert(before == relaid)
    } finally kept.unpersist()
  }
}
