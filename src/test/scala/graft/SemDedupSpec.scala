package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.VectorQueries

/** v8_semantic_dedup invariants (the pin only freezes bytes; this spec
  * checks the SEMANTICS): the dropped set equals an exact per-list
  * pairwise recomputation done driver-side, every keeper has a lower id
  * than its dropped vector, and the query is deterministic across runs.
  */
class SemDedupSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def run() = VectorQueries.vSemanticDedup.fn(spark, dir)
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))

  test("dropped set matches an exact driver-side recomputation") {
    val out = run()
    // recompute: same assignment (cluster ids taken FROM the query's own
    // list_id output is not enough — rebuild assignment independently
    // from the fitted quantizer by re-running the first stage), then
    // exact O(|list|²) pairwise per list driver-side.
    val emb = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    // lists must come from the query's quantizer; recover them by
    // asserting consistency instead: group vectors by the list the query
    // reports, plus vectors it kept (derive full assignment driver-side
    // via the same public first-stage the query uses)
    val tau = 0.4
    def cos(x: Array[Double], y: Array[Double]): Double =
      x.zip(y).map { case (a, b) => a * b }.sum
    // independent assignment: nearest of the same driver-fit centroids.
    // LocalKMeans is deterministic (fixed seed + deterministic sample),
    // so re-fitting reproduces the query's centers exactly.
    val sample = emb.filter(_._1 % math.max(1, emb.length / 1000) == 0)
      .take(2000).map(_._2)
    val centers = graft.operators.LocalKMeans.fit(sample, k = 16, iters = 10, seed = 42L)
    def listOf(v: Array[Double]): Int =
      centers.indices.minBy(i => centers(i).map(c => c * c).sum / 2.0 - cos(v, centers(i)))
    val byList = emb.groupBy { case (_, v) => listOf(v) }
    val expected = byList.values.flatMap { members =>
      val sorted = members.sortBy(_._1)
      sorted.flatMap { case (bId, bv) =>
        val keepers = sorted.filter { case (aId, av) => aId < bId && cos(av, bv) > tau }
        keepers.headOption.map { case (aId, av) =>
          // Spark round() is HALF_UP — mirror it exactly
          (bId, aId, BigDecimal(cos(av, bv))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      }
    }.toSeq.sortBy(_._1)
    assert(out.map(t => (t._1, t._2, t._3)).toSeq == expected)
    assert(out.nonEmpty, "τ=0.4 dropped nothing at sf0.001 — test is vacuous")
  }

  test("every keeper has a lower id and an above-threshold cosine") {
    val out = run()
    assert(out.forall { case (v, k, c, _) => k < v && c > 0.4 })
  }

  test("deterministic across two runs") {
    assert(run().toSeq == run().toSeq)
  }
}
