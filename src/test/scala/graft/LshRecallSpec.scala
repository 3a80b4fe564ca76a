package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{DedupQueries, VectorQueries}

/** Quality bounds for the approximate operators: LSH candidate
  * generation must stay close to the exact brute-force ground truth
  * (measured, not assumed — the single-table variant scored 0.01).
  * Gates are the MEASURED floors on the sf0.001 fixture (VERDICT r6 #4:
  * a 0.5 gate on everything hides regressions): multi-probe LSH 0.987
  * gates at 0.95; IVF 0.767 gates at 0.7; PQ exact-re-ranks a 128-deep
  * ADC shortlist (recall is shortlist-depth-bound: measured 0.65 at
  * depth 32, 0.96 at 128) and gates at 0.9; IVFADC 0.907 gates at 0.9.
  */
class LshRecallSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private lazy val exactTop3: Set[(Long, Long)] =
    VectorQueries.vCosineTopK.fn(spark, dir)
      .filter(org.apache.spark.sql.functions.col("rank") <= 3)
      .select("q", "nb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def recallOf(q: graft.operators.QueryDef): Double = {
    val approx = q.fn(spark, dir)
      .select("q", "nb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (exactTop3 & approx).size.toDouble / exactTop3.size
  }

  test("multi-table multi-probe LSH ANN recall@3 >= 0.95 vs exact top-k (measured 0.987)") {
    // 1-bit-flip multi-probe (Lv et al.) lifted the measured recall from
    // 0.72 (exact-bucket only) to 0.987 at the same table count
    val recall = recallOf(VectorQueries.vLshAnn)
    assert(recall >= 0.95, s"LSH ANN recall@3 = $recall")
  }

  test("IVF ANN recall@3 >= 0.7 vs exact top-k (measured 0.767)") {
    val recall = recallOf(VectorQueries.vIvfAnn)
    assert(recall >= 0.7, s"IVF ANN recall@3 = $recall")
  }

  test("PQ ANN recall@3 >= 0.9 vs exact top-k (128-deep exact re-rank, measured 0.96)") {
    val recall = recallOf(VectorQueries.vPqAnn)
    assert(recall >= 0.9, s"PQ ANN recall@3 = $recall")
  }

  test("IVFADC recall@3 >= 0.9 vs exact top-k (nprobe=4 of 5 coarse lists, measured 0.907)") {
    val recall = recallOf(VectorQueries.vIvfAdcAnn)
    assert(recall >= 0.9, s"IVFADC recall@3 = $recall")
  }

  test("minhash-LSH pairs are all true >= 0.5-Jaccard pairs (no false positives)") {
    val pairs = DedupQueries.dMinHash.fn(spark, dir).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getAs[Double]("jaccard") >= 0.5)
    }
  }
}
