package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{DedupQueries, VectorQueries}

/** Quality bounds for the approximate operators: LSH candidate
  * generation must stay close to the exact brute-force ground truth
  * (measured, not assumed — the single-table variant scored 0.01).
  */
class LshRecallSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("multi-table LSH ANN recall@3 >= 0.5 vs exact top-k") {
    val exact = VectorQueries.vCosineTopK.fn(spark, dir)
      .filter(org.apache.spark.sql.functions.col("rank") <= 3)
      .select("q", "nb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = VectorQueries.vLshAnn.fn(spark, dir)
      .select("q", "nb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"LSH ANN recall@3 = $recall")
  }

  test("IVF ANN recall@3 >= 0.5 vs exact top-k") {
    val exact = VectorQueries.vCosineTopK.fn(spark, dir)
      .filter(org.apache.spark.sql.functions.col("rank") <= 3)
      .select("q", "nb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = VectorQueries.vIvfAnn.fn(spark, dir)
      .select("q", "nb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF ANN recall@3 = $recall")
  }

  test("PQ ANN recall@3 >= 0.5 vs exact top-k") {
    val exact = VectorQueries.vCosineTopK.fn(spark, dir)
      .filter(org.apache.spark.sql.functions.col("rank") <= 3)
      .select("q", "nb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = VectorQueries.vPqAnn.fn(spark, dir)
      .select("q", "nb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"PQ ANN recall@3 = $recall")
  }

  test("minhash-LSH pairs are all true >= 0.5-Jaccard pairs (no false positives)") {
    val pairs = DedupQueries.dMinHash.fn(spark, dir).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getAs[Double]("jaccard") >= 0.5)
    }
  }
}
