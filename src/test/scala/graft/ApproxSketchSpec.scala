package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Error gates for the sketch-based aggregates (q29): the pin fixes
  * WHAT the sketches return; this spec proves the returned values are
  * CLOSE to the exact answers they replace at scale — HLL++ distinct
  * counts within 3× the configured 2% relative standard deviation, and
  * quantile-summary percentiles inside the exact percentile band
  * implied by their rank-error bound (±1/10000, asserted with a ±0.005
  * rank cushion). A sketch that drifts outside these gates is broken
  * even if it is deterministic.
  */
class ApproxSketchSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.01"

  test("q29 sketch aggregates land within their error bounds of the exact answers") {
    val got = SparkEntry.queries("q29_sketch_stats")(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val exact = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("orders"),
        countDistinct(col("l_partkey")).as("parts"),
        percentile(col("l_extendedprice"), lit(0.495)).as("p50_lo"),
        percentile(col("l_extendedprice"), lit(0.505)).as("p50_hi"),
        percentile(col("l_extendedprice"), lit(0.985)).as("p99_lo"),
        percentile(col("l_extendedprice"), lit(0.995)).as("p99_hi"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == exact.keySet && got.nonEmpty)
    for ((flag, e) <- exact) {
      val g = got(flag)
      def relErr(approx: Long, truth: Long): Double =
        math.abs(approx - truth).toDouble / truth
      val eo = relErr(g.getAs[Long]("approx_orders"), e.getAs[Long]("orders"))
      val ep = relErr(g.getAs[Long]("approx_parts"), e.getAs[Long]("parts"))
      assert(eo <= 0.06, s"$flag: HLL orderkey rel err $eo > 3×rsd")
      assert(ep <= 0.06, s"$flag: HLL partkey rel err $ep > 3×rsd")
      val p50 = g.getAs[Double]("approx_p50")
      assert(p50 >= e.getAs[Double]("p50_lo") && p50 <= e.getAs[Double]("p50_hi"),
        s"$flag: approx p50 $p50 outside exact rank band")
      val p99 = g.getAs[Double]("approx_p99")
      assert(p99 >= e.getAs[Double]("p99_lo") && p99 <= e.getAs[Double]("p99_hi"),
        s"$flag: approx p99 $p99 outside exact rank band")
    }
  }

  test("q30 merged quarterly sketches estimate exact distinct within 3×rsd (lgK=12)") {
    val got = SparkEntry.queries("q30_sketch_union")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getAs[Long]("approx_customers")).toMap
    val exact = Tables.orders(spark, dir)
      .groupBy(year(col("o_orderdate")).as("yr"),
        ((month(col("o_orderdate")) - 1) / 3).cast("int").+(1).as("qtr"))
      .agg(countDistinct(col("o_custkey")).as("customers"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got.keySet == exact.keySet && got.size >= 4,
      s"expected several quarters, got ${got.keySet}")
    for ((q, truth) <- exact) {
      val err = math.abs(got(q) - truth).toDouble / truth
      assert(err <= 0.05, s"$q: merged-sketch rel err $err > 3×rsd(lgK=12)")
    }
  }
}
