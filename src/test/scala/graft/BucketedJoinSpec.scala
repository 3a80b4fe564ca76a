package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located joins — the storage-layout lever for repeated
  * large-×-large joins at 100 TB: writing both sides bucketed by the
  * join key lets every subsequent join run with ZERO exchange (only an
  * in-partition sort), instead of shuffling both tables every query.
  * This pins that the engine's layout recipe actually eliminates the
  * exchanges.
  */
class BucketedJoinSpec extends AnyFunSuite {

  private lazy val spark = {
    val wh = java.nio.file.Files.createTempDirectory("graft_warehouse")
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", wh.toString)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  test("bucketed tables join with no exchange; unbucketed ones shuffle") {
    val dir = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))

    orders.write.mode("overwrite").bucketBy(4, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    lineitem.write.mode("overwrite").bucketBy(4, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_b")

    val bucketed = spark.table("orders_b").join(spark.table("lineitem_b"),
      col("o_orderkey") === col("l_orderkey"))
    val plain = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))

    val bPlan = bucketed.queryExecution.executedPlan.toString
    val pPlan = plain.queryExecution.executedPlan.toString
    assert(!bPlan.contains("Exchange"), "bucketed join should have no exchange\n" + bPlan.take(1500))
    assert(pPlan.contains("Exchange"), "control: unbucketed join must shuffle")
    // and the answers agree
    assert(bucketed.count() == plain.count())
  }
}
