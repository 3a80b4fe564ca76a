package graft

/** Dev tool: regenerate the committed dataset-card byte samples
  * (results/dataset_card_sf001.md + .json) after a card change —
  *   Test/runMain graft.CardRegenMain
  * DatasetCardSpec pins the committed bytes against fresh renders. */
object CardRegenMain {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.DatasetCard.writeBoth(spark, "/root/testdata/sf0.01",
      "results/dataset_card_sf001.md", "results/dataset_card_sf001.json")
    println("card regenerated")
    spark.stop()
  }
}
