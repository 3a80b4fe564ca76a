package graft

/** Dev tool: regenerate the committed dataset-card byte sample
  * (results/dataset_card_sf001.md) after a card change —
  *   Test/runMain graft.CardRegenMain
  * DatasetCardSpec pins the committed bytes against a fresh render. */
object CardRegenMain {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.DatasetCard.write(spark, "/root/testdata/sf0.01",
      "results/dataset_card_sf001.md")
    println("card regenerated")
    spark.stop()
  }
}
