package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Dev probe for the r19→r20 t31 watch item: decompose the v2 PII
  * scrub's wall time into its class passes on the same warm session
  * the bench uses —
  *   SPARK_GRAFT_SF_DIR=… Test/runMain graft.ProbeT31Parts
  * Output is PART lines (seconds, min of 3 after a warm pass). Each
  * stage aggregates a digest of its last derived column so the regex
  * work cannot be pruned away.
  */
object ProbeT31Parts {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(name: String)(body: => Unit): Unit = {
      body // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"PART $name min=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    import graft.operators.{PiiQueries, Scaffold}
    val docs = Tables.documents(spark, sfDir)
      .withColumn("text", Scaffold.injectedTextV2)

    def agg(df: org.apache.spark.sql.DataFrame, c: String): Unit =
      df.agg(sum(conv(substring(md5(col(c)), 1, 10), 16, 10).cast("long")))
        .collect()

    timed("t31_scan_inject_only") { agg(docs, "text") }
    val t1 = docs.withColumn("t1",
      regexp_replace(col("text"), PiiQueries.emailRe, "[EMAIL]"))
    timed("t31_plus_email") { agg(t1, "t1") }
    val t2 = t1.withColumn("t2",
      regexp_replace(col("t1"), PiiQueries.phoneRe, "[PHONE]"))
    timed("t31_plus_phone") { agg(t2, "t2") }
    val t3 = t2.withColumn("t3",
      regexp_replace(col("t2"), PiiQueries.ssnRe, "[SSN]"))
    timed("t31_plus_ssn") { agg(t3, "t3") }
    // card-stage internals: extraction scan vs window HOF vs fold
    val nCand = t3.withColumn("nc", size(regexp_extract_all(col("t3"),
      lit(graft.operators.PiiQueries.cardRe), lit(0))))
    timed("t31_card_extract_only") {
      nCand.agg(sum(col("nc"))).collect()
    }
    val withCards = graft.operators.PiiQueries.cardFoldForProbe(t3, "t3")
    timed("t31_plus_cards") { agg(withCards, "t4") }
    val t5 = withCards.withColumn("t5",
      regexp_replace(col("t4"), PiiQueries.ipv6Re, "[IPV6]"))
    timed("t31_plus_ipv6") { agg(t5, "t5") }
    val t6 = t5.withColumn("t6",
      regexp_replace(col("t5"), PiiQueries.ipv4Re, "[IP]"))
    timed("t31_plus_ipv4") { agg(t6, "t6") }
    timed("t31_full_query") {
      SparkEntry.queries("t31_pii_scrub_v2")(spark, sfDir).count()
    }
    timed("t18_full_query") {
      SparkEntry.queries("t18_pii_scrub")(spark, sfDir).count()
    }
    spark.stop()
  }
}
