package graft.operators

/** Central query registry — every suite contributes its QueryDefs here;
  * SparkEntry exposes them to the driver (Verify / Bench / oracle compare).
  */
object Registry {
  def suites: Seq[QueryDef] =
    RelationalQueries.all ++ OlapQueries.all ++ StatQueries.all ++
      TextQueries.all ++ GopherQueries.all ++ DedupQueries.all ++
      Seq(DedupClusters.dClusters, DedupClusters.dClustersOracle,
        DedupClusters.dKeepBest) ++ LineDedupQueries.all ++
      VectorQueries.all ++ MultimodalQueries.all ++ HarnessQueries.all ++
      SampleQueries.all ++ ContaminationQueries.all ++ PipelineQueries.all ++
      ClassifierQueries.all ++ PiiQueries.all ++ SubwordQueries.all ++
      UrlQueries.all

  def queries: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
    suites.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    suites.collect { case QueryDef(n, _, Some(sql)) => n -> sql.trim }.toMap
}
