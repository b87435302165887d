package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is one entry in [[queries]];
  * oracle-checkable ones also appear in [[oracleSql]] (DuckDB SQL over the
  * same parquet tables, matching column names/ordering exactly).
  */
object SparkEntry {

  /** All registered operators, module by module. */
  def registry: Seq[Q] =
    Relational.all ++ Relational2.all ++ Relational3.all ++
      Relational4.all ++ Relational5.all ++ Relational6.all ++
      Relational7.all ++ Relational8.all ++ Relational9.all ++
      Relational10.all ++ Relational11.all ++ Relational12.all ++
      Relational13.all ++ Relational14.all ++
      GraphAnalytics.all ++
      EventAnalytics.all ++
      EventAnalytics2.all ++ EventAnalytics3.all ++ EventAnalytics4.all ++
      EventAnalytics5.all ++ EventAnalytics6.all ++ EventAnalytics7.all ++
      EventAnalytics8.all ++ EventAnalytics9.all ++ EventAnalytics10.all ++
      EventAnalytics11.all ++ EventAnalytics12.all ++
      EventAnalytics13.all ++ EventAnalytics14.all ++
      EventAnalytics15.all ++ EventAnalytics16.all ++
      Cdc.all ++ Scd.all ++
      TextAnalysis.all ++ TextAnalysis2.all ++ TextAnalysis3.all ++
      TextAnalysis4.all ++ TextAnalysis5.all ++ TextAnalysis6.all ++
      TextAnalysis7.all ++ TextAnalysis8.all ++ TextAnalysis9.all ++
      TextAnalysis10.all ++
      Dedup.all ++ Dedup2.all ++ Curation.all ++
      Similarity.all ++ Similarity2.all ++ Similarity3.all ++
      Similarity4.all ++ Similarity5.all ++ Similarity6.all ++
      Similarity7.all ++ Similarity8.all ++ Similarity9.all ++
      Similarity10.all ++ Similarity11.all ++ Similarity12.all ++
      Multimodal.all ++ Multimodal2.all ++ Multimodal3.all ++
      Multimodal4.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q03RevenueByRegion.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
