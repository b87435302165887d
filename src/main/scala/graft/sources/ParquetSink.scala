package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The at-rest analytical layer (SURVEY.md §2.1 S9): the reference
  * provisions ClickHouse MergeTree as its columnar landing store;
  * Spark-side the equivalent is hive-partitioned Parquet — columnar,
  * min/max-pruned, and partition-pruned on the directory keys.
  *
  * Partition column choice is the 100 TB lever: low-cardinality demux
  * keys (topic/table/date) → directory pruning turns per-table queries
  * into partial scans; everything else relies on parquet row-group
  * min/max stats.
  */
object ParquetSink {

  /** Write a (batch or foreachBatch) DataFrame as a partitioned table. */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      mode: String = "overwrite"): Unit =
    df.write.partitionBy(partitionCols: _*).mode(mode).parquet(path)

  def readTable(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
