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

  /** Overwrite ONLY the partitions present in `df`, leaving the rest of
    * the table untouched (dynamic partition overwrite). This is the
    * production repair/backfill path: recompacting one day/table demux
    * partition of a 100 TB lake must not truncate the other partitions,
    * and must stay atomic per partition under retries. The session
    * setting is scoped to the write and restored afterwards. */
  def overwritePartitions(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String]): Unit = {
    val spark = df.sparkSession
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try df.write.partitionBy(partitionCols: _*).mode("overwrite").parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  def readTable(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
