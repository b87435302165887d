package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The snapshot phase of CDC (SURVEY.md §2.1 S5): Debezium's
  * snapshot.mode=initial (reference: debezium.json:18) reads the whole
  * table before tailing the WAL. Spark-side the bulk phase is a
  * partitioned JDBC scan — `numPartitions` concurrent range queries on a
  * numeric key — after which the Kafka stream (from the snapshot's LSN)
  * takes over via [[KafkaCdc]].
  *
  * No database ships in this environment, so this is the option surface
  * plus the partitioning math; on a cluster `read(...)` is live.
  */
object JdbcSnapshot {

  final case class Partitioning(
      column: String, lower: Long, upper: Long, numPartitions: Int)

  /** Pick a partition count that bounds rows-per-task: ceil(n / target). */
  def partitioningFor(column: String, lower: Long, upper: Long,
      rowCount: Long, targetRowsPerPartition: Long = 1000000L): Partitioning =
    Partitioning(column, lower, upper,
      math.max(1, math.ceil(rowCount.toDouble / targetRowsPerPartition).toInt))

  def options(url: String, table: String, p: Partitioning,
      fetchSize: Int = 10000): Map[String, String] = Map(
    "url" -> url,
    "dbtable" -> table,
    "partitionColumn" -> p.column,
    "lowerBound" -> p.lower.toString,
    "upperBound" -> p.upper.toString,
    "numPartitions" -> p.numPartitions.toString,
    "fetchsize" -> fetchSize.toString)

  def read(spark: SparkSession, url: String, table: String,
      p: Partitioning): DataFrame =
    spark.read.format("jdbc").options(options(url, table, p)).load()
}
