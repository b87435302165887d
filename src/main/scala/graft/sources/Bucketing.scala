package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed at-rest layout (SURVEY.md §2.1 S11 extension) — the
  * co-location story for repeated large-scale joins/aggregations.
  *
  * A fact table landed with `bucketBy(n, key)` is hash-partitioned into n
  * files per write-task group AND records the bucketing in the catalog;
  * every later equi-join or aggregation on that key reads the buckets
  * back pre-partitioned, so Catalyst plans NO shuffle exchange on that
  * side. At 100 TB this is the difference between re-shuffling the fact
  * table on every query and shuffling it exactly once at landing time —
  * the engine-side equivalent of the reference sink's ORDER BY key layout
  * (ClickHouse MergeTree sorting key). `sortBy` additionally makes each
  * bucket file sort-merge-ready (no per-task sort before SMJ).
  *
  * Choose bucket counts so one bucket of the JOINED sides fits an
  * executor's memory at target scale; both sides must bucket on the same
  * key with the same count for a shuffle-free co-located join.
  */
object Bucketing {

  /** Land `df` as a bucketed+sorted catalog table (overwrite). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two bucketed tables on their bucketing key — plans with zero
    * Exchange nodes when both sides bucket on `key` with equal counts. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
