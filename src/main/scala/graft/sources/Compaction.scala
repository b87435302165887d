package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.operators.Cdc

/** Changelog compaction — the engine's ReplacingMergeTree merge process
  * (the reference's ClickHouse sink compacts versions at merge time;
  * here it is an explicit maintenance job over the parquet at-rest
  * layer).
  *
  * Layout contract: a CDC stream appends micro-batches to a *changelog
  * table* (append-only parquet, one row per change, tombstones
  * included). Readers wanting current state apply [[Cdc.materialize]]
  * (the "FINAL" view); compaction makes that view cheap by periodically
  * rewriting the changelog into its materialized form, after which
  * reads are plain scans and the next compaction only folds the new
  * tail. At 100 TB, partition the changelog by a demux key
  * (topic/table/date) and compact partitions independently.
  */
object Compaction {

  /** Current-state view over an (uncompacted) changelog table. */
  def stateView(changelog: DataFrame, keys: Seq[String],
      version: Seq[Column], isTombstone: Column): DataFrame =
    Cdc.materialize(changelog, keys, version, isTombstone)

  /** Summing state view — the SummingMergeTree analogue: rows sharing a
    * key collapse into one row of exact metric sums. Callers pass the
    * aggregate per metric (use exact decimal sums for doubles, see
    * `Tables.dsum`); re-compacting a compacted table with a new tail is
    * associative, so the maintenance job can run any time. */
  def summingStateView(changelog: DataFrame, keys: Seq[String],
      metrics: Seq[(String, Column)]): DataFrame = {
    val aggs = metrics.map { case (n, c) => c.as(n) }
    changelog.groupBy(keys.map(org.apache.spark.sql.functions.col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Rewrite a changelog table in place to its summed form (see
    * [[summingStateView]]); same temp-then-swap safety as [[compact]]. */
  def summingCompact(
      spark: SparkSession,
      path: String,
      keys: Seq[String],
      metrics: Seq[(String, Column)],
      partitionCols: Seq[String] = Nil): Unit = {
    val tmp = path + ".compacting"
    val state = summingStateView(spark.read.parquet(path), keys, metrics)
    ParquetSink.writePartitioned(state, tmp, partitionCols)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    val old = new org.apache.hadoop.fs.Path(path + ".old")
    fs.rename(dst, old)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
    fs.delete(old, true)
  }

  /** Rewrite a changelog table in place to its materialized state.
    * The rewrite goes through a temp path then swaps, so a failed
    * compaction leaves the original readable. */
  def compact(
      spark: SparkSession,
      path: String,
      keys: Seq[String],
      version: Seq[Column],
      isTombstone: Column,
      partitionCols: Seq[String] = Nil): Unit = {
    val tmp = path + ".compacting"
    val state = stateView(spark.read.parquet(path), keys, version, isTombstone)
    ParquetSink.writePartitioned(state, tmp, partitionCols)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    val old = new org.apache.hadoop.fs.Path(path + ".old")
    fs.rename(dst, old)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
    fs.delete(old, true)
  }
}
