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
