package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ParquetSink
import graft.streaming.Streams

class ParquetSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("partitioned write → partition-pruned read") {
    val dir = Files.createTempDirectory("graft_sink").toString
    val events = Tables.events(spark, TestSpark.tiny)
    ParquetSink.writePartitioned(events, dir, Seq("event_type"))
    val back = ParquetSink.readTable(spark, dir)
      .filter(col("event_type") === "click")
    // partition pruning: the scan's partition filters carry the predicate
    val scan = back.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("event_type"),
      s"no partition pruning in: ${scan.take(400)}")
    val expected = events.filter(col("event_type") === "click").count()
    assert(back.count() === expected)
    // schema round-trips (partition column re-attached)
    assert(back.columns.sorted === events.columns.sorted)
  }

  test("dynamic partition overwrite touches only the written partitions") {
    val dir = Files.createTempDirectory("graft_dpo").toString + "/t"
    Seq((1, "a", "p1"), (2, "b", "p1"), (3, "c", "p2"))
      .toDF("id", "v", "part")
      .write.partitionBy("part").parquet(dir)
    // rewrite ONLY p1 with one corrected row
    ParquetSink.overwritePartitions(
      Seq((9, "fixed", "p1")).toDF("id", "v", "part"), dir, Seq("part"))
    val back = ParquetSink.readTable(spark, dir)
      .select("id", "v", "part").as[(Int, String, String)].collect().toSet
    // p1 replaced, p2 untouched (static overwrite would have dropped it)
    assert(back === Set((9, "fixed", "p1"), (3, "c", "p2")))
    // the session setting is restored
    assert(spark.conf.getOption(
      "spark.sql.sources.partitionOverwriteMode").forall(_ != "dynamic"))
  }

  test("stream → changelog parquet → compaction → state (full loop)") {
    implicit val ctx = spark.sqlContext
    import graft.sources.Compaction
    val dir = Files.createTempDirectory("graft_loop").toString + "/t"
    val in = MemoryStream[(Int, String, Long, Boolean)]
    val q = in.toDF.toDF("id", "name", "offset", "is_del")
      .writeStream.outputMode("append")
      .foreachBatch(Streams.changelogAppend(dir))
      .start()
    try {
      in.addData((1, "ann", 0L, false), (2, "bob", 1L, false))
      q.processAllAvailable()
      in.addData((1, "ann2", 2L, false), (2, null.asInstanceOf[String], 3L, true))
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.read.parquet(dir).count() === 4) // append-only changelog
    Compaction.compact(spark, dir, Seq("id"), Seq(col("offset")),
      col("is_del"))
    val state = spark.read.parquet(dir)
      .select("id", "name").as[(Int, String)].collect().toSet
    assert(state === Set((1, "ann2")))
  }

  test("checkpointed stream restart does not reprocess merged batches (ST1)") {
    implicit val ctx = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val sink = new Streams.UpsertMemorySink("id", Seq("offset"), "is_del")
    var merges = 0
    val in = MemoryStream[(Int, String, Long, Boolean)]
    def start() = in.toDF.toDF("id", "name", "offset", "is_del")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        merges += 1; sink.merge(df)
      }
      .start()
    val q1 = start()
    in.addData((1, "ann", 0L, false))
    q1.processAllAvailable(); q1.stop()
    val mergesAfterFirst = merges
    val q2 = start() // restart from checkpoint
    in.addData((2, "bob", 1L, false))
    q2.processAllAvailable(); q2.stop()
    assert(sink.snapshot.keySet === Set(1, 2))
    // batch 0 was not re-merged after restart
    assert(merges === mergesAfterFirst + 1)
  }
}
