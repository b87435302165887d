package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Compaction

class CompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeChangelog(path: String): Unit =
    Seq(
      (1, "ann", 0L), (2, "bob", 1L), (1, "ann2", 2L),
      (3, "cat", 3L), (2, null.asInstanceOf[String], 4L) // tombstone
    ).toDF("id", "name", "offset")
      .write.mode("overwrite").parquet(path)

  test("stateView applies FINAL semantics without rewriting") {
    val dir = Files.createTempDirectory("graft_cl").toString + "/t"
    writeChangelog(dir)
    val state = Compaction.stateView(spark.read.parquet(dir),
      Seq("id"), Seq(col("offset")), col("name").isNull)
    assert(state.select("id", "name").as[(Int, String)].collect().toSet
      === Set((1, "ann2"), (3, "cat")))
    // changelog untouched: still 5 rows
    assert(spark.read.parquet(dir).count() === 5)
  }

  test("compact rewrites the table to its materialized state in place") {
    val dir = Files.createTempDirectory("graft_cl2").toString + "/t"
    writeChangelog(dir)
    Compaction.compact(spark, dir, Seq("id"), Seq(col("offset")),
      col("name").isNull)
    val after = spark.read.parquet(dir)
    assert(after.count() === 2)
    assert(after.select("id", "name").as[(Int, String)].collect().toSet
      === Set((1, "ann2"), (3, "cat")))
    // compacting again is a no-op (idempotent on compacted state)
    Compaction.compact(spark, dir, Seq("id"), Seq(col("offset")),
      col("name").isNull)
    assert(spark.read.parquet(dir).count() === 2)
  }

  test("summingCompact collapses keys to exact sums; re-compact with tail is associative") {
    val dir = Files.createTempDirectory("graft_cl3").toString + "/t"
    Seq((1, 5L, 10.25), (1, 3L, 0.50), (2, 7L, 1.00))
      .toDF("id", "hits", "amount")
      .write.mode("overwrite").parquet(dir)
    val metrics = Seq(
      "hits" -> sum(col("hits")),
      "amount" -> Tables.dsum(Tables.money(col("amount"))))
    Compaction.summingCompact(spark, dir, Seq("id"), metrics)
    val once = spark.read.parquet(dir)
      .select("id", "hits", "amount").as[(Int, Long, Double)].collect().toSet
    assert(once === Set((1, 8L, 10.75), (2, 7L, 1.0)))
    // append a tail and compact again — sums of sums equal one-shot sums
    Seq((1, 2L, 0.25), (3, 1L, 9.00)).toDF("id", "hits", "amount")
      .write.mode("append").parquet(dir)
    Compaction.summingCompact(spark, dir, Seq("id"), metrics)
    val twice = spark.read.parquet(dir)
      .select("id", "hits", "amount").as[(Int, Long, Double)].collect().toSet
    assert(twice === Set((1, 10L, 11.0), (2, 7L, 1.0), (3, 1L, 9.0)))
  }
}
