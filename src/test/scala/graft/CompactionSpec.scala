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
}
