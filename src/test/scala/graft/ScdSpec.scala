package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Scd

/** Incremental SCD2 maintenance: batch-split application must equal the
  * one-shot rebuild, both directly and driven through a streaming
  * foreachBatch loop. */
class ScdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val events = Seq(
    // user 1: a → a (redelivery, no change) → b → b → c
    (1L, "a", ts("2024-01-01 10:00:00"), 1L),
    (1L, "a", ts("2024-01-01 11:00:00"), 2L),
    (1L, "b", ts("2024-01-02 09:00:00"), 3L),
    (1L, "b", ts("2024-01-03 09:00:00"), 4L),
    (1L, "c", ts("2024-01-05 09:00:00"), 5L),
    // user 2: single state, never changes
    (2L, "x", ts("2024-01-01 08:00:00"), 6L),
    (2L, "x", ts("2024-01-04 08:00:00"), 7L),
    // user 3: appears only in the second half
    (3L, "m", ts("2024-01-04 12:00:00"), 8L),
    (3L, "n", ts("2024-01-06 12:00:00"), 9L))

  private def df(rows: Seq[(Long, String, Timestamp, Long)]): DataFrame =
    rows.toDF("user_id", "event_type", "ts", "event_id")

  private def canon(h: DataFrame): Seq[(Long, String, String, String, Boolean)] =
    h.select(col("user_id"), col("event_type"),
        col("eff_from").cast("string"), col("eff_to").cast("string"),
        col("is_current"))
      .as[(Long, String, String, String, Boolean)]
      .collect().sortBy(r => (r._1, r._3)).toSeq

  private val keyCols = ("user_id", "event_type", Seq("ts", "event_id"))

  test("incremental scd2Merge equals the one-shot rebuild") {
    val (k, a, v) = keyCols
    val full = Scd.scd2(df(events), k, a, v)
      .select("user_id", "event_type", "eff_from", "eff_to", "is_current")
    // split mid-run (keeps per-key version order)
    val (b1, b2) = events.sortBy(e => (e._3.getTime, e._4)).splitAt(5)
    val empty = full.filter(lit(false))
    val h1 = Scd.scd2Merge(empty, df(b1), k, a, v)
    val h2 = Scd.scd2Merge(h1, df(b2), k, a, v)
    assert(canon(h2) === canon(full))
    // no-change redelivery batch: history must not move
    val h3 = Scd.scd2Merge(h2,
      df(Seq((2L, "x", ts("2024-01-07 08:00:00"), 10L))), k, a, v)
    assert(canon(h3) === canon(h2))
  }

  test("foreachBatch-driven scd2 history converges to the batch answer") {
    val (k, a, v) = keyCols
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, String, Timestamp, Long)]
    var history: DataFrame =
      Scd.scd2(df(events), k, a, v)
        .select("user_id", "event_type", "eff_from", "eff_to", "is_current")
        .filter(lit(false)).localCheckpoint()
    val q = in.toDF.toDF("user_id", "event_type", "ts", "event_id")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        history = Scd.scd2Merge(history, batch, k, a, v).localCheckpoint()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_scd_ckpt").toString)
      .start()
    try {
      val ordered = events.sortBy(e => (e._3.getTime, e._4))
      val (b1, b2) = ordered.splitAt(4)
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val full = Scd.scd2(df(events), keyCols._1, keyCols._2, keyCols._3)
      .select("user_id", "event_type", "eff_from", "eff_to", "is_current")
    assert(canon(history) === canon(full))
  }
}
