package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.DeltaSumState

/** ST6 on the real arbitrary-state API, fifth operator — the first
  * ORDER-DEPENDENT one: `transformWithState` deltaSum whose RocksDB
  * ValueState carries (n, acc, LAST VALUE) per user. Golden ≡ one-shot
  * `q92_delta_sum` on the real events table, cut into consecutive
  * time slices (the sorted-arrival contract), with a query KILL +
  * RESTART between slices: the checkpointed last-value must seam the
  * fold across the boundary — a wrong or lost last_v4 shifts every
  * post-restart increase and cannot hash-match. */
class DeltaSumTwsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("transformWithState deltaSum seams the ordered fold across a restart") {
    implicit val ctx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("ds_tws_ckpt").toString
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    // real events in global (ts, event_id) order, cut into 3 slices —
    // every event in slice i precedes slice i+1 (per-user order holds)
    val rows = Tables.events(spark, TestSpark.tiny)
      .select(col("user_id").cast("long"), col("ts"),
        col("event_id").cast("long"), col("value"))
      .withColumn("__rn",
        row_number().over(Window.orderBy(col("ts"), col("event_id"))))
      .orderBy("__rn")
      .collect()
    val per = rows.length / 3 + 1
    val slices = rows.grouped(per).toSeq.map(_.map(r =>
      (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3))))

    val in = MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
    @volatile var snap = Map.empty[Long, (Long, Long)]
    def start() = DeltaSumState
      .deltaSum(in.toDF.toDF("user_id", "ts", "event_id", "value"))
      .writeStream
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[(Long, Long, Long)], _: Long) =>
          b.collect().foreach { case (u, n, acc) => snap += u -> (n, acc) }
      }
      .option("checkpointLocation", ckpt)
      .start()

    try {
      val q1 = start()
      in.addData(slices(0): _*)
      q1.processAllAvailable()
      in.addData(slices(1): _*)
      q1.processAllAvailable()
      q1.stop() // kill mid-stream; (n, acc, last_v4) is checkpointed

      val q2 = start() // restart: the fold must resume from last_v4
      in.addData(slices(2): _*)
      q2.processAllAvailable()
      q2.stop()
    } finally {
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }

    val got = snap.toSeq
      .map { case (u, (n, acc)) => (u, n, acc.toDouble / 10000.0) }
      .toDF("user_id", "n_events", "delta_sum")
      .as[(Long, Long, Double)].collect().toSet
    val expected = graft.operators.EventAnalytics4.q92DeltaSum
      .run(spark, TestSpark.tiny)
      .as[(Long, Long, Double)].collect().toSet
    assert(got === expected,
      "ordered fold across kill/restart must equal the one-shot q92")
  }
}
