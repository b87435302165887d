package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.QuantileState

/** ST6 on the real arbitrary-state API, second operator: the
  * `transformWithState` quantile value-count sketch with RocksDB-backed
  * keyed `MapState` — golden ≡ one-shot across a query KILL + RESTART
  * from the same checkpoint, with duplicate VALUES delivered in batches
  * spanning the restart boundary (a count monoid counts them exactly as
  * the one-shot over the concatenated arrivals does). */
class QuantileTwsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("transformWithState quantile sketch survives restart; state ≡ one-shot") {
    implicit val ctx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("qtl_tws_ckpt").toString
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[(String, Double)]
    // Update-mode emission: per batch each updated key emits only its
    // UPDATED (v4 → new total) entries (O(delta), not O(state)); the
    // latest emission per (key, v4) is that pair's final count
    @volatile var snap = Map.empty[(String, Long), Long]
    def start() = QuantileState
      .quantileSketch(in.toDF.toDF("event_type", "value"))
      .writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[(String, Long, Long)], _: Long) =>
          batch.collect().foreach { case (k, v4, c) => snap += (k, v4) -> c }
      }
      .option("checkpointLocation", ckpt)
      .start()

    // values straddle the fixed-point rounding and repeat across batches
    val batch1 = (1 to 300).map(i => ("view", (i % 97) * 0.37)) ++
      (1 to 120).map(i => ("purchase", (i % 31) * 1.115))
    val batch2 = (1 to 250).map(i => ("view", (i % 97) * 0.37)) ++ // dups of batch1 values
      (1 to 80).map(i => ("purchase", 17.0 + (i % 13) * 0.005)) ++
      (1 to 60).map(i => ("click", i * 0.25)) // key first seen after restart
    try {
      val q1 = start()
      in.addData(batch1: _*)
      q1.processAllAvailable()
      q1.stop() // kill between batches; offsets + RocksDB state checkpointed

      val q2 = start() // restart from the same checkpoint
      in.addData(batch2: _*)
      q2.processAllAvailable()
      q2.stop()
    } finally {
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }

    // one-shot: the q137 pipeline head over ALL arrivals (dups counted)
    val all = (batch1 ++ batch2).toDF("event_type", "value")
    val oneShotVc = all
      .select(col("event_type"),
        floor(col("value") * 10000.0 + 0.5).cast("long").as("v4"))
      .groupBy("event_type", "v4").agg(count(lit(1)).as("c"))

    assert(snap.keys.map(_._1).toSet === Set("view", "purchase", "click"))
    val streamedVc = snap.toSeq
      .map { case ((k, v4), c) => (k, v4, c) }
      .toDF("event_type", "v4", "c")

    // raw state must match row-for-row…
    val expectedRows = oneShotVc.as[(String, Long, Long)].collect().toSet
    val gotRows = streamedVc.as[(String, Long, Long)].collect().toSet
    assert(gotRows === expectedRows,
      "restart + cross-boundary duplicate values must sum to the one-shot counts")

    // …and the IDENTICAL factored estimator tail must agree end-to-end
    def tail(vc: org.apache.spark.sql.DataFrame) =
      graft.operators.EventAnalytics13.quantileFromValueCounts(spark, vc)
        .collect().map(_.toSeq).toSeq
    assert(tail(streamedVc) === tail(oneShotVc))
  }
}
