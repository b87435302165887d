package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.HllState

/** ST6 on the real arbitrary-state API: `transformWithState` HLL sketch
  * with RocksDB-backed keyed state — golden ≡ one-shot across a query
  * KILL + RESTART from the same checkpoint, with duplicate delivery
  * spanning the restart boundary. */
class HllTwsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("transformWithState HLL survives restart; final state ≡ one-shot") {
    implicit val ctx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("hll_tws_ckpt").toString
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[(String, Long)]
    @volatile var snap = Map.empty[String, Array[Byte]]
    def start() = HllState
      .hllSketch(in.toDF.toDF("event_type", "user_id"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[(String, Array[Byte])], _: Long) =>
        // Update-mode emission: merge each batch's per-key snapshots
        // over the running map, so `snap` always holds the latest
        batch.collect().foreach { case (k, r) => snap += k -> r }
      }
      .option("checkpointLocation", ckpt)
      .start()

    val batch1 = (1L to 400L).map(u => ("view", u)) ++
      (1L to 150L).map(u => ("purchase", u))
    val batch2 = (200L to 600L).map(u => ("view", u)) ++ // 200–400 are dups
      (100L to 260L).map(u => ("purchase", u)) ++ // 100–150 are dups
      (1L to 90L).map(u => ("click", u)) // key first seen after restart
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

    // one-shot estimator over ALL distinct arrivals (duplicates folded)
    import graft.operators.EventAnalytics12.{hllEstimate, hllRanks}
    val all = (batch1 ++ batch2).toDF("event_type", "user_id")
    val oneShotRegs = hllRanks(all)
      .groupBy("event_type", "bucket").agg(max("rank").as("mj"))
    val expected = hllEstimate(oneShotRegs,
        all.select("event_type").distinct())
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet

    // streaming state → the same estimator tail
    assert(snap.keySet === Set("view", "purchase", "click"))
    val streamed = snap.toSeq
      .flatMap { case (k, regs) =>
        regs.zipWithIndex.collect {
          case (m, b) if m > 0 => (k, b.toLong, m.toInt)
        }
      }
      .toDF("event_type", "bucket", "mj")
    val got = hllEstimate(streamed,
        snap.keySet.toSeq.toDF("event_type"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got === expected,
      "restart + duplicate delivery must fold to the one-shot registers")
  }
}
