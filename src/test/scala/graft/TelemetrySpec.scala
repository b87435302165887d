package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class TelemetrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("batch recorder captures action metrics") {
    val (batch, _) = Telemetry.attach(spark)
    batch.drain()
    Seq(1, 2, 3).toDF("x").collect()
    // listener callbacks are async — poll briefly
    var got = batch.drain()
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (!got.exists(m => !m.failed && m.durationNs > 0) &&
        System.nanoTime() < deadline) {
      Thread.sleep(100)
      got = got ++ batch.drain()
    }
    assert(got.exists(m => !m.failed && m.durationNs > 0))
  }

  test("stream recorder captures micro-batch progress") {
    implicit val ctx = spark.sqlContext
    val (_, streamRec) = Telemetry.attach(spark)
    streamRec.drain()
    val in = MemoryStream[Long]
    val q = in.toDF().writeStream.format("memory")
      .queryName("telemetry_out").start()
    try {
      in.addData(1L, 2L, 3L)
      q.processAllAvailable()
      // progress events are delivered asynchronously; poll briefly
      var got = streamRec.drain()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!got.exists(_.inputRows == 3) && System.nanoTime() < deadline) {
        Thread.sleep(100)
        got = got ++ streamRec.drain()
      }
      assert(got.exists(m => m.inputRows == 3 && m.batchDurationMs >= 0))
    } finally q.stop()
  }
}
