package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams

/** Incremental deltaSum: the cumulative output after the last
  * micro-batch must equal the one-shot `q92_delta_sum` answer under the
  * documented time-ordered arrival contract, and a batch retry must be
  * idempotent (overwrite-own-partition state). */
class DeltaSumStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def oneShot(): Map[Long, (Long, Double)] =
    graft.operators.EventAnalytics4.q92DeltaSum.run(spark, TestSpark.tiny)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap

  private def collect(df: DataFrame): Map[Long, (Long, Double)] =
    df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap

  /** the tiny events table cut into `n` consecutive time slices (the
    * sorted-arrival contract: every event in batch i precedes batch
    * i+1) */
  private def slices(n: Int): IndexedSeq[DataFrame] = {
    val e = Tables.events(spark, TestSpark.tiny)
      .select("user_id", "ts", "event_id", "value")
      .withColumn("__rn",
        row_number().over(Window.orderBy(col("ts"), col("event_id"))))
    val total = e.count()
    val per = (total / n + 1).toInt
    (0 until n).map(i => e
      .filter(col("__rn") > i * per && col("__rn") <= (i + 1) * per)
      .drop("__rn"))
  }

  test("cumulative deltaSum after the last batch equals the one-shot q92") {
    val dir = java.nio.file.Files.createTempDirectory("deltasum")
      .toString + "/state"
    var last: Map[Long, (Long, Double)] = Map.empty
    slices(3).zipWithIndex.foreach { case (b, bid) =>
      last = collect(Streams.deltaSumIncrementalBatch(b, dir, bid.toLong))
    }
    assert(last === oneShot())
  }

  test("a batch retry is idempotent: re-running it changes nothing") {
    val dir = java.nio.file.Files.createTempDirectory("deltasum_retry")
      .toString + "/state"
    val bs = slices(3)
    Streams.deltaSumIncrementalBatch(bs(0), dir, 0L)
    val after1 = collect(Streams.deltaSumIncrementalBatch(bs(1), dir, 1L))
    val retried = collect(Streams.deltaSumIncrementalBatch(bs(1), dir, 1L))
    assert(retried === after1)
    val fin = collect(Streams.deltaSumIncrementalBatch(bs(2), dir, 2L))
    assert(fin === oneShot())
    // the boundary term must actually fire somewhere, or the golden
    // only tested batch-internal sums
    val internalOnly = bs.map(b =>
      collect(Streams.deltaSumIncrementalBatch(b,
        java.nio.file.Files.createTempDirectory("ds_iso").toString + "/s",
        0L)))
      .flatMap(_.toSeq).groupBy(_._1)
      .view.mapValues(_.map(_._2._2).sum).toMap
    assert(fin.exists { case (u, (_, ds)) =>
      math.abs(ds - internalOnly.getOrElse(u, 0.0)) > 1e-9 })
  }
}
