package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams

/** Incremental portable-HLL: the cumulative estimate after the last
  * micro-batch must equal the one-shot `q136_hll_portable` sketch
  * columns in ANY arrival order (register max is a join-semilattice),
  * and a batch retry must be idempotent. */
class HllStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def oneShot(): Map[String, (Long, Long, Double)] =
    graft.operators.EventAnalytics12.q136HllPortable
      .run(spark, TestSpark.tiny)
      .select("event_type", "v_empty", "s_fix", "est")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  private def collect(df: DataFrame): Map[String, (Long, Long, Double)] =
    df.select("event_type", "v_empty", "s_fix", "est").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  /** events cut into n slices by a SHUFFLED order (user_id mod n) —
    * deliberately NOT time slices: the semilattice contract says
    * arrival order must not matter */
  private def slices(n: Int): IndexedSeq[DataFrame] = {
    val e = Tables.events(spark, TestSpark.tiny)
      .select("event_type", "user_id")
    (0 until n).map(i => e.filter(col("user_id") % n === i))
  }

  test("cumulative HLL after the last batch equals the one-shot q136 " +
    "sketch columns, order-shuffled arrival") {
    val dir = java.nio.file.Files.createTempDirectory("hllinc")
      .toString + "/state"
    var last: Map[String, (Long, Long, Double)] = Map.empty
    slices(3).zipWithIndex.foreach { case (b, bid) =>
      last = collect(Streams.hllIncrementalBatch(b, dir, bid.toLong))
    }
    assert(last === oneShot())
  }

  test("a batch retry is idempotent and duplicate delivery is absorbed") {
    val dir = java.nio.file.Files.createTempDirectory("hllinc_retry")
      .toString + "/state"
    val bs = slices(3)
    Streams.hllIncrementalBatch(bs(0), dir, 0L)
    val after1 = collect(Streams.hllIncrementalBatch(bs(1), dir, 1L))
    val retried = collect(Streams.hllIncrementalBatch(bs(1), dir, 1L))
    assert(retried === after1)
    // duplicated rows in a later batch must not move the registers:
    // re-deliver batch 0's rows inside batch 2
    val fin = collect(Streams.hllIncrementalBatch(
      bs(2).unionByName(bs(0)), dir, 2L))
    assert(fin === oneShot())
  }
}
