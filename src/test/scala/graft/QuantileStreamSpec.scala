package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams

/** Incremental quantile sketch: the cumulative estimate after the last
  * micro-batch must equal the one-shot `q137_quantile_sketch` output in
  * ANY arrival order (value counts are a commutative monoid), and a
  * batch retry must be idempotent. (Duplicate DELIVERY across distinct
  * batch ids is out of contract — that is the upstream dedup stage's
  * job — unlike the HLL twin's semilattice, and the twin's doc says
  * so.) */
class QuantileStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private type Row5 = (String, Long, Long, Double, Double, Double)

  private def key(df: DataFrame): Set[Row5] =
    df.select("event_type", "pct", "n", "exact_v", "est_v", "err")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toSet

  private def oneShot(): Set[Row5] =
    key(graft.operators.EventAnalytics13.q137QuantileSketch
      .run(spark, TestSpark.tiny))

  /** events cut into n slices by a SHUFFLED order (user_id mod n) —
    * deliberately NOT time slices: the monoid contract says arrival
    * order must not matter */
  private def slices(n: Int): IndexedSeq[DataFrame] = {
    val e = Tables.events(spark, TestSpark.tiny)
      .select("event_type", "value", "user_id")
    (0 until n).map(i => e.filter(col("user_id") % n === i))
  }

  test("cumulative sketch after the last batch equals the one-shot " +
    "q137 output, order-shuffled arrival") {
    val dir = java.nio.file.Files.createTempDirectory("qinc")
      .toString + "/state"
    var last: Set[Row5] = Set.empty
    slices(3).zipWithIndex.foreach { case (b, bid) =>
      last = key(Streams.quantileIncrementalBatch(b, dir, bid.toLong))
    }
    assert(last === oneShot())
  }

  test("a batch retry is idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("qinc_retry")
      .toString + "/state"
    val bs = slices(3)
    Streams.quantileIncrementalBatch(bs(0), dir, 0L)
    val after1 = key(Streams.quantileIncrementalBatch(bs(1), dir, 1L))
    val retried = key(Streams.quantileIncrementalBatch(bs(1), dir, 1L))
    assert(retried === after1)
    val fin = key(Streams.quantileIncrementalBatch(bs(2), dir, 2L))
    assert(fin === oneShot())
  }
}
