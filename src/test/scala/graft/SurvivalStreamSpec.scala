package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams

/** Incremental Kaplan–Meier: the curve after the last micro-batch must
  * equal the one-shot `q143_survival_km` in ANY arrival order AND under
  * duplicate delivery (per-user min/min + global max is a
  * join-semilattice — the HLL twin's contract), and a batch retry must
  * be idempotent. */
class SurvivalStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private type KmRow = (java.sql.Date, Long, Long, Long, Double)

  private def key(df: DataFrame): Set[KmRow] =
    df.select("cohort_week", "t_min", "n_risk", "d_events", "log_surv")
      .collect()
      .map(r => (r.getDate(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .toSet

  private def oneShot(): Set[KmRow] =
    key(graft.operators.EventAnalytics14.q143SurvivalKm
      .run(spark, TestSpark.tiny))

  /** events cut into n slices by a SHUFFLED order (event_id mod n) —
    * deliberately NOT time slices, and deliberately splitting single
    * users across batches: the semilattice contract says neither order
    * nor grouping may matter */
  private def slices(n: Int): IndexedSeq[DataFrame] = {
    val e = Tables.events(spark, TestSpark.tiny)
      .select("user_id", "event_type", "ts", "event_id")
    (0 until n).map(i => e.filter(col("event_id") % n === i))
  }

  test("cumulative KM after the last batch equals the one-shot q143 " +
    "curve, order-shuffled arrival") {
    val dir = java.nio.file.Files.createTempDirectory("kminc")
      .toString + "/state"
    var last: Set[KmRow] = Set.empty
    slices(3).zipWithIndex.foreach { case (b, bid) =>
      last = key(Streams.survivalIncrementalBatch(b, dir, bid.toLong))
    }
    assert(last === oneShot())
  }

  test("a batch retry is idempotent and duplicate delivery is absorbed") {
    val dir = java.nio.file.Files.createTempDirectory("kminc_retry")
      .toString + "/state"
    val bs = slices(3)
    Streams.survivalIncrementalBatch(bs(0), dir, 0L)
    val after1 = key(Streams.survivalIncrementalBatch(bs(1), dir, 1L))
    val retried = key(Streams.survivalIncrementalBatch(bs(1), dir, 1L))
    assert(retried === after1)
    // duplicated rows in a later batch must not move the curve:
    // re-deliver batch 0's rows inside batch 2
    val fin = key(Streams.survivalIncrementalBatch(
      bs(2).unionByName(bs(0)), dir, 2L))
    assert(fin === oneShot())
  }
}
