package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventAnalytics2

/** Plain-Scala greedy references for the ClickHouse-style sequence
  * analytics (subsequence existence + non-overlapping occurrence
  * count) on the sf0.001 event stream.
  */
class SequenceMatchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def byUser(): Map[Long, Seq[(Long, Long, String)]] =
    Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id", "event_type")
      .collect().toSeq
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
      .groupBy(_._1).map { case (u, v) =>
        u -> v.map(_._2).sortBy(e => (e._1, e._2))
      }

  test("q87_sequence_match equals the greedy-earliest chain") {
    val users = byUser()
    val expected = users.toSeq.sortBy(_._1).flatMap { case (u, evs) =>
      val t1 = evs.collectFirst { case (us, _, "view") => us }
      t1.map { a =>
        val t2 = evs.collectFirst { case (us, _, "click") if us > a => us }
        val t3 = t2.flatMap(b =>
          evs.collectFirst { case (us, _, "purchase") if us > b => us })
        (u, a, t2, t3, t3.isDefined,
          t3.map(cc => (cc - a).toDouble / 3600000000.0))
      }
    }
    val got = EventAnalytics2.q87SequenceMatch.run(spark, sf)
      .selectExpr("user_id", "unix_micros(t1)", "unix_micros(t2)",
        "unix_micros(t3)", "matched", "span_hours")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getBoolean(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toSeq
    assert(got === expected)
  }

  test("q88_sequence_count equals a greedy non-overlapping scan") {
    val users = byUser()
    val pattern = Vector("view", "click", "purchase")
    val expected = users.toSeq.sortBy(_._1).map { case (u, evs) =>
      var stage = 0; var count = 0L
      for ((_, _, t) <- evs)
        if (t == pattern(stage)) {
          stage += 1
          if (stage == 3) { stage = 0; count += 1 }
        }
      (u, evs.size.toLong, count)
    }
    val got = EventAnalytics2.q88SequenceCount.run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
    // the pattern must actually occur somewhere, or the test is vacuous
    assert(expected.map(_._3).sum > 0)
  }
}
