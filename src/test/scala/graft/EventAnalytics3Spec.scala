package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventAnalytics3

class EventAnalytics3Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val WindowUs = 48L * 3600 * 1000000

  /** events at tiny SF, driver-side, as (user, t_µs, event_id, type)
    * sorted by the engine's (ts, event_id) total order */
  private lazy val byUser: Map[Long, Seq[(Long, Long, String)]] =
    Tables.events(spark, TestSpark.tiny)
      .select(col("user_id"), unix_micros(col("ts")).as("t"),
        col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1)
      .view.mapValues(_.toSeq.map(e => (e._2, e._3, e._4))
        .sortBy(e => (e._1, e._2)))
      .toMap

  test("q89 windowFunnel ≡ exhaustive chain search (every view/click/" +
    "purchase triple, window anchored at the view)") {
    val got = EventAnalytics3.q89WindowFunnel.run(spark, TestSpark.tiny)
      .select("user_id", "funnel_level").as[(Long, Long)].collect().toMap
    val want = byUser.map { case (u, ev) =>
      val idx = ev.zipWithIndex
      val views = idx.filter(_._1._3 == "view")
      val clicks = idx.filter(_._1._3 == "click")
      val purchases = idx.filter(_._1._3 == "purchase")
      val lvl2 = views.exists { case ((vt, _, _), vi) =>
        clicks.exists { case ((ct, _, _), ci) => ci > vi && ct - vt <= WindowUs } }
      val lvl3 = views.exists { case ((vt, _, _), vi) =>
        clicks.exists { case ((ct, _, _), ci) =>
          ci > vi && ct - vt <= WindowUs &&
            purchases.exists { case ((pt, _, _), pi) =>
              pi > ci && pt - vt <= WindowUs } } }
      u -> (if (lvl3) 3L else if (lvl2) 2L else if (views.nonEmpty) 1L else 0L)
    }
    assert(got === want)
    // the fixture must actually discriminate: all of levels ≥1 present
    assert(want.values.toSet.intersect(Set(1L, 2L, 3L)).size >= 2,
      s"degenerate fixture: levels ${want.values.toSet}")
  }

  test("q90 EWMA ≡ driver-side integer fold (seed-first, floor halving)") {
    val vals = Tables.events(spark, TestSpark.tiny)
      .select(col("user_id"), unix_micros(col("ts")).as("t"),
        col("event_id"),
        floor(col("value") * 10000.0 + 0.5).cast("long").as("v4"))
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1)
      .view.mapValues(_.sortBy(e => (e._2, e._3)).map(_._4)).toMap
    val want = vals.map { case (u, vs) =>
      u -> vs.tail.foldLeft(vs.head)((st, v) => Math.floorDiv(st + v, 2))
    }
    val got = EventAnalytics3.q90Ewma.run(spark, TestSpark.tiny)
      .select(col("user_id"),
        floor(col("ewma") * 10000.0 + 0.5).cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(got === want)
  }
}
