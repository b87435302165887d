package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventAnalytics10

class EventAnalytics10Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val activity: Seq[(Long, Long)] = // (epochDay, user)
    Tables.events(spark, TestSpark.tiny)
      .select(col("ts").cast("date").as("day"), col("user_id"))
      .distinct().as[(java.sql.Date, Long)].collect()
      .map(r => (r._1.toLocalDate.toEpochDay, r._2)).toSeq

  test("cohort LTV: cumulative curve is the running sum of period values") {
    val got = EventAnalytics10.q123CohortLtv.run(spark, TestSpark.tiny)
      .select("cohort_week", "week_offset", "cohort_size", "period_value",
        "cum_ltv_per_user")
      .as[(java.sql.Date, Long, Long, Double, Double)].collect()
    got.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      var cum = 0.0
      sorted.foreach { case (_, _, size, pv, ltv) =>
        cum += pv
        assert(math.abs(ltv - cum / size) < 1e-6)
        assert(size > 0 && pv >= 0.0)
      }
      // offsets are non-negative and strictly increasing
      assert(sorted.map(_._2) === sorted.map(_._2).distinct.sorted)
      assert(sorted.head._2 >= 0)
    }
  }

  test("activity heatmap: shares sum to 1 over the 168-cell grid") {
    val got = EventAnalytics10.q124ActivityHeatmap.run(spark, TestSpark.tiny)
      .select("dow", "hour", "n", "n_users", "share")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(got.forall(r => r._1 >= 1 && r._1 <= 7 && r._2 >= 0 && r._2 <= 23))
    val total = Tables.events(spark, TestSpark.tiny).count()
    assert(got.map(_._3).sum === total)
    assert(math.abs(got.map(_._5).sum - 1.0) < 1e-9)
    got.foreach(r => assert(r._4 <= r._3))
  }

  test("stickiness ≡ driver-side trailing distinct counts") {
    val byDay = activity.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
      .toMap
    val got = EventAnalytics10.q125Stickiness.run(spark, TestSpark.tiny)
      .select("day", "dau", "wau", "mau", "dau_wau", "dau_mau")
      .as[(java.sql.Date, Long, Long, Long, Double, Double)].collect()
    assert(got.map(_._1.toLocalDate.toEpochDay).toSet === byDay.keySet)
    got.foreach { case (d, dau, wau, mau, dw, dm) =>
      val day = d.toLocalDate.toEpochDay
      assert(dau === byDay(day).size.toLong)
      val w = (day - 6 to day).flatMap(byDay.get).flatten.toSet.size.toLong
      val m = (day - 27 to day).flatMap(byDay.get).flatten.toSet.size.toLong
      assert(wau === w, s"wau at $d")
      assert(mau === m, s"mau at $d")
      assert(dw === dau.toDouble / wau && dm === dau.toDouble / mau)
      assert(dau <= wau && wau <= mau)
    }
  }
}
