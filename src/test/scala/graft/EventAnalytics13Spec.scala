package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{EventAnalytics13, TextAnalysis9}

class EventAnalytics13Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val evts: Array[(String, java.sql.Timestamp, Double)] =
    Tables.events(spark, TestSpark.tiny)
      .select(col("event_type"), col("ts"), col("value"))
      .as[(String, java.sql.Timestamp, Double)].collect()

  test("q137 quantile sketch: exact order statistics match a driver " +
    "sort; estimates land in the right bin") {
    val got = EventAnalytics13.q137QuantileSketch.run(spark, TestSpark.tiny)
      .select("event_type", "pct", "n", "exact_v", "est_v")
      .as[(String, Long, Long, Double, Double)].collect()
    assert(got.nonEmpty)
    val byType = evts.groupBy(_._1)
    got.foreach { case (t, pct, n, exactV, estV) =>
      val v4s = byType(t).map(r => math.floor(r._3 * 10000.0 + 0.5).toLong)
        .sorted
      assert(n === v4s.length.toLong)
      val k = ((pct * n + 99) / 100).toInt
      val exact4 = v4s(k - 1)
      assert(exactV === exact4.toDouble / 10000.0, s"$t p$pct")
      // the estimate must come from exact4's own (possibly clamped) bin
      val b = math.min(exact4 / 4096L, 4095L)
      val est4 = math.round(estV * 10000.0)
      assert(est4 >= b * 4096L && est4 < (b + 1) * 4096L,
        s"$t p$pct est outside the k-th bin")
    }
  }

  test("q138 seasonal-naive error ≡ driver-side train/test backtest") {
    val got = EventAnalytics13.q138SeasonalNaiveError.run(spark, TestSpark.tiny)
      .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    val cal = java.util.Calendar.getInstance(
      java.util.TimeZone.getTimeZone("UTC"))
    def hod(ts: java.sql.Timestamp): Int = {
      cal.setTimeInMillis(ts.getTime); cal.get(java.util.Calendar.HOUR_OF_DAY)
    }
    def dom(ts: java.sql.Timestamp): Int = {
      cal.setTimeInMillis(ts.getTime); cal.get(java.util.Calendar.DAY_OF_MONTH)
    }
    val byType = evts.groupBy(_._1)
    byType.foreach { case (t, rows) =>
      val v = rows.map(r =>
        (hod(r._2), dom(r._2) % 2, math.floor(r._3 * 10000.0 + 0.5).toLong))
      val model = v.filter(_._2 == 0).groupBy(_._1)
        .view.mapValues(xs => xs.map(_._3).sum / xs.length).toMap
      val test = v.filter(x => x._2 == 1 && model.contains(x._1))
      if (test.nonEmpty) {
        val mae = test.map(x => math.abs(x._3 - model(x._1))).sum.toDouble /
          test.length / 10000.0
        val (gn, gm) = got(t)
        assert(gn === test.length.toLong, t)
        assert(math.abs(gm - mae) < 1e-9, s"$t mae $gm vs $mae")
      }
    }
    assert(got.nonEmpty)
  }

  test("text_fertility ≡ driver-side token/word ratio per lang") {
    val got = TextAnalysis9.fertility.run(spark, TestSpark.tiny)
      .select("lang", "n_words", "n_tokens", "fertility")
      .as[(String, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    val docs = Tables.documents(spark, TestSpark.tiny)
      .select("lang", "text").as[(String, String)].collect()
    val re = "([a-z]+|[0-9]+|[^a-z0-9 ])".r
    val byLang = docs.groupBy(_._1)
    got.foreach { case (lang, nw, nt, f) =>
      val ws = byLang(lang).map(_._2.trim.split(" ", -1).length.toLong).sum
      val ts = byLang(lang).map(d => re.findAllIn(d._2).size.toLong).sum
      assert(nw === ws, s"$lang words")
      assert(nt === ts, s"$lang tokens")
      assert(f === ts.toDouble / ws)
    }
  }

  test("q139 time-to-convert ≡ driver-side exact cohort percentiles") {
    val got = EventAnalytics13.q139TimeToConvert.run(spark, TestSpark.tiny)
      .select(col("cohort_week").cast("string"), col("n_users"),
        col("p50_min"), col("p90_min"))
      .as[(String, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val ev = Tables.events(spark, TestSpark.tiny)
      .select("user_id", "event_type", "ts")
      .as[(Long, String, java.sql.Timestamp)].collect()
    def micros(t: java.sql.Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
    val su = ev.filter(_._2 == "signup").groupBy(_._1)
      .view.mapValues(_.map(r => micros(r._3)).min).toMap
    val pu = ev.filter(_._2 == "purchase").groupBy(_._1)
      .view.mapValues(_.map(r => micros(r._3)).min).toMap
    val lats = su.toSeq.flatMap { case (u, st) =>
      pu.get(u).filter(_ >= st).map { pt =>
        val cal = java.util.Calendar.getInstance(
          java.util.TimeZone.getTimeZone("UTC"))
        cal.setTimeInMillis(st / 1000L)
        cal.set(java.util.Calendar.HOUR_OF_DAY, 0)
        cal.set(java.util.Calendar.MINUTE, 0)
        cal.set(java.util.Calendar.SECOND, 0)
        cal.set(java.util.Calendar.MILLISECOND, 0)
        while (cal.get(java.util.Calendar.DAY_OF_WEEK) !=
          java.util.Calendar.MONDAY) cal.add(java.util.Calendar.DATE, -1)
        val wk = new java.sql.Date(cal.getTimeInMillis).toString
        wk -> (pt - st) / 60000000L // whole minutes from exact µs
      }
    }.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    got.foreach { case (wk, n, p50, p90) =>
      val xs = lats(wk)
      assert(n === xs.length.toLong, wk)
      def kth(p: Int): Long = xs(((p * xs.length + 99) / 100) - 1)
      assert(p50 === kth(50), s"$wk p50")
      assert(p90 === kth(90), s"$wk p90")
    }
  }
}
