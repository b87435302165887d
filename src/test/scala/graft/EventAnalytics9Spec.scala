package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventAnalytics9

class EventAnalytics9Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** zero-filled daily ×10⁴ totals per type, driver-side */
  private lazy val series: Map[String, Seq[Long]] =
    Tables.events(spark, TestSpark.tiny)
      .select(col("event_type"), col("ts").cast("date").as("day"),
        floor(col("value") * 10000.0 + 0.5).cast("long").as("v4"))
      .as[(String, java.sql.Date, Long)].collect()
      .groupBy(_._1).view.mapValues { rows =>
        val byDay = rows.groupBy(_._2.toLocalDate.toEpochDay)
          .view.mapValues(_.map(_._3).sum).toMap
        val lo = byDay.keys.min; val hi = byDay.keys.max
        (lo to hi).map(d => byDay.getOrElse(d, 0L))
      }.toMap

  test("q118 ACF ≡ driver-side Pearson at each lag; peak marked once") {
    val got = EventAnalytics9.q118Autocorr.run(spark, TestSpark.tiny)
      .select("event_type", "lag", "n_pairs", "acf", "is_peak")
      .as[(String, Long, Long, Double, Boolean)].collect()
    got.groupBy(_._1).foreach { case (t, rows) =>
      val xs = series(t)
      rows.foreach { case (_, k, n, acf, _) =>
        val pairs = xs.dropRight(k.toInt).zip(xs.drop(k.toInt))
        assert(n === pairs.length.toLong)
        val nn = pairs.length.toDouble
        val sx = pairs.map(_._1).map(BigInt(_)).sum.toDouble
        val sy = pairs.map(_._2).map(BigInt(_)).sum.toDouble
        val sxx = pairs.map(p => BigInt(p._1) * BigInt(p._1)).sum.toDouble
        val syy = pairs.map(p => BigInt(p._2) * BigInt(p._2)).sum.toDouble
        val sxy = pairs.map(p => BigInt(p._1) * BigInt(p._2)).sum.toDouble
        val ref = (nn * sxy - sx * sy) /
          (math.sqrt(nn * sxx - sx * sx) * math.sqrt(nn * syy - sy * sy))
        assert(math.abs(acf - ref) < 1e-9, s"acf $t lag $k")
      }
      // exactly one peak, at the max-ACF smallest lag
      val peaks = rows.filter(_._5)
      assert(peaks.length === 1)
      val best = rows.filter(r => r._4 == rows.map(_._4).max).map(_._2).min
      assert(peaks.head._2 === best)
    }
  }

  test("q119 MAD outliers ≡ driver-side modified z-score") {
    val byType = Tables.events(spark, TestSpark.tiny)
      .select(col("event_type"),
        floor(col("value") * 10000.0 + 0.5).cast("long").as("v4"))
      .as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def lowerMedian(vs: Seq[Long]): Long = {
      val sorted = vs.sorted
      sorted((vs.size - 1) / 2)
    }
    val got = EventAnalytics9.q119MadOutliers.run(spark, TestSpark.tiny)
      .select("event_type", "n", "median", "mad", "n_outliers")
      .as[(String, Long, Double, Double, Long)].collect()
    assert(got.map(_._1).toSet === byType.keySet)
    got.foreach { case (t, n, med, mad, nOut) =>
      val vs = byType(t)
      assert(n === vs.size.toLong)
      val m = lowerMedian(vs)
      assert(med === m.toDouble / 10000.0)
      val md = lowerMedian(vs.map(v => math.abs(v - m)))
      assert(mad === md.toDouble / 10000.0)
      val ref = vs.count(v => 6745L * math.abs(v - m) > 35000L * md).toLong
      assert(nOut === ref, s"outliers for $t")
    }
  }

  test("q120 decomposition: trend+seasonal+residual reassemble the raw " +
    "series and seasonal means zero-ish per dow cycle") {
    val got = EventAnalytics9.q120SeriesDecompose.run(spark, TestSpark.tiny)
      .select("event_type", "day", "raw", "trend", "seasonal", "residual")
      .as[(String, java.sql.Date, Double, Option[Double], Double,
        Option[Double])].collect()
    got.foreach { case (_, _, raw, trend, seasonal, residual) =>
      assert(trend.isDefined === residual.isDefined)
      trend.zip(residual).foreach { case (tr, re) =>
        assert(math.abs(raw - tr - seasonal - re) < 1e-9)
      }
    }
    // trend ≡ driver-side centered 7-day MA on rows where it exists
    got.groupBy(_._1).foreach { case (t, rows) =>
      val xs = series(t)
      val sorted = rows.sortBy(_._2.toLocalDate.toEpochDay)
      sorted.zipWithIndex.foreach { case ((_, day, raw, trend, _, _), _) =>
        val i = (day.toLocalDate.toEpochDay -
          sorted.head._2.toLocalDate.toEpochDay).toInt
        assert(math.abs(raw - xs(i).toDouble / 10000.0) < 1e-9)
        if (i >= 3 && i < xs.length - 3) {
          val ref = (i - 3 to i + 3).map(xs(_)).map(BigInt(_)).sum.toDouble /
            7.0 / 10000.0
          assert(math.abs(trend.get - ref) < 1e-9, s"trend $t idx $i")
        } else assert(trend.isEmpty)
      }
    }
  }
}
