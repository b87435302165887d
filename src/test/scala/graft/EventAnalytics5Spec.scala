package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventAnalytics5

class EventAnalytics5Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val rows: Map[String, Seq[(Long, Long)]] =
    Tables.events(spark, TestSpark.tiny)
      .select(col("event_type"),
        floor(col("value") * 10000.0 + 0.5).cast("long").as("v4"),
        (get_json_object(col("props"), "$.k").cast("bigint") + 1).as("w"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1)
      .view.mapValues(_.map(r => (r._2, r._3)).toSeq).toMap

  test("q98 weighted quantiles ≡ driver-side exact weighted selection") {
    def wq(vs: Seq[(Long, Long)], pct: Long): Long = {
      val tot = vs.map(_._2).sum
      val sorted = vs.groupBy(_._1).view.mapValues(_.map(_._2).sum)
        .toSeq.sortBy(_._1)
      var cum = 0L
      sorted.find { case (_, w) =>
        cum += w; 100 * cum >= pct * tot }.get._1
    }
    val got = EventAnalytics5.q98WeightedQuantile
      .run(spark, TestSpark.tiny)
      .select("event_type", "w_total", "wq50", "wq90")
      .as[(String, Long, Double, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (t, wTot, q50, q90) =>
      val vs = rows(t)
      assert(wTot === vs.map(_._2).sum)
      assert(q50 === wq(vs, 50).toDouble / 10000.0, s"p50 for $t")
      assert(q90 === wq(vs, 90).toDouble / 10000.0, s"p90 for $t")
      assert(q50 <= q90)
    }
    // weights must bind: some unweighted median differs from the
    // weighted one (else the fixture degenerates to plain quantiles)
    val unweighted = rows.view.mapValues { vs =>
      val flat = vs.map(_._1).sorted
      flat((flat.size - 1) / 2)
    }.toMap
    assert(got.exists { case (t, _, q50, _) =>
      math.abs(q50 - unweighted(t).toDouble / 10000.0) > 1e-9 })
  }

  test("q99 Welch t-test ≡ driver-side exact-moment computation") {
    def moments(vs: Seq[Long]): (Long, Double, Double) = {
      val n = vs.size.toLong
      val sy = vs.map(BigInt(_)).sum
      val syy = vs.map(v => BigInt(v) * BigInt(v)).sum
      val mean = sy.toDouble / n.toDouble / 10000.0
      val sv = (BigInt(n) * syy - sy * sy).toDouble /
        (n * (n - 1)).toDouble / 100000000.0
      (n, mean, sv)
    }
    val (bn, bmean, bsv) = moments(rows("view").map(_._1))
    val got = EventAnalytics5.q99WelchTtest.run(spark, TestSpark.tiny)
      .select("event_type", "n", "t_stat", "welch_df")
      .as[(String, Long, Double, Double)].collect()
    assert(got.nonEmpty && !got.exists(_._1 == "view"))
    got.foreach { case (t, n, tStat, df) =>
      val (wn, mean, sv) = moments(rows(t).map(_._1))
      assert(n === wn)
      val svn = sv / n.toDouble
      val bsvn = bsv / bn.toDouble
      assert(tStat === (mean - bmean) / math.sqrt(svn + bsvn), s"t for $t")
      assert(df ===
        (svn + bsvn) * (svn + bsvn) /
          (svn * svn / (n - 1).toDouble + bsvn * bsvn / (bn - 1).toDouble),
        s"df for $t")
      // Welch df is bounded by min(n1,n2)-1 below and n1+n2-2 above
      assert(df >= math.min(n, bn).toDouble - 1 - 1e-9)
      assert(df <= (n + bn).toDouble - 2 + 1e-9)
    }
  }

  test("q100 Cramér's V ≡ driver-side exact-contingency chi-square") {
    val cells = Tables.events(spark, TestSpark.tiny)
      .select(col("event_type"),
        (get_json_object(col("props"), "$.k").cast("bigint") % 10).as("b"))
      .as[(String, Long)].collect()
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rt = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val ct = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val nn = cells.values.sum
    val terms = cells.toSeq.sortBy(_._1).map { case ((t, b), o) =>
      val dev = BigInt(o) * BigInt(nn) - BigInt(rt(t)) * BigInt(ct(b))
      (dev * dev).toDouble / (nn * rt(t) * ct(b)).toDouble
    }
    val chi2 = terms.foldLeft(0.0)(_ + _)
    val v = math.sqrt(chi2 /
      (nn * (math.min(rt.size, ct.size) - 1)).toDouble)
    val row = EventAnalytics5.q100CramersV.run(spark, TestSpark.tiny)
      .select("n", "n_types", "n_buckets", "chi2", "cramers_v")
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(row.length === 1)
    assert(row(0)._1 === nn)
    assert(row(0)._2 === rt.size.toLong && row(0)._3 === ct.size.toLong)
    assert(row(0)._4 === chi2)
    assert(row(0)._5 === v)
    assert(v >= 0.0 && v <= 1.0)
  }
}
