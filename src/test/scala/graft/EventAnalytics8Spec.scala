package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{EventAnalytics6, EventAnalytics8}

class EventAnalytics8Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val byType: Map[String, Seq[Long]] =
    Tables.events(spark, TestSpark.tiny)
      .select(col("event_type"),
        floor(col("value") * 10000.0 + 0.5).cast("long").as("v4"))
      .as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap

  test("q110 Tukey fences ≡ driver-side exact quartile selection") {
    def lowerQ(vs: Seq[Long], num: Long, den: Long): Long = {
      val sorted = vs.sorted
      val n = vs.size.toLong
      sorted(((0 until vs.size).find(i =>
        den * (i + 1) >= num * n)).get)
    }
    val got = EventAnalytics8.q110TukeyOutliers.run(spark, TestSpark.tiny)
      .select("event_type", "n", "q1", "q3", "n_outliers", "outlier_frac")
      .as[(String, Long, Double, Double, Long, Double)].collect()
    assert(got.map(_._1).toSet === byType.keySet)
    got.foreach { case (t, n, q1, q3, nOut, frac) =>
      val vs = byType(t)
      assert(n === vs.size.toLong)
      val q1i = lowerQ(vs, 1, 4); val q3i = lowerQ(vs, 3, 4)
      assert(q1 === q1i.toDouble / 10000.0, s"q1 for $t")
      assert(q3 === q3i.toDouble / 10000.0, s"q3 for $t")
      val iqr = q3i - q1i
      val refOut = vs.count(v =>
        2 * v < 2 * q1i - 3 * iqr || 2 * v > 2 * q3i + 3 * iqr).toLong
      assert(nOut === refOut, s"outliers for $t")
      assert(frac === nOut.toDouble / n.toDouble)
    }
  }

  test("q111 KS ≡ driver-side supremum over merged ECDFs") {
    val base = byType("view")
    val got = EventAnalytics8.q111KsTest.run(spark, TestSpark.tiny)
      .select("event_type", "n1", "n2", "ks_d", "ks_at", "ks_z")
      .as[(String, Long, Long, Double, Double, Double)].collect()
    assert(got.nonEmpty && !got.exists(_._1 == "view"))
    got.foreach { case (t, n1, n2, ksD, ksAt, ksZ) =>
      val vs = byType(t)
      assert(n1 === vs.size.toLong && n2 === base.size.toLong)
      val domain = (vs ++ base).distinct.sorted
      val devs = domain.map { v =>
        val c1 = vs.count(_ <= v).toLong; val c2 = base.count(_ <= v).toLong
        (v, (BigInt(c1) * n2 - BigInt(c2) * n1).abs)
      }
      val dMax = devs.map(_._2).max
      val at = devs.find(_._2 == dMax).get._1
      assert(ksD === dMax.toDouble / (n1.toDouble * n2.toDouble), s"D for $t")
      assert(ksAt === at.toDouble / 10000.0, s"at for $t")
      assert(ksZ >= ksD && !ksZ.isNaN)
    }
  }

  test("q112 AUC ≡ U/(n1·n2) from q101 and ∈ [0,1]") {
    val u = EventAnalytics6.q101MannWhitney.run(spark, TestSpark.tiny)
      .select("event_type", "n1", "n2", "u_stat")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val got = EventAnalytics8.q112Auc.run(spark, TestSpark.tiny)
      .select("event_type", "n1", "n2", "auc")
      .as[(String, Long, Long, Double)].collect()
    assert(got.map(_._1).toSet === u.keySet)
    got.foreach { case (t, n1, n2, auc) =>
      val (un1, un2, uStat) = u(t)
      assert(n1 === un1 && n2 === un2)
      assert(math.abs(auc - uStat / (n1.toDouble * n2.toDouble)) < 1e-12)
      assert(auc >= 0.0 && auc <= 1.0)
    }
  }
}
