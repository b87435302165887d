package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventAnalytics11

class EventAnalytics11Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val rows: Seq[(String, Long, Long, Long)] =
    Tables.events(spark, TestSpark.tiny)
      .select(col("event_type"),
        floor(col("value") * 10000.0 + 0.5).cast("long").as("v4"),
        col("user_id"), (weekday(col("ts").cast("date")) + 1).cast("long"))
      .as[(String, Long, Long, Long)].collect().toSeq

  test("Student t ≡ driver-side pooled-variance formula") {
    val byType = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val base = byType("view")
    val got = EventAnalytics11.q128StudentTtest.run(spark, TestSpark.tiny)
      .select("event_type", "n1", "n2", "mean_diff", "pooled_var", "t_stat")
      .as[(String, Long, Long, Double, Double, Double)].collect()
    assert(got.map(_._1).toSet === byType.keySet - "view")
    got.foreach { case (t, n1, n2, md, pv, ts) =>
      val xs = byType(t)
      assert(n1 === xs.size.toLong && n2 === base.size.toLong)
      def moments(v: Seq[Long]) =
        (v.map(BigInt(_)).sum, v.map(x => BigInt(x) * BigInt(x)).sum)
      val (s1, ss1) = moments(xs); val (s2, ss2) = moments(base)
      val refMd = (s1.toDouble / n1 - s2.toDouble / n2) / 1e4
      val css1 = ss1.toDouble - s1.toDouble * s1.toDouble / n1
      val css2 = ss2.toDouble - s2.toDouble * s2.toDouble / n2
      val refPv = (css1 + css2) / (n1 + n2 - 2) / 1e8
      assert(math.abs(md - refMd) < 1e-9)
      assert(math.abs(pv - refPv) < math.abs(refPv) * 1e-9)
      val refT = refMd / math.sqrt(refPv * (1.0 / n1 + 1.0 / n2))
      assert(math.abs(ts - refT) < math.abs(refT).max(1e-6) * 1e-9)
    }
  }

  test("dow chi2 ≡ driver-side (7·Σo²−n²)/n over all 7 cells") {
    val got = EventAnalytics11.q129DowChi2.run(spark, TestSpark.tiny)
      .select("event_type", "n", "n_days", "chi2", "reject_uniform")
      .as[(String, Long, Long, Double, Boolean)].collect()
    val byType = rows.groupBy(_._1)
    assert(got.map(_._1).toSet === byType.keySet)
    got.foreach { case (t, n, nd, chi2, rej) =>
      val counts = byType(t).groupBy(_._4).view.mapValues(_.size.toLong)
      assert(n === byType(t).size.toLong && nd === counts.size.toLong)
      val ss = counts.values.map(c => BigInt(c) * BigInt(c)).sum
      val ref = (7.0 * ss.toDouble - n.toDouble * n.toDouble) / n
      assert(math.abs(chi2 - ref) < 1e-9)
      assert(rej === (chi2 > 12.592))
      // algebra check vs the per-cell definition (7 cells, zeros incl.)
      val e = n.toDouble / 7.0
      val cellSum = (1L to 7L).map(d =>
        math.pow(counts.getOrElse(d, 0L).toDouble - e, 2) / e).sum
      assert(math.abs(chi2 - cellSum) < 1e-6)
    }
  }

  test("audience overlap ≡ driver-side user-set Jaccard") {
    val users = rows.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val got = EventAnalytics11.q130AudienceOverlap.run(spark, TestSpark.tiny)
      .select("type_a", "type_b", "users_a", "users_b", "n_common",
        "jaccard")
      .as[(String, String, Long, Long, Long, Double)].collect()
    val expected = for {
      a <- users.keys.toSeq; b <- users.keys.toSeq
      if a < b && (users(a) & users(b)).nonEmpty
    } yield (a, b)
    assert(got.map(r => (r._1, r._2)).toSet === expected.toSet)
    got.foreach { case (a, b, ua, ub, nc, j) =>
      assert(ua === users(a).size.toLong && ub === users(b).size.toLong)
      val common = (users(a) & users(b)).size.toLong
      assert(nc === common)
      assert(j === common.toDouble / (ua + ub - common).toDouble)
    }
  }
}
