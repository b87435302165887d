package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational12

class Relational12Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q140 information value ≡ driver-side WOE/IV (counts exact, " +
    "ln within 1 ulp)") {
    val got = Relational12.q140InformationValue.run(spark, TestSpark.tiny)
      .as[(String, Long, Long, Double, Double)].collect()
    assert(got.nonEmpty)
    val pairs = Tables.orders(spark, TestSpark.tiny)
      .join(Tables.customer(spark, TestSpark.tiny),
        col("c_custkey") === col("o_custkey"))
      .select(col("c_mktsegment"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .as[(String, Boolean)].collect()
    val gT = pairs.count(_._2).toLong
    val bT = pairs.size - gT
    got.foreach { case (seg, g, b, woe, iv) =>
      val refG = pairs.count(p => p._1 == seg && p._2).toLong
      val refB = pairs.count(p => p._1 == seg && !p._2).toLong
      assert(g === refG, seg)
      assert(b === refB, seg)
      val refWoe = math.log((refG.toDouble * bT) / (refB.toDouble * gT))
      assert(math.abs(woe - refWoe) < 1e-12, s"$seg woe")
      val refIv = ((refG.toDouble * bT - refB.toDouble * gT) /
        (gT.toDouble * bT)) * woe
      assert(math.abs(iv - refIv) < 1e-15, s"$seg iv")
    }
  }

  test("q141 tolerance ASOF ≡ brute force; lag bounded by the tolerance") {
    val got = Relational12.q141AsofTolerance.run(spark, TestSpark.tiny)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("t"),
        unix_micros(col("asof_signup_ts")).as("a"), col("lag_min"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))))
      .toMap
    assert(got.nonEmpty)
    val ev = Tables.events(spark, TestSpark.tiny)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t"))
      .as[(Long, Long, String, Long)].collect()
    val signups = ev.filter(_._3 == "signup").groupBy(_._2)
      .view.mapValues(_.map(_._4)).toMap
    val tolUs = 2880L * 60000000L
    ev.filter(_._3 == "purchase").foreach { case (eid, uid, _, t) =>
      val (_, gt, ga, glag) = got(eid)
      assert(gt === t)
      val best = signups.getOrElse(uid, Array.empty[Long])
        .filter(_ <= t).sorted.lastOption
      val expected = best.filter(a => t - a <= tolUs)
      assert(ga === expected, s"event $eid")
      assert(glag === expected.map(a => (t - a) / 60000000L), s"lag $eid")
      glag.foreach(l => assert(l <= 2880L))
    }
  }

  test("q142 sample-key audit ≡ driver-side md5 membership; " +
    "u_sampled consistent across types when user sets coincide") {
    val got = Relational12.q142SampleKeyAudit.run(spark, TestSpark.tiny)
      .select("event_type", "n_exact", "n_sampled", "n_est", "u_exact",
        "u_sampled", "u_est")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    def inSample(u: Long): Boolean = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) < 144115188075855872L
    }
    val ev = Tables.events(spark, TestSpark.tiny)
      .select("event_type", "user_id").as[(String, Long)].collect()
    got.foreach { case (t, nEx, nS, nEst, uEx, uS, uEst) =>
      val rows = ev.filter(_._1 == t)
      assert(nEx === rows.length.toLong)
      assert(nS === rows.count(r => inSample(r._2)).toLong)
      assert(nEst === 8 * nS)
      assert(uEx === rows.map(_._2).distinct.length.toLong)
      assert(uS === rows.map(_._2).distinct.count(inSample).toLong)
      assert(uEst === 8 * uS)
    }
  }
}
