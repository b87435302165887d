package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{EventAnalytics12, Relational11}

class EventAnalytics12Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val evts: Array[(Long, java.sql.Timestamp, Long, String, Double)] =
    Tables.events(spark, TestSpark.tiny)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[(Long, java.sql.Timestamp, Long, String, Double)].collect()

  test("q132 sequence count ≡ driver-side adjacent-pair scan") {
    val got = EventAnalytics12.q132SequenceCount.run(spark, TestSpark.tiny)
      .as[(Long, Long)].collect().toMap
    val ref = evts.groupBy(_._3).view.mapValues { rows =>
      val ordered = rows.sortBy(r => (r._2.getTime, r._1)).map(_._4)
      ordered.sliding(2).count {
        case Array("view", "purchase") => true
        case _ => false
      }.toLong
    }.filter(_._2 > 0).toMap
    assert(got === ref)
  }

  test("q134 CUSUM peak ≡ driver-side exact integer scan, earliest tie") {
    val got = EventAnalytics12.q134CusumChangepoint.run(spark, TestSpark.tiny)
      .select("event_type", "pos", "s_peak", "direction")
      .as[(String, Long, Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val ref = evts.groupBy(_._4).view.mapValues { rows =>
      val vs = rows.sortBy(r => (r._2.getTime, r._1))
        .map(r => BigInt(math.floor(r._5 * 10000.0 + 0.5).toLong))
      val n = BigInt(vs.length)
      val sv = vs.sum
      var pv = BigInt(0)
      var best: (BigInt, Long) = (BigInt(-1), -1L) // (abs, pos)
      vs.zipWithIndex.foreach { case (v, i) =>
        pv += v
        val sp = n * pv - BigInt(i + 1) * sv
        if (sp.abs > best._1) best = (sp.abs, (i + 1).toLong)
      }
      val spAt = {
        var acc = BigInt(0)
        vs.take(best._2.toInt).foreach(acc += _)
        n * acc - best._2 * sv
      }
      (best._2, spAt.toLong, if (spAt >= 0) 1 else -1)
    }.toMap
    assert(got === ref)
  }

  test("q136 portable HLL ≡ driver-side register simulation") {
    val got = operators.EventAnalytics12.q136HllPortable
      .run(spark, TestSpark.tiny)
      .select("event_type", "n_exact", "v_empty", "s_fix", "est")
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    val byType = evts.groupBy(_._4)
    got.foreach { case (t, (_, nExact, vEmpty, sFix, est)) =>
      val users = byType(t).map(_._3).distinct
      assert(nExact === users.size.toLong)
      val regs = Array.fill(256)(0)
      byType(t).map(_._3).foreach { u =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(u.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(15)
        val hv = java.lang.Long.parseLong(hex, 16)
        val b = (hv % 256).toInt
        val r = hv / 256
        val rank = if (r == 0) 53 else 53 - (64 - java.lang.Long.numberOfLeadingZeros(r))
        if (rank > regs(b)) regs(b) = rank
      }
      assert(vEmpty === regs.count(_ == 0).toLong)
      assert(sFix === regs.map(m => 1L << (53 - m)).sum)
      // the estimate tracks truth within the m=256 error regime
      assert(math.abs(est - nExact) / nExact < 0.25, s"$t est=$est n=$nExact")
    }
    assert(got.nonEmpty)
  }

  test("q133 Cramér's V ≡ driver-side exact scaled χ²; v in [0, 1]") {
    val got = Relational11.q133CramersV.run(spark, TestSpark.tiny)
      .select("n", "k", "chi2_scaled", "cramers_v")
      .as[(Long, Long, Long, Double)].collect().head
    val pairs = Tables.orders(spark, TestSpark.tiny)
      .join(Tables.customer(spark, TestSpark.tiny),
        col("c_custkey") === col("o_custkey"))
      .select(col("o_orderpriority"), col("c_mktsegment"))
      .as[(String, String)].collect()
    val cells = pairs.groupBy(identity).view.mapValues(x => BigInt(x.length)).toMap
    val rt = pairs.groupBy(_._1).view.mapValues(x => BigInt(x.length)).toMap
    val ct = pairs.groupBy(_._2).view.mapValues(x => BigInt(x.length)).toMap
    val n = BigInt(pairs.length)
    val k = math.min(rt.size, ct.size).toLong
    val chi2 = cells.map { case ((a, b), nij) =>
      val dev = n * nij - rt(a) * ct(b)
      (BigInt(1000000000) * dev * dev) / (n * rt(a) * ct(b))
    }.sum
    assert(got._1 === n.toLong)
    assert(got._2 === k)
    assert(got._3 === chi2.toLong)
    val v = math.sqrt(chi2.toDouble / (1e9 * n.toDouble * (k - 1)))
    assert(got._4 === v)
    assert(got._4 >= 0.0 && got._4 <= 1.0)
  }
}
