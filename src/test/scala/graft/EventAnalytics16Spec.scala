package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{EventAnalytics16, Relational14}

/** Driver-side recomputation of the round-10 stats batch on the tiny
  * SF: every statistic is rebuilt from collected rows with independent
  * (naive) arithmetic and compared within float tolerance — the same
  * two-implementations discipline as the earlier EventAnalytics specs. */
class EventAnalytics16Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val evts: Array[(String, java.sql.Timestamp, Double)] =
    Tables.events(spark, TestSpark.tiny)
      .select(col("event_type"), col("ts"), col("value"))
      .as[(String, java.sql.Timestamp, Double)].collect()

  private def v4(x: Double): Long = math.floor(x * 10000.0 + 0.5).toLong

  private def anovaF(groups: Map[String, Array[Long]]): (Double, Double, Double) = {
    val k = groups.size
    val nn = groups.valuesIterator.map(_.length.toLong).sum
    val sd = groups.valuesIterator.map(_.map(BigInt(_)).sum).sum.toDouble
    val ssd = groups.valuesIterator
      .map(_.map(v => BigInt(v) * BigInt(v)).sum).sum.toDouble
    val a = groups.toSeq.sortBy(_._1).map { case (_, vs) =>
      val s = vs.map(BigInt(_)).sum.toDouble
      s * s / vs.length
    }.foldLeft(0.0)(_ + _)
    val ssb = a - sd * sd / nn
    val ssw = ssd - a
    (ssb / 1e8, ssw / 1e8, (ssb / (k - 1)) / (ssw / (nn - k)))
  }

  test("q163 ANOVA F ≡ driver-side recomputation from raw events") {
    val got = EventAnalytics16.q163AnovaF.run(spark, TestSpark.tiny)
      .as[(Long, Long, Double, Double, Double)].collect().head
    val groups = evts.groupBy(_._1).view.mapValues(_.map(r => v4(r._3))).toMap
    val (ssb, ssw, f) = anovaF(groups)
    assert(got._1 === groups.size.toLong)
    assert(got._2 === evts.length.toLong)
    assert(math.abs(got._3 - ssb) <= 1e-9 * math.abs(ssb))
    assert(math.abs(got._4 - ssw) <= 1e-9 * math.abs(ssw))
    assert(math.abs(got._5 - f) <= 1e-9 * math.abs(f))
  }

  test("q164 Kendall tau-b ≡ exact driver-side pair loop over the " +
    "daily spine") {
    val got = EventAnalytics16.q164KendallTau.run(spark, TestSpark.tiny)
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect().head
    val daily = evts.groupBy(r => r._2.getTime / 86400000L).toSeq
      .map { case (dd, rows) =>
        (dd, rows.map(r => BigInt(v4(r._3))).sum, rows.length.toLong)
      }.sortBy(_._1)
    var c = 0L; var dis = 0L; var tx = 0L; var ty = 0L; var n0 = 0L
    for (i <- daily.indices; j <- (i + 1) until daily.length) {
      val cx = daily(j)._2.compare(daily(i)._2).sign
      val cy = daily(j)._3.compare(daily(i)._3).sign
      n0 += 1
      if (cx * cy > 0) c += 1
      if (cx * cy < 0) dis += 1
      if (cx == 0) tx += 1
      if (cy == 0) ty += 1
    }
    assert(got._1 === daily.length.toLong)
    assert((got._2, got._3, got._4, got._5, got._6) === ((n0, c, dis, tx, ty)))
    val tau = (c - dis) / math.sqrt((n0 - tx).toDouble * (n0 - ty).toDouble)
    assert(math.abs(got._7 - tau) <= 1e-12)
  }

  test("q165 Cohen's d / Hedges' g ≡ driver-side effect sizes") {
    val got = EventAnalytics16.q165CohensD.run(spark, TestSpark.tiny)
      .as[(String, Long, Long, Double, Double)].collect()
    val groups = evts.groupBy(_._1).view.mapValues(_.map(r => v4(r._3))).toMap
    val base = groups("view")
    def moments(vs: Array[Long]) =
      (vs.length.toLong, vs.map(BigInt(_)).sum,
        vs.map(v => BigInt(v) * BigInt(v)).sum)
    val (n2, s2, ss2) = moments(base)
    assert(got.nonEmpty && got.forall(_._1 != "view"))
    got.foreach { case (t, gn1, gn2, d, g) =>
      val (n1, s1, ss1) = moments(groups(t))
      assert((gn1, gn2) === ((n1, n2)))
      val meanDiff = (s1.toDouble / n1 - s2.toDouble / n2) / 10000.0
      val css1 = ss1.toDouble - s1.toDouble * s1.toDouble / n1
      val css2 = ss2.toDouble - s2.toDouble * s2.toDouble / n2
      val pooled = (css1 + css2) / (n1 + n2 - 2) / 1e8
      val dRef = meanDiff / math.sqrt(pooled)
      val gRef = dRef * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0))
      assert(math.abs(d - dRef) <= 1e-9 * math.abs(dRef), t)
      assert(math.abs(g - gRef) <= 1e-9 * math.abs(gRef), t)
    }
  }

  test("q166 Brown–Forsythe ≡ ANOVA F on |v − lower-median| driver-side") {
    val got = EventAnalytics16.q166LeveneBf.run(spark, TestSpark.tiny)
      .as[(Long, Long, Double, Double, Double)].collect().head
    val groups = evts.groupBy(_._1).view.mapValues(_.map(r => v4(r._3))).toMap
    val z = groups.map { case (t, vs) =>
      val sorted = vs.sorted
      val med = sorted(((vs.length + 1) / 2) - 1) // lower median, rank ⌈n/2⌉
      t -> vs.map(v => math.abs(v - med))
    }
    val (ssb, ssw, w) = anovaF(z)
    assert(got._1 === groups.size.toLong)
    assert(got._2 === evts.length.toLong)
    assert(math.abs(got._3 - ssb) <= 1e-9 * math.abs(ssb))
    assert(math.abs(got._4 - ssw) <= 1e-9 * math.abs(ssw))
    assert(math.abs(got._5 - w) <= 1e-9 * math.abs(w))
  }

  test("q168 HHI ≡ driver-side concentration over the joined chain; " +
    "bounds 10000/n ≤ HHI ≤ 10000 hold") {
    val got = EventAnalytics16.q168Hhi.run(spark, TestSpark.tiny)
      .as[(String, Long, Double, Double)].collect()
    val nat = Tables.nation(spark, TestSpark.tiny)
      .select("n_nationkey", "n_regionkey").as[(Long, Long)].collect().toMap
    val reg = Tables.region(spark, TestSpark.tiny)
      .select("r_regionkey", "r_name").as[(Long, String)].collect().toMap
    val cust = Tables.customer(spark, TestSpark.tiny)
      .select("c_custkey", "c_nationkey").as[(Long, Long)].collect().toMap
    val ords = Tables.orders(spark, TestSpark.tiny)
      .select("o_custkey", "o_totalprice").as[(Long, Double)].collect()
    val rev = ords.groupBy(o => (reg(nat(cust(o._1))), o._1))
      .view.mapValues(_.map(o =>
        BigInt(math.floor(o._2 * 100.0 + 0.5).toLong)).sum).toMap
    val byRegion = rev.groupBy(_._1._1)
    assert(got.length === byRegion.size)
    got.foreach { case (r, n, hhi, cr1) =>
      val cents = byRegion(r).values.toArray
      assert(n === cents.length.toLong)
      val tot = cents.sum.toDouble
      val hhiRef = 10000.0 * cents.map(c => c.toDouble * c.toDouble).sum /
        (tot * tot)
      val cr1Ref = cents.max.toDouble / tot
      assert(math.abs(hhi - hhiRef) <= 1e-9 * hhiRef, r)
      assert(math.abs(cr1 - cr1Ref) <= 1e-12, r)
      assert(hhi >= 10000.0 / n - 1e-9 && hhi <= 10000.0 + 1e-9, r)
    }
  }

  test("q169 price elasticity ≡ driver-side OLS on quantized log points") {
    val got = EventAnalytics16.q169PriceElasticity.run(spark, TestSpark.tiny)
      .as[(String, Long, Double, Double)].collect()
    val brand = Tables.part(spark, TestSpark.tiny)
      .select("p_partkey", "p_brand").as[(Long, String)].collect().toMap
    val li = Tables.lineitem(spark, TestSpark.tiny)
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .as[(Long, Double, Double)].collect()
    val pts = li.groupBy(l => brand(l._1)).view.mapValues(_.map { l =>
      (math.floor(math.log(l._3 / l._2) * 1e6 + 0.5).toLong,
        math.floor(math.log(l._2) * 1e6 + 0.5).toLong)
    }).toMap
    assert(got.length === pts.size)
    got.foreach { case (b, n, el, r2) =>
      val xs = pts(b)
      assert(n === xs.length.toLong)
      val nB = BigInt(xs.length)
      val sx = xs.map(p => BigInt(p._1)).sum
      val sy = xs.map(p => BigInt(p._2)).sum
      val sxx = xs.map(p => BigInt(p._1) * BigInt(p._1)).sum
      val sxy = xs.map(p => BigInt(p._1) * BigInt(p._2)).sum
      val syy = xs.map(p => BigInt(p._2) * BigInt(p._2)).sum
      val num = (nB * sxy - sx * sy).toDouble
      val denX = (nB * sxx - sx * sx).toDouble
      val denY = (nB * syy - sy * sy).toDouble
      // driver ln is StrictMath; the engine's is libm — a last-ulp
      // difference can flip a ×1e6 floor on rare arguments, so the
      // comparison is tolerance-based, not exact
      assert(math.abs(el - num / denX) <= 1e-6 * math.max(1.0,
        math.abs(num / denX)), b)
      assert(math.abs(r2 - num * num / (denX * denY)) <= 1e-6, b)
      assert(r2 >= 0.0 && r2 <= 1.0 + 1e-9, b)
    }
  }

  test("q170 min sample size ≡ driver-side two-proportion power formula; " +
    "monotone decreasing in baseline distance from 1/2") {
    val got = EventAnalytics16.q170MinSampleSize.run(spark, TestSpark.tiny)
      .as[(String, Long, Double, Double)].collect()
    val byType = evts.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val total = evts.length.toLong
    assert(got.length === byType.size)
    got.foreach { case (t, n, p1, nArm) =>
      assert(n === byType(t), t)
      val p1Ref = n.toDouble / total
      assert(math.abs(p1 - p1Ref) <= 1e-15, t)
      val p2 = p1Ref + 0.01
      val pBar = (p1Ref + p2) / 2.0
      val root = 1.9599639845400545 * math.sqrt(2.0 * pBar * (1.0 - pBar)) +
        0.8416212335729143 *
          math.sqrt(p1Ref * (1.0 - p1Ref) + p2 * (1.0 - p2))
      val ref = root * root / (0.01 * 0.01)
      assert(math.abs(nArm - ref) <= 1e-6 * ref, t)
      assert(nArm > 0, t)
    }
  }

  test("cdc_key_skew_audit: histogram partitions keys and traffic exactly") {
    val got = graft.operators.Cdc.keySkewAudit.run(spark, TestSpark.tiny)
      .as[(Long, Long, Long, Double)].collect()
    val byUser = Tables.events(spark, TestSpark.tiny)
      .select("user_id").as[Long].collect()
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val hist = byUser.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val total = byUser.values.sum
    assert(got.length === hist.size)
    got.foreach { case (c, nKeys, nChanges, share) =>
      assert(hist(c) === nKeys, s"c=$c")
      assert(nChanges === c * nKeys, s"c=$c")
      assert(math.abs(share - nChanges.toDouble / total) <= 1e-15, s"c=$c")
    }
    assert(got.map(_._2).sum === byUser.size.toLong,
      "histogram must partition the key set")
    assert(got.map(_._3).sum === total,
      "histogram must partition total traffic")
  }

  test("q167 ANY JOIN picks exactly the min-ordered line per order and " +
    "keeps every order") {
    val got = Relational14.q167AnyJoin.run(spark, TestSpark.tiny)
      .select("o_orderkey", "first_partkey", "first_quantity")
      .as[(Long, Option[Long], Option[Double])].collect()
    val li = Tables.lineitem(spark, TestSpark.tiny)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice")
      .as[(Long, Int, Long, Long, Double, Double)].collect()
    val first = li.groupBy(_._1).view.mapValues(
      _.minBy(l => (l._2, l._3, l._4, l._6))).toMap
    val nOrders = Tables.orders(spark, TestSpark.tiny).count()
    assert(got.length.toLong === nOrders, "LEFT: one row per order")
    got.foreach { case (ok, pk, qty) =>
      first.get(ok) match {
        case Some(l) =>
          assert(pk.contains(l._3), s"order $ok")
          assert(qty.contains(l._5), s"order $ok")
        case None =>
          assert(pk.isEmpty && qty.isEmpty, s"order $ok must be null-padded")
      }
    }
  }
}
