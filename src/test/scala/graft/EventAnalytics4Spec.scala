package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventAnalytics4

class EventAnalytics4Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q91 uniqUpTo saturates at N+1 and is exact below the cap") {
    val got = EventAnalytics4.q91UniqUpTo.run(spark, TestSpark.tiny)
      .select("event_type", "uniq_users_upto", "uniq_k_upto")
      .as[(String, Long, Long)].collect()
    val exact = Tables.events(spark, TestSpark.tiny)
      .select(col("event_type"), col("user_id"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1)
      .view.mapValues(rs =>
        (rs.map(_._2).distinct.size.toLong, rs.map(_._3).distinct.size.toLong))
      .toMap
    assert(got.nonEmpty)
    got.foreach { case (t, uu, uk) =>
      val (eu, ek) = exact(t)
      assert(uu === math.min(eu, 51L), s"users for $t")
      assert(uk === math.min(ek, 11L), s"k for $t")
    }
    // fixture discriminates: at least one group saturates the k cap and
    // at least one count sits below its cap somewhere in either column
    assert(got.exists(_._3 == 11L), "no group saturates the k cap")
  }

  test("q92 deltaSum ≡ driver-side positive-step fold") {
    val byUser = Tables.events(spark, TestSpark.tiny)
      .select(col("user_id"), unix_micros(col("ts")).as("t"), col("event_id"),
        floor(col("value") * 10000.0 + 0.5).cast("long").as("v4"))
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1)
      .view.mapValues(_.sortBy(e => (e._2, e._3)).map(_._4)).toMap
    val want = byUser.view.mapValues { vs =>
      vs.zip(vs.tail).map { case (a, b) => math.max(0L, b - a) }.sum
    }.toMap
    val got = EventAnalytics4.q92DeltaSum.run(spark, TestSpark.tiny)
      .select(col("user_id"),
        floor(col("delta_sum") * 10000.0 + 0.5).cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(got === want)
    assert(want.values.exists(_ > 0L), "degenerate fixture: all-zero deltas")
  }

  test("q93 sumMap strings are key-sorted and parallel") {
    // since r08 the parallel arrays are serialized to comma-joined
    // canonical strings (the driver comparator cannot sort containers)
    val rows = EventAnalytics4.q93SumMap.run(spark, TestSpark.tiny)
      .select("user_id", "keys", "counts", "sums")
      .as[(Long, String, String, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (u, keysS, countsS, sumsS) =>
      val keys   = keysS.split(',').toSeq
      val counts = countsS.split(',').toSeq.map(_.toLong)
      val sums   = sumsS.split(',').toSeq.map(BigDecimal(_))
      assert(keys == keys.sorted, s"user $u keys unsorted")
      assert(keys.distinct == keys, s"user $u duplicate keys")
      assert(keys.size == counts.size && keys.size == sums.size)
      // DECIMAL(28,4) fixed-scale rendering: every sum has 4 dp
      sumsS.split(',').foreach(v => assert(v.matches("-?\\d+\\.\\d{4}"), v))
    }
    // cross-check the flattened count total against the plain groupBy
    val counts = rows.map(_._3.split(',').map(_.toLong).sum).sum
    val n = Tables.events(spark, TestSpark.tiny).count()
    assert(counts === n)
  }

  test("q94 maxIntersections ≡ brute-force per-user interval overlap peak") {
    val iv = Tables.events(spark, TestSpark.tiny)
      .select(col("user_id"), unix_micros(col("ts")).as("st"),
        (unix_micros(col("ts")) + lit(3600L * 1000000L) *
          (lit(1L) + get_json_object(col("props"), "$.k").cast("bigint") % 60))
          .as("en"))
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1)
      .view.mapValues(_.map(r => (r._2, r._3)).toSeq).toMap
    // peak concurrency = max over all starts of the count of intervals
    // containing that start (half-open [s, e))
    val want = iv.view.mapValues { ivs =>
      ivs.map { case (s0, _) =>
        ivs.count { case (s, e) => s <= s0 && s0 < e }.toLong
      }.max
    }.toMap
    val got = EventAnalytics4.q94MaxIntersections.run(spark, TestSpark.tiny)
      .select("user_id", "max_concurrent").as[(Long, Long)].collect().toMap
    assert(got === want)
    assert(want.values.exists(_ > 1L), "degenerate fixture: no overlaps")
  }

  test("q95 boundingRatio ≡ driver-side endpoint rate (µs-exact)") {
    val byUser = Tables.events(spark, TestSpark.tiny)
      .select(col("user_id"), unix_micros(col("ts")).as("t"), col("event_id"),
        floor(col("value") * 10000.0 + 0.5).cast("long").as("v4"))
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1)
      .view.mapValues(_.sortBy(e => (e._2, e._3))).toMap
    val want = byUser.view.mapValues { es =>
      val (t0, _, v0) = (es.head._2, es.head._3, es.head._4)
      val (t1, _, v1) = (es.last._2, es.last._3, es.last._4)
      if (t1 > t0) Some(((v1 - v0) * 360000L).toDouble / (t1 - t0).toDouble)
      else None
    }.toMap
    val got = EventAnalytics4.q95BoundingRatio.run(spark, TestSpark.tiny)
      .select("user_id", "rate_per_hour").as[(Long, Option[Double])]
      .collect().toMap
    assert(got === want)
    assert(want.values.flatten.exists(_ != 0.0))
  }

  test("q96 intervalLengthSum ≡ brute-force union length per user") {
    val iv = Tables.events(spark, TestSpark.tiny)
      .select(col("user_id"), unix_micros(col("ts")).as("st"),
        (unix_micros(col("ts")) + lit(3600L * 1000000L) *
          (lit(1L) + get_json_object(col("props"), "$.k").cast("bigint") % 60))
          .as("en"))
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1)
      .view.mapValues(_.map(r => (r._2, r._3)).toSeq).toMap
    // brute force: merge sorted intervals, sum merged lengths
    val want = iv.view.mapValues { ivs =>
      val sorted = ivs.sortBy(_._1)
      var covered = 0L; var curS = sorted.head._1; var curE = sorted.head._2
      sorted.tail.foreach { case (s0, e0) =>
        if (s0 > curE) { covered += curE - curS; curS = s0; curE = e0 }
        else if (e0 > curE) curE = e0
      }
      covered + (curE - curS)
    }.toMap
    val got = EventAnalytics4.q96IntervalLengthSum.run(spark, TestSpark.tiny)
      .select("user_id", "covered_us").as[(Long, Long)].collect().toMap
    assert(got === want)
    // union length must be < sum of raw lengths somewhere (overlap binds)
    val raw = iv.view.mapValues(_.map(p => p._2 - p._1).sum).toMap
    assert(want.exists { case (u, c) => c < raw(u) })
  }

  test("q97 linear regression ≡ driver-side exact normal equations") {
    val pts = Tables.events(spark, TestSpark.tiny)
      .select(col("event_type"),
        (expr("unix_micros(ts) div 3600000000") - 473352L).as("x"),
        floor(col("value") * 10000.0 + 0.5).cast("long").as("y"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1)
      .view.mapValues(_.map(r => (BigInt(r._2), BigInt(r._3)))).toMap
    val got = EventAnalytics4.q97LinearRegression.run(spark, TestSpark.tiny)
      .select("event_type", "n", "slope_per_hour", "intercept", "corr")
      .as[(String, Long, Double, Double, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (t, n, slope, intercept, corr) =>
      val ps = pts(t)
      assert(n === ps.size)
      val bn = BigInt(ps.size)
      val sx = ps.map(_._1).sum; val sy = ps.map(_._2).sum
      val sxx = ps.map(p => p._1 * p._1).sum
      val sxy = ps.map(p => p._1 * p._2).sum
      val syy = ps.map(p => p._2 * p._2).sum
      val num = bn * sxy - sx * sy
      val denx = bn * sxx - sx * sx
      val deny = bn * syy - sy * sy
      val wSlope = num.toDouble / denx.toDouble / 10000.0
      assert(slope === wSlope, s"slope for $t")
      assert(intercept ===
        (sy.toDouble / 10000.0 - wSlope * sx.toDouble) / n.toDouble,
        s"intercept for $t")
      assert(corr ===
        num.toDouble / math.sqrt(denx.toDouble * deny.toDouble),
        s"corr for $t")
      assert(corr >= -1.0000001 && corr <= 1.0000001)
    }
  }
}
