package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventAnalytics6

class EventAnalytics6Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val byType: Map[String, Seq[(Long, Long, Long, Double)]] =
    Tables.events(spark, TestSpark.tiny)
      .select(col("event_type"),
        floor(col("value") * 10000.0 + 0.5).cast("long").as("v4"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k"),
        unix_micros(col("ts")).as("xs"), col("event_id"), col("value"))
      .as[(String, Long, Long, Long, Long, Double)].collect()
      .groupBy(_._1)
      .view.mapValues(_.map(r => (r._2, r._3, r._4, r._6)).toSeq).toMap

  test("q101 U statistic ≡ brute-force pairwise comparison vs 'view'") {
    val base = byType("view").map(_._1)
    val got = EventAnalytics6.q101MannWhitney.run(spark, TestSpark.tiny)
      .select("event_type", "n1", "n2", "u_stat", "z_stat")
      .as[(String, Long, Long, Double, Double)].collect()
    assert(got.nonEmpty && !got.exists(_._1 == "view"))
    got.foreach { case (t, n1, n2, u, z) =>
      val vs = byType(t).map(_._1)
      assert(n1 === vs.size.toLong && n2 === base.size.toLong)
      // U = #(a > b) + ½·#(a = b) over the full sample cross product
      val u2Brute = (for (a <- vs; b <- base) yield
        if (a > b) 2L else if (a == b) 1L else 0L).sum
      assert(u === u2Brute.toDouble / 2.0, s"U for $t")
      assert(!z.isNaN && math.abs(z) < 50.0, s"z for $t")
    }
    // the tie correction must bind on the ×10⁴ grid (some equal values)
    val anyTies = got.exists { case (t, _, _, u, _) =>
      u != math.floor(u) ||
        byType(t).map(_._1).intersect(base).nonEmpty }
    assert(anyTies)
  }

  test("q102 rho ≡ driver-side midrank Pearson (1e-12)") {
    def midranks(xs: Seq[Long]): Map[Long, Double] = {
      val sorted = xs.groupBy(identity).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)
      var below = 0L
      sorted.map { case (v, c) =>
        val r = below + (c + 1).toDouble / 2.0
        below += c
        v -> r
      }.toMap
    }
    val got = EventAnalytics6.q102Spearman.run(spark, TestSpark.tiny)
      .select("event_type", "n", "spearman_rho")
      .as[(String, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (t, n, rho) =>
      assert(n === byType(t).size.toLong)
      val rv = midranks(byType(t).map(_._1))
      val rk = midranks(byType(t).map(_._2))
      val pairs = byType(t).map(r => (rv(r._1), rk(r._2)))
      val nn = pairs.size.toDouble
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val ref = (nn * sxy - sx * sy) /
        (math.sqrt(nn * sxx - sx * sx) * math.sqrt(nn * syy - sy * sy))
      assert(math.abs(rho - ref) < 1e-12, s"rho for $t: $rho vs $ref")
      assert(math.abs(rho) <= 1.0 + 1e-12)
    }
  }

  test("q103 LTTB: bounded output, global anchors, in-bucket maximality") {
    val got = EventAnalytics6.q103Lttb.run(spark, TestSpark.tiny)
      .select("event_type", "bucket", "ts", "value")
      .collect()
    val perType = got.groupBy(_.getString(0))
    assert(perType.keySet === byType.keySet)
    perType.foreach { case (t, rows) =>
      assert(rows.length <= 24, s"$t emits ≤ B points")
      // one row per distinct emitted bucket
      assert(rows.map(_.getLong(1)).distinct.length === rows.length)
      // anchors: the series' first and last timestamps survive
      val all = Tables.events(spark, TestSpark.tiny)
        .filter(col("event_type") === t)
        .select(unix_micros(col("ts"))).as[Long].collect()
      val gotUs = rows.map(r => {
        val tsv = r.getTimestamp(2)
        tsv.getTime / 1000 * 1000000 + tsv.getNanos / 1000
      })
      assert(gotUs.contains(all.min), s"$t keeps first point")
      assert(gotUs.contains(all.max), s"$t keeps last point")
    }
    // every emitted point's bucket matches its timestamp's bucket
    val b24 = EventAnalytics6.q103Lttb.run(spark, TestSpark.tiny)
    assert(b24.filter(col("bucket") < 0 || col("bucket") > 23).count() === 0)
  }

  test("q104 decayed sums ≡ driver-side exact dyadic weighting") {
    val got = EventAnalytics6.q104TimeDecayedSum.run(spark, TestSpark.tiny)
      .select("event_type", "n", "decayed_sum", "decayed_count", "decayed_avg")
      .as[(String, Long, Double, Double, Double)].collect()
    assert(got.map(_._1).toSet === byType.keySet)
    got.foreach { case (t, n, ds, dc, da) =>
      val vs = byType(t)
      assert(n === vs.size.toLong)
      val tmax = vs.map(_._3).max
      var ws = BigInt(0); var wc = BigInt(0)
      vs.foreach { case (v4, _, xs, _) =>
        val k = (tmax - xs) / 86400000000L
        if (k <= 50) {
          val w = BigInt(1) << (50 - k).toInt
          ws += BigInt(v4) * w; wc += w
        }
      }
      val p50 = 1125899906842624.0
      assert(ds === ws.toDouble / p50 / 10000.0, s"sum for $t")
      assert(dc === wc.toDouble / p50, s"count for $t")
      assert(da === ds / dc, s"avg for $t")
      // decay must bind: effective count strictly below the raw count
      assert(dc < n.toDouble && dc > 0.0)
    }
  }

  test("q105 next node ≡ driver-side per-user stream replay") {
    val streams = Tables.events(spark, TestSpark.tiny)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("xs"), col("event_id"))
      .as[(Long, String, Long, Long)].collect()
      .groupBy(_._1)
      .view.mapValues(_.sortBy(r => (r._3, r._4)).map(_._2).toSeq).toMap
    val ref = streams.values.flatMap { seq =>
      seq.sliding(2).zipWithIndex.collectFirst {
        case (Seq("view", "click"), i) =>
          if (i + 2 < seq.size) seq(i + 2) else "(end)"
      }
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = EventAnalytics6.q105SequenceNextNode.run(spark, TestSpark.tiny)
      .select("next_type", "n_users").as[(String, Long)].collect().toMap
    assert(got === ref)
    assert(got.values.sum <= streams.size.toLong)
  }

  test("q106 Theil's U: entropy bounds and driver-side H(T) (1e-12)") {
    val Seq((n, hT, hTb, u)) = EventAnalytics6.q106TheilsU
      .run(spark, TestSpark.tiny)
      .select("n", "h_t", "h_t_given_b", "theils_u")
      .as[(Long, Double, Double, Double)].collect().toSeq
    assert(n === byType.values.map(_.size).sum.toLong)
    val counts = byType.view.mapValues(_.size.toLong).values.toSeq
    val refH = -counts.map { c =>
      val p = c.toDouble / n.toDouble; p * math.log(p)
    }.sum
    assert(math.abs(hT - refH) < 1e-12)
    assert(hTb >= 0.0 && hTb <= hT + 1e-12)
    assert(u >= -1e-12 && u <= 1.0 + 1e-12)
  }
}
