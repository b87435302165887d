package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational10

class Relational10Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ABC Pareto ≡ driver-side ranked cumulative bucketing") {
    val rev = Tables.lineitem(spark, TestSpark.tiny)
      .groupBy("l_partkey")
      .agg(sum(floor(col("l_extendedprice") * 100.0 + 0.5).cast("long"))
        .as("cents"))
      .as[(Long, Long)].collect()
    val sorted = rev.sortBy(r => (-r._2, r._1))
    val tot = sorted.map(r => BigInt(r._2)).sum
    var cum = BigInt(0)
    val byCls = sorted.map { case (_, c) =>
      cum += c
      val cls = if (100 * cum <= 80 * tot) "A"
      else if (100 * cum <= 95 * tot) "B" else "C"
      (cls, c)
    }.groupBy(_._1)
    val got = Relational10.q126AbcPareto.run(spark, TestSpark.tiny)
      .select("cls", "n_parts", "revenue", "revenue_share")
      .as[(String, Long, Double, Double)].collect()
    assert(got.map(_._1).sorted.toSeq === byCls.keys.toSeq.sorted)
    got.foreach { case (cls, n, revD, share) =>
      val ref = byCls(cls)
      assert(n === ref.length.toLong, s"count for $cls")
      val cents = ref.map(r => BigInt(r._2)).sum
      assert(revD === cents.toDouble / 100.0)
      assert(math.abs(share - cents.toDouble / tot.toDouble) < 1e-12)
    }
    assert(math.abs(got.map(_._4).sum - 1.0) < 1e-9)
  }

  test("new vs returning ≡ driver-side first-day split") {
    val du = Tables.events(spark, TestSpark.tiny)
      .select(col("ts").cast("date").as("day"), col("user_id"))
      .distinct().as[(java.sql.Date, Long)].collect()
      .map(r => (r._1.toLocalDate.toEpochDay, r._2))
    val firstDay = du.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    val got = Relational10.q127NewVsReturning.run(spark, TestSpark.tiny)
      .select("day", "n_active", "n_new", "n_returning", "pct_new")
      .as[(java.sql.Date, Long, Long, Long, Double)].collect()
    val byDay = du.groupBy(_._1)
    assert(got.map(_._1.toLocalDate.toEpochDay).toSet === byDay.keySet)
    got.foreach { case (d, act, nw, ret, pct) =>
      val day = d.toLocalDate.toEpochDay
      val users = byDay(day).map(_._2)
      assert(act === users.size.toLong)
      val refNew = users.count(u => firstDay(u) == day).toLong
      assert(nw === refNew && ret === act - refNew)
      assert(pct === refNew.toDouble / act)
    }
    // every user is new exactly once across all days
    assert(got.map(_._3).sum === firstDay.size.toLong)
  }
}
