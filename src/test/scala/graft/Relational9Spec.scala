package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{EventAnalytics8, Relational9}

class Relational9Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q113 with-fill: spine is complete, filled rows interpolate linearly") {
    val got = EventAnalytics8.q113WithFill.run(spark, TestSpark.tiny)
      .select("event_type", "day", "n_events", "filled", "avg_value")
      .as[(String, java.sql.Date, Long, Boolean, Double)].collect()
    val byType = got.groupBy(_._1)
    byType.foreach { case (_, rows) =>
      val days = rows.map(_._2.toLocalDate.toEpochDay).sorted
      // spine completeness: consecutive days, endpoints present (unfilled)
      assert(days.zip(days.tail).forall { case (a, b) => b == a + 1 })
      val sorted = rows.sortBy(_._2.toLocalDate.toEpochDay)
      assert(!sorted.head._4 && !sorted.last._4)
      // every filled row sits on the segment between nearest present rows
      sorted.zipWithIndex.filter(_._1._4).foreach { case ((_, d, n, _, v), i) =>
        assert(n === 0L)
        val prev = sorted.take(i).reverse.find(!_._4).get
        val next = sorted.drop(i + 1).find(!_._4).get
        val x0 = prev._2.toLocalDate.toEpochDay.toDouble
        val x1 = next._2.toLocalDate.toEpochDay.toDouble
        val x = d.toLocalDate.toEpochDay.toDouble
        val ref = prev._5 + (next._5 - prev._5) * ((x - x0) / (x1 - x0))
        assert(math.abs(v - ref) < 1e-9, s"interp at $d")
      }
    }
  }

  test("q114 Benford: observed counts sum to n, tvd in [0,1)") {
    val total = Tables.orders(spark, TestSpark.tiny).count()
    val got = Relational9.q114Benford.run(spark, TestSpark.tiny)
      .select("priority", "digit", "obs", "expected", "tvd")
      .as[(String, Long, Long, Double, Double)].collect()
    assert(got.length === got.map(r => (r._1, r._2)).distinct.length)
    assert(got.map(_._3).sum === total)
    got.groupBy(_._1).foreach { case (p, rows) =>
      assert(rows.length === 9, s"9 digits for $p")
      val n = rows.map(_._3).sum.toDouble
      // expected counts track n within the rounded-constant error
      assert(math.abs(rows.map(_._4).sum - n) < 1e-4 * n)
      assert(rows.map(_._5).distinct.length === 1)
      assert(rows.head._5 >= 0.0 && rows.head._5 < 1.0)
    }
  }

  test("q115 Gini ≡ driver-side rank formula") {
    val rev = Tables.orders(spark, TestSpark.tiny)
      .join(Tables.customer(spark, TestSpark.tiny),
        col("c_custkey") === col("o_custkey"))
      .select(col("c_mktsegment"), col("c_custkey"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("cents"))
      .groupBy("c_mktsegment", "c_custkey").agg(sum("cents").as("cents"))
      .as[(String, Long, Long)].collect()
    val got = Relational9.q115Gini.run(spark, TestSpark.tiny)
      .select("segment", "n", "total_revenue", "gini")
      .as[(String, Long, Double, Double)].collect()
    assert(got.map(_._1).sorted.toSeq === rev.map(_._1).distinct.sorted.toSeq)
    got.foreach { case (seg, n, tot, gini) =>
      val xs = rev.filter(_._1 == seg).sortBy(r => (r._3, r._2)).map(_._3)
      assert(n === xs.length.toLong)
      val s = xs.map(BigInt(_)).sum
      assert(tot === s.toDouble / 100.0)
      val t = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
      val ref = (2.0 * t.toDouble - (n + 1.0) * s.toDouble) /
        (n.toDouble * s.toDouble)
      assert(math.abs(gini - ref) < 1e-12 && gini >= 0.0 && gini < 1.0)
    }
  }

  test("q116 association rules ≡ driver-side pair counting") {
    val op = Tables.lineitem(spark, TestSpark.tiny)
      .select(col("l_orderkey"), col("l_partkey"))
      .distinct().as[(Long, Long)].collect()
    val orders = op.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val nOrders = orders.size.toLong
    val partCnt = op.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairCnt = orders.values.flatMap(ps =>
      for { i <- ps.indices; j <- (i + 1) until ps.length }
        yield (ps(i), ps(j)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= 3)
    val got = Relational9.q116AssocRules.run(spark, TestSpark.tiny)
      .select("antecedent", "consequent", "n_both", "support", "confidence",
        "lift")
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    assert(got.length === 2 * pairCnt.size)
    got.foreach { case (a, b, nb, sup, conf, lift) =>
      val key = if (a < b) (a, b) else (b, a)
      assert(pairCnt(key) === nb)
      assert(sup === nb.toDouble / nOrders.toDouble)
      assert(conf === nb.toDouble / partCnt(a).toDouble)
      assert(lift === nb.toDouble * nOrders.toDouble /
        (partCnt(a).toDouble * partCnt(b).toDouble))
    }
  }

  test("q117 RFM: tile arithmetic ≡ SQL NTILE, populations conserve") {
    // the exact-NTILE derivation must reproduce front-loaded buckets
    for (n <- Seq(1, 4, 5, 7, 8, 23, 100)) {
      val q = n / 5; val r = n % 5
      val ref = (1 to n).map { rn =>
        var acc = 0; var tile = 0
        val sizes = (1 to 5).map(i => if (i <= r) q + 1 else q)
        sizes.zipWithIndex.foreach { case (sz, i) =>
          if (tile == 0 && rn <= acc + sz) tile = i + 1
          acc += sz
        }
        tile
      }
      val viaFormula = (1 to n).map { rn =>
        if (rn <= r * (q + 1)) (rn - 1) / (q + 1) + 1
        else r + (rn - r * (q + 1) - 1) / q + 1
      }
      assert(viaFormula === ref, s"NTILE split at n=$n")
    }
    val nCust = Tables.orders(spark, TestSpark.tiny)
      .select("o_custkey").distinct().count()
    val got = Relational9.q117Rfm.run(spark, TestSpark.tiny)
      .select("rfm_cell", "n_customers", "total_monetary")
      .as[(String, Long, Double)].collect()
    assert(got.map(_._2).sum === nCust)
    assert(got.forall(r => r._1.length == 3 &&
      r._1.forall(c => c >= '1' && c <= '5')))
  }

  test("q117 stacked single-pass ranks ≡ three plain NTILE windows") {
    // r17 rewrite equivalence: the (which, key, ck) union two-pass with
    // rank = grn − which·n must reproduce EXACTLY what three separate
    // NTILE(5) windows over (recency|frequency|cents, ck) produce —
    // checked cell-for-cell on the tiny corpus (single-task windows are
    // fine at test scale; the production query may never use them)
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(spark, TestSpark.tiny)
    val mx = o.agg(max(col("o_orderdate").cast("date")).as("mxd"))
    val c = o.crossJoin(broadcast(mx))
      .groupBy(col("o_custkey").as("ck"))
      .agg(
        datediff(max("mxd"), max(col("o_orderdate").cast("date")))
          .cast("long").as("recency"),
        count(lit(1)).as("frequency"),
        sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
          .as("cents"))
    val ref = c
      .withColumn("r", lit(6L) -
        ntile(5).over(Window.orderBy(col("recency"), col("ck"))).cast("long"))
      .withColumn("f",
        ntile(5).over(Window.orderBy(col("frequency"), col("ck"))).cast("long"))
      .withColumn("m",
        ntile(5).over(Window.orderBy(col("cents"), col("ck"))).cast("long"))
      .groupBy(concat(col("r").cast("string"), col("f").cast("string"),
        col("m").cast("string")).as("rfm_cell"))
      .agg(count(lit(1)).as("n_customers"),
        (sum(col("cents").cast("decimal(38,0)")).cast("double") / 100.0)
          .as("total_monetary"))
      .select("rfm_cell", "n_customers", "total_monetary")
      .as[(String, Long, Double)].collect().sortBy(_._1)
    val got = Relational9.q117Rfm.run(spark, TestSpark.tiny)
      .select("rfm_cell", "n_customers", "total_monetary")
      .as[(String, Long, Double)].collect().sortBy(_._1)
    assert(got === ref)
  }
}
