package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PortableLn

/** [[graft.functions.PortableLn]]: the all-IEEE staged ln used for
  * cross-engine score parity (text_bm25). Checks accuracy against
  * Math.log over the BM25 idf argument range and edge points. */
class PortableLnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ulpsApart(a: Double, b: Double): Long =
    math.abs(java.lang.Double.doubleToLongBits(a) -
      java.lang.Double.doubleToLongBits(b))

  test("portable ln is within 4 ulps of Math.log across the idf range") {
    // BM25 idf arguments: x = (n - df + 0.5)/(df + 0.5) + 1 for corpus
    // sizes up to 10^7, plus generic coverage from just-above-1 to 2^40
    val args =
      (1 to 2000).map(df => (1e7 - df + 0.5) / (df + 0.5) + 1.0) ++
      (1 to 1000).map(i => 1.0 + i / 1000.0) ++
      Seq(1.0, 1.0000000001, 2.0, 4.0, 8.0, 1023.5, 65536.0, 1e12, math.pow(2, 40)) ++
      (1 to 100).map(i => math.exp(i / 5.0)) ++
      // sub-1 range (PMI ratios): down-ladder coverage
      (1 to 1000).map(i => i / 1000.0) ++
      Seq(0.5, 0.25, 0.125, 1e-6, 1e-12, 2.3e-10, 0.7071, 0.9999999999) ++
      (1 to 100).map(i => math.exp(-i / 5.0))
    val in = args.toDF("x")
    val out = PortableLn.withLn(in, "x", "lnx")
      .select("x", "lnx").as[(Double, Double)].collect()
    out.foreach { case (x, got) =>
      val exp = math.log(x)
      assert(ulpsApart(got, exp) <= 4,
        s"ln($x): portable=$got jvm=$exp ulps=${ulpsApart(got, exp)}")
    }
  }

  test("ln(1) = 0 and exact powers of two hit e*ln2") {
    val out = PortableLn.withLn(Seq(1.0, 2.0, 1024.0).toDF("x"), "x", "lnx")
      .select("x", "lnx").as[(Double, Double)].collect().toMap
    assert(out(1.0) == 0.0)
    assert(math.abs(out(2.0) - math.log(2.0)) < 1e-15)
    assert(math.abs(out(1024.0) - 10 * math.log(2.0)) < 1e-14)
  }

  test("sql mirror stage structure references the same constants") {
    val sql = PortableLn.sqlStages("src", Seq("k"))
    // the stage ladder, √2 stage, series depth and ln2 constant all present
    assert(sql.contains("4294967296.0::DOUBLE"))
    assert(sql.contains("1.4142135623730951::DOUBLE"))
    assert(sql.contains("1.0::DOUBLE / 25.0::DOUBLE")) // innermost term (N=12)
    assert(sql.contains("0.6931471805599453::DOUBLE"))
  }
}
