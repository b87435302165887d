package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Similarity, Similarity6}

class Similarity6Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sim_pca_power ≡ driver-side exact-integer power iteration") {
    val vecs = Tables.embeddings(spark, TestSpark.tiny)
      .select("embedding").as[Array[Float]].collect()
    // sketch + quantize exactly as the query does
    val q = vecs.map(v => Similarity.jlProject(v.toIndexedSeq)
      .map(y => math.floor(y * 1048576.0 + 0.5).toLong).toArray)
    val n = BigInt(q.length)
    val dim = 16
    val sv = (0 until dim).map(i => q.map(r => BigInt(r(i))).sum)
    val c = Array.tabulate(dim, dim) { (i, j) =>
      val spp = q.map(r => BigInt(r(i)) * BigInt(r(j))).sum
      n * spp - sv(i) * sv(j)
    }
    val vs = BigInt(65536)
    var v = Array.fill(dim)(vs)
    var lastV = v; var lastMv = v
    for (_ <- 1 to 5) {
      lastV = v
      val mv = Array.tabulate(dim)(i =>
        (0 until dim).map(j => c(i)(j) * v(j)).sum)
      lastMv = mv
      val m = mv.map(_.abs).max
      v = mv.map(x =>
        if (x >= 0) (x.abs * vs) / m else -((x.abs * vs) / m))
    }
    val sgnHost = v.find(_ != 0).map(x => if (x > 0) 1 else -1).getOrElse(1)
    val dd = v.map(x => x * x).sum
    val d4 = lastV.map(x => x * x).sum
    val num = (0 until dim).map(i => lastV(i) * lastMv(i)).sum
    val refComp = v.map(x =>
      (BigInt(sgnHost) * x).toDouble / math.sqrt(dd.toDouble))
    val refEig = num.toDouble /
      (d4.toDouble * n.toDouble * n.toDouble * 1048576.0 * 1048576.0)

    val got = Similarity6.pcaPower.run(spark, TestSpark.tiny)
      .select("dim", "component", "eigenvalue", "n")
      .as[(Long, Double, Double, Long)].collect().sortBy(_._1)
    assert(got.length === dim && got.head._4 === q.length.toLong)
    got.foreach { case (d, comp, eig, _) =>
      assert(comp === refComp(d.toInt), s"component $d")
      assert(math.abs(eig - refEig) < math.abs(refEig) * 1e-12)
    }
    // spectral sanity: unit norm; λ between mean and total variance
    val norm = got.map(r => r._2 * r._2).sum
    assert(math.abs(norm - 1.0) < 1e-6)
    val trace = (0 until dim).map(i =>
      c(i)(i).toDouble / (n.toDouble * n.toDouble * 1048576.0 * 1048576.0))
      .sum
    val eig = got.head._3
    assert(eig >= trace / dim - 1e-12 && eig <= trace + 1e-12)
  }
}
