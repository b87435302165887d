package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity5

class Similarity5Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val vecs: Seq[(Long, Array[Float], Int)] =
    Tables.embeddings(spark, TestSpark.tiny)
      .select("vec_id", "embedding", "label")
      .as[(Long, Array[Float], Int)].collect().toSeq

  private def isEval(id: Long) = id % 20 == 0 && id < 10000
  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("hard negatives ≡ driver-side top-5 wrong-label by cosine") {
    val queries = vecs.filter(v => isEval(v._1))
    val corpus = vecs.filterNot(v => isEval(v._1))
    val got = Similarity5.hardNegatives.run(spark, TestSpark.tiny)
      .select("q_id", "rank", "neg_id", "neg_label", "cos")
      .as[(Long, Long, Long, Int, Double)].collect()
      .groupBy(_._1)
    assert(got.keySet === queries.map(_._1).toSet)
    queries.foreach { case (qid, qe, ql) =>
      val ref = corpus.filter(_._3 != ql)
        .map(c => (c._1, c._3, cos(qe, c._2)))
        .sortBy(r => (-r._3, r._1)).take(5)
      val g = got(qid).sortBy(_._2)
      assert(g.map(_._3).toSeq === ref.map(_._1), s"neg ids for $qid")
      g.zip(ref).foreach { case ((_, _, _, nl, c), (_, rl, rc)) =>
        assert(nl === rl)
        assert(math.abs(c - rc) < 1e-12)
      }
    }
  }

  test("margin audit ≡ driver-side best-positive vs best-negative") {
    val queries = vecs.filter(v => isEval(v._1))
    val corpus = vecs.filterNot(v => isEval(v._1))
    val got = Similarity5.marginAudit.run(spark, TestSpark.tiny)
      .select("q_id", "pos_sim", "neg_sim", "margin", "violated")
      .as[(Long, Double, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    queries.foreach { case (qid, qe, ql) =>
      val (pos, neg) = corpus.partition(_._3 == ql)
      val refPos = pos.map(c => cos(qe, c._2)).max
      val refNeg = neg.map(c => cos(qe, c._2)).max
      val (_, p, n, m, v) = got(qid)
      assert(math.abs(p - refPos) < 1e-12 && math.abs(n - refNeg) < 1e-12)
      assert(m === p - n)
      assert(v === (m < 0.0))
    }
  }

  test("dim variance ≡ driver-side fixed-point moments") {
    val got = Similarity5.dimVariance.run(spark, TestSpark.tiny)
      .select("dim", "n", "mean", "variance", "min_val", "max_val")
      .as[(Long, Long, Double, Double, Double, Double)].collect()
    assert(got.length === 64)
    val scale = 1048576.0
    got.foreach { case (dim, n, mean, variance, mn, mx) =>
      val vs = vecs.map(v =>
        math.floor(v._2(dim.toInt - 1).toDouble * scale + 0.5).toLong)
      assert(n === vs.size.toLong)
      val sv = vs.map(BigInt(_)).sum
      val svv = vs.map(v => BigInt(v) * BigInt(v)).sum
      assert(math.abs(mean - sv.toDouble / n / scale) < 1e-12)
      val refVar = (n.toDouble * svv.toDouble - sv.toDouble * sv.toDouble) /
        (n.toDouble * n.toDouble * scale * scale)
      assert(math.abs(variance - refVar) < 1e-12)
      assert(mn === vs.min.toDouble / scale && mx === vs.max.toDouble / scale)
      assert(variance >= 0.0)
    }
  }
}
