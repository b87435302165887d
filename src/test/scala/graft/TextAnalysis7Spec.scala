package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis7

class TextAnalysis7Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** tiny-SF corpus, driver-side */
  private lazy val docs: Seq[Seq[String]] =
    Tables.documents(spark, TestSpark.tiny)
      .select("text").as[String].collect()
      .map(_.trim.split(" ").toSeq).toSeq

  test("text_kneser_ney ≡ plain-Scala KN with D = 3/4 (probabilities in " +
    "(0, 1], top-50 by bigram count)") {
    val uni = docs.flatten.groupBy(identity).view.mapValues(_.size.toLong)
    val bigrams = docs.flatMap(ws => ws.zip(ws.tail).map(p => s"${p._1} ${p._2}"))
    val bc = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val types = bc.keySet.map { b =>
      val i = b.indexOf(' '); (b.substring(0, i), b.substring(i + 1))
    }
    val rgt = types.groupBy(_._1).view.mapValues(_.size.toLong)
    val lft = types.groupBy(_._2).view.mapValues(_.size.toLong)
    val t = bc.size.toLong
    val got = TextAnalysis7.kneserNey.run(spark, TestSpark.tiny)
      .select("bigram", "c_ab", "c_v", "n1p_right", "n1p_left", "pkn")
      .as[(String, Long, Long, Long, Long, Double)].collect()
    assert(got.length === 50)
    got.foreach { case (b, cab, cv, nr, nl, pkn) =>
      val i = b.indexOf(' ')
      val (v, w) = (b.substring(0, i), b.substring(i + 1))
      assert(cab === bc(b))
      assert(cv === uni(v))
      assert(nr === rgt(v) && nl === lft(w))
      val want = (math.max(4 * cab - 3, 0L) * t + 3L * nr * nl).toDouble /
        (4L * cv * t).toDouble
      assert(pkn === want, s"bigram $b")
      assert(pkn > 0.0 && pkn <= 1.0)
    }
    // KN interpolation must be visible: the continuation term makes
    // p_kn differ from the plain MLE c_ab/c_v on every returned row
    assert(got.forall { case (_, cab, cv, _, _, pkn) =>
      math.abs(pkn - cab.toDouble / cv) > 0 })
  }

  test("text_burstiness ≡ plain-Scala VMR over per-doc counts with zeros") {
    val n = docs.size.toLong
    val perDoc = docs.zipWithIndex.flatMap { case (ws, i) =>
      ws.groupBy(identity).map { case (w, g) => (w, g.size.toLong) }
    }
    val stats = perDoc.groupBy(_._1).map { case (w, cs) =>
      val counts = cs.map(_._2)
      (w, (counts.sum, counts.map(c => c * c).sum, counts.size.toLong))
    }
    val got = TextAnalysis7.burstiness.run(spark, TestSpark.tiny)
      .select("tok", "c_tot", "df", "vmr")
      .as[(String, Long, Long, Double)].collect()
    assert(got.length === 30)
    got.foreach { case (tok, cTot, df, vmr) =>
      val (wTot, s2, wDf) = stats(tok)
      assert(cTot === wTot && df === wDf)
      assert(vmr === (n * s2 - cTot * cTot).toDouble / (n * cTot).toDouble)
      // population variance is nonnegative; VMR = 0 only if the word
      // appears exactly once in every doc
      assert(vmr >= 0.0)
    }
    // the fixture discriminates: top words are not all Poisson-flat
    assert(got.exists(_._4 > 1.0))
  }

  test("text_oov_rate ≡ plain-Scala split trigram-OOV computation") {
    def trigrams(ws: Seq[String]): Seq[String] =
      if (ws.size < 3) Seq.empty
      else ws.sliding(3).map(_.mkString(" ")).toSeq
    val all = Tables.documents(spark, TestSpark.tiny)
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => (id, trigrams(t.trim.split(" ").toSeq)) }
    val vocab = all.filter(_._1 % 50 != 0).flatMap(_._2).toSet
    val want = all.filter(_._1 % 50 == 0).map { case (id, gs) =>
      id -> ((gs.size.toLong, gs.count(g => !vocab.contains(g)).toLong))
    }.toMap
    val got = TextAnalysis7.oovRate.run(spark, TestSpark.tiny)
      .select("doc_id", "n_trigrams", "n_oov")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === want)
    assert(want.nonEmpty)
    // the fixture discriminates: some OOV exists, but not everything
    assert(want.values.exists(_._2 > 0L))
    assert(want.values.exists(v => v._2 < v._1))
  }
}
