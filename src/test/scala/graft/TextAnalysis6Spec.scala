package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis6

/** Independent plain-Scala recomputation of the corpus-health reports
  * (KL drift, logistic quality filter, n-gram novelty) on sf0.001.
  */
class TextAnalysis6Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def docs(): Seq[(Long, String, String)] =
    Tables.documents(spark, sf).selectExpr("doc_id", "text", "source")
      .collect().toSeq.map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  private def words(t: String): Seq[String] = t.trim.split(" ", -1).toSeq

  test("text_kl_drift matches a plain-Scala reference") {
    val d = docs()
    val wc = collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    for ((_, t, src) <- d; w <- words(t)) wc((src, w)) += 1
    val corpus = wc.groupBy(_._1._2).map { case (w, m) => w -> m.values.sum }
    val head = corpus.toSeq.sortBy { case (w, c) => (-c, w) }.take(256)
    val headSet = head.map(_._1).toSet
    val n = head.map(_._2).sum
    val sources = d.map(_._3).distinct.sorted
    val expected = sources.map { src =>
      val ns = headSet.toSeq.map(w => wc((src, w))).sum
      val kl = head.map { case (w, cw) =>
        val p = (wc((src, w)) + 1).toDouble / (ns + 256)
        val q = (cw + 1).toDouble / (n + 256)
        p * math.log(p / q)
      }.sum
      (src, ns, kl)
    }
    val got = TextAnalysis6.klDrift.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(_._1) === expected.map(_._1))
    assert(got.map(_._2) === expected.map(_._2))
    for (((_, _, g), (_, _, e)) <- got.zip(expected))
      assert(math.abs(g - e) < 1e-9)
  }

  test("text_quality_logreg matches a plain-Scala reference") {
    val stopSet = Set("the", "a", "of", "and")
    val expected = docs().sortBy(_._1).map { case (id, t, _) =>
      val ws = words(t)
      val nw = ws.length
      val ttr = ws.distinct.length.toDouble / nw
      val awl = ws.map(_.length.toLong).sum.toDouble / nw
      val stop = ws.count(stopSet).toDouble / nw
      val score = -1.5 + 0.012 * nw + 2.0 * ttr + -0.15 * awl + 0.8 * stop
      (id, score, score > 0.0)
    }
    val got = TextAnalysis6.qualityLogit.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSeq
    assert(got.map(_._1) === expected.map(_._1))
    assert(got.map(_._3) === expected.map(_._3))
    for (((_, g, _), (_, e, _)) <- got.zip(expected))
      assert(math.abs(g - e) < 1e-12)
  }

  test("text_zipf_fit matches a plain-Scala OLS") {
    val wc = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for ((_, t, _) <- docs(); w <- words(t)) wc(w) += 1
    val head = wc.toSeq.sortBy { case (w, c) => (-c, w) }.take(256)
    val pts = head.zipWithIndex.map { case ((_, c), i) =>
      (math.log((i + 1).toDouble), math.log(c.toDouble))
    }
    val n = pts.size.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val intercept = sy / n - slope * (sx / n)
    val got = TextAnalysis6.zipfFit.run(spark, sf).collect()(0)
    assert(got.getLong(0) === pts.size.toLong)
    assert(math.abs(got.getDouble(1) - slope) < 1e-9)
    assert(math.abs(got.getDouble(2) - intercept) < 1e-9)
    // a word-frequency corpus should actually be Zipf-ish: negative slope
    assert(got.getDouble(1) < -0.1)
  }

  test("text_length_histogram matches a plain-Scala reference") {
    val counts = collection.mutable.Map.empty[(String, Long), Long]
      .withDefaultValue(0L)
    for ((_, t, src) <- docs()) {
      val bits = java.lang.Long.toBinaryString(words(t).length.toLong).length
      counts((src, bits.toLong)) += 1
    }
    val totals = counts.groupBy(_._1._1)
      .map { case (s, m) => s -> m.values.sum }
    val expected = counts.toSeq.sortBy(_._1).map { case ((s, b), n) =>
      (s, b, n, n.toDouble / totals(s))
    }
    val got = TextAnalysis6.lengthHistogram.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got === expected)
  }

  test("text_rouge_pairs matches a plain-Scala reference") {
    val d = docs()
    val byId = d.map(x => x._1 -> x._2).toMap
    val pairs = graft.operators.Dedup
      .jaccardPairs(Tables.documents(spark, sf))
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    def uni(id: Long): Set[String] = words(byId(id)).toSet
    val expected = pairs.sorted.map { case (a, b) =>
      val (ua, ub) = (uni(a), uni(b))
      val inter = (ua & ub).size.toLong
      val p = inter.toDouble / ua.size
      val r = inter.toDouble / ub.size
      (a, b, inter, p, r, 2.0 * p * r / (p + r))
    }
    val got = TextAnalysis6.rougePairs.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got.map(g => (g._1, g._2, g._3)) ===
      expected.map(e => (e._1, e._2, e._3)))
    for ((g, e) <- got.zip(expected)) {
      assert(math.abs(g._4 - e._4) < 1e-12)
      assert(math.abs(g._5 - e._5) < 1e-12)
      assert(math.abs(g._6 - e._6) < 1e-12)
    }
  }

  test("text_ngram_novelty matches a plain-Scala reference") {
    val d = docs()
    def grams(t: String): Seq[String] = {
      val w = words(t)
      if (w.length < 8) Seq.empty else w.sliding(8).map(_.mkString(" ")).toSeq
    }
    val firstDoc = collection.mutable.Map.empty[String, Long]
    for ((id, t, _) <- d.sortBy(_._1); g <- grams(t))
      if (!firstDoc.contains(g)) firstDoc(g) = id
    val expected = d.sortBy(_._1).flatMap { case (id, t, _) =>
      val gs = grams(t)
      if (gs.isEmpty) None
      else {
        val novel = gs.count(g => firstDoc(g) == id).toLong
        Some((id, gs.length.toLong, novel, novel.toDouble / gs.length))
      }
    }
    val got = TextAnalysis6.ngramNovelty.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got === expected)
  }
}
