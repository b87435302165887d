package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Similarity3, TextAnalysis5}

/** Independent driver-side recomputation of the round's data-selection
  * operators on the sf0.001 corpus: plain-Scala reference
  * implementations (no Spark, no shared helpers beyond the raw parquet
  * read) must agree with the distributed queries.
  */
class TextAnalysis5Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def docs(): Seq[(Long, String, String)] =
    Tables.documents(spark, sf).selectExpr("doc_id", "text", "lang")
      .collect().toSeq.map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  private def grams(text: String, n: Int): Seq[String] = {
    val w = text.trim.split(" ", -1).toSeq
    if (w.length < n) Seq.empty else w.sliding(n).map(_.mkString(" ")).toSeq
  }

  test("text_dsir_select matches a plain-Scala reference scorer") {
    val d = docs()
    val polyMod = 1000000007L
    def bkt(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % polyMod) % 256
    val all = d.map { case (id, t, lang) => (id, lang == "en", grams(t, 2)) }
    val cT = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val cR = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for ((_, isT, gs) <- all; g <- gs)
      if (isT) cT(bkt(g)) += 1 else cR(bkt(g)) += 1
    val nT = cT.values.sum; val nR = cR.values.sum
    // Math.log vs PortableLn differ by ≲1 ulp — irrelevant at 1e-9 tol
    def w(b: Long): Double =
      math.log(((cT(b) + 1).toDouble / (nT + 256)) /
        ((cR(b) + 1).toDouble / (nR + 256)))
    val expected = all.filterNot(_._2).collect {
      case (id, _, gs) if gs.nonEmpty =>
        (id, gs.length.toLong, gs.map(g => w(bkt(g))).sum / gs.length)
    }.sortBy { case (id, _, s) => (-s, id) }.take(100)

    val got = TextAnalysis5.dsirSelect.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(_._1) === expected.map(_._1))
    assert(got.map(_._2) === expected.map(_._2))
    for (((_, _, gs), (_, _, es)) <- got.zip(expected))
      assert(math.abs(gs - es) < 1e-9)
  }

  test("text_contamination_span matches a plain-Scala reference") {
    val d = docs()
    val hold = d.filter(_._1 % 50 == 0).flatMap(t => grams(t._2, 5)).toSet
    val expected = d.filter(_._1 % 50 != 0).flatMap { case (id, t, _) =>
      val hits = grams(t, 5).zipWithIndex.collect {
        case (g, i) if hold(g) => i + 1 // 1-based positions
      }
      if (hits.isEmpty) None
      else {
        // split hit positions into consecutive runs
        val runs = hits.foldLeft(List.empty[List[Int]]) {
          case (acc @ (cur :: rest), p) if p == cur.head + 1 =>
            (p :: cur) :: rest
          case (acc, p) => List(p) :: acc
        }.map(r => (r.length.toLong, r.last.toLong)) // (len, start)
        val best = runs.minBy { case (len, start) => (-len, start) }
        Some((id, hits.length.toLong, best._1, best._2))
      }
    }.sortBy(_._1)
    val got = TextAnalysis5.contaminationSpan.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === expected)
  }

  test("sim_knn_classify matches a plain-Scala brute-force k-NN") {
    val e = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "embedding", "label").collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Float](1).toIndexedSeq, r.getInt(2)))
    // sequential fold in array order — same arithmetic as DotProduct
    def dot(a: IndexedSeq[Float], b: IndexedSeq[Float]): Double =
      a.indices.foldLeft(0.0)((acc, i) =>
        acc + a(i).toDouble * b(i).toDouble)
    def cos(a: IndexedSeq[Float], b: IndexedSeq[Float]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    // mirror the registered eval-slice rule (every 20th AND below the
    // scale cap — the cap doesn't bind at sf0.001)
    val (qs, cs) = e.partition(v => v._1 % 20 == 0 && v._1 < 10000)
    val expected = qs.sortBy(_._1).map { case (qid, qe, ql) =>
      val top = cs.map { case (nid, ce, nl) => (nid, nl, cos(qe, ce)) }
        .sortBy { case (nid, _, s) => (-s, nid) }.take(5)
      val pred = top.groupBy(_._2).toSeq
        .map { case (l, v) => (l, v.size) }
        .minBy { case (l, v) => (-v, l) }._1
      (qid, ql, pred, pred == ql)
    }
    val got = Similarity3.knnClassify.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getBoolean(3)))
      .toSeq
    assert(got === expected)
  }
}
