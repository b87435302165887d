package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis9

class TextAnalysis9Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs: Seq[(Long, String, Array[String])] =
    Tables.documents(spark, TestSpark.tiny)
      .select("doc_id", "source", "text")
      .as[(Long, String, String)].collect()
      .map(r => (r._1, r._2, r._3.trim.split(" "))).toSeq

  test("lexical diversity ≡ driver-side frequency spectrum") {
    val got = TextAnalysis9.lexicalDiversity.run(spark, TestSpark.tiny)
      .select("doc_id", "n_tokens", "n_types", "n_hapax", "hapax_ratio",
        "simpson_d", "yule_k")
      .as[(Long, Long, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    docs.foreach { case (id, _, ws) =>
      val f = ws.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val n = ws.length.toLong
      val (_, gn, gt, gh, ghr, gsd, gyk) = got(id)
      assert(gn === n && gt === f.size.toLong)
      val hapax = f.values.count(_ == 1L).toLong
      assert(gh === hapax)
      assert(ghr === hapax.toDouble / f.size)
      val sff1 = f.values.map(v => v * (v - 1)).sum
      val sff = f.values.map(v => v * v).sum
      assert(math.abs(gsd -
        (if (n >= 2) sff1.toDouble / (n.toDouble * (n - 1.0)) else 0.0))
        < 1e-12)
      assert(math.abs(gyk -
        10000.0 * (sff - n).toDouble / (n.toDouble * n.toDouble)) < 1e-9)
    }
  }

  test("phrase search ≡ driver-side adjacent-token scan") {
    val got = TextAnalysis9.phraseSearch.run(spark, TestSpark.tiny)
      .select("phrase", "n_docs", "n_occurrences", "first_doc")
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet === Set("hash join", "table scan", "spark table",
      "fast join"))
    got.keySet.foreach { p =>
      val Array(w1, w2) = p.split(' ')
      val perDoc = docs.map { case (id, _, ws) =>
        id -> ws.sliding(2).count(s =>
          s.length == 2 && s(0) == w1 && s(1) == w2).toLong
      }.filter(_._2 > 0)
      val (_, nd, no, fd) = got(p)
      assert(nd === perDoc.size.toLong, s"docs for $p")
      assert(no === perDoc.map(_._2).sum, s"occurrences for $p")
      assert(fd === (if (perDoc.isEmpty) None
                     else Some(perDoc.map(_._1).min)))
    }
  }

  test("source vocab overlap ≡ driver-side type-set Jaccard") {
    val vocab = docs.groupBy(_._2).view
      .mapValues(_.flatMap(_._3).toSet).toMap
    val got = TextAnalysis9.sourceVocabOverlap.run(spark, TestSpark.tiny)
      .select("source_a", "source_b", "types_a", "types_b", "n_common",
        "jaccard")
      .as[(String, String, Long, Long, Long, Double)].collect()
    val pairs = for {
      a <- vocab.keys.toSeq; b <- vocab.keys.toSeq if a < b
      if (vocab(a) & vocab(b)).nonEmpty
    } yield (a, b)
    assert(got.map(r => (r._1, r._2)).toSet === pairs.toSet)
    got.foreach { case (a, b, ta, tb, nc, j) =>
      assert(ta === vocab(a).size.toLong && tb === vocab(b).size.toLong)
      val common = (vocab(a) & vocab(b)).size.toLong
      assert(nc === common)
      assert(j === common.toDouble / (ta + tb - common).toDouble)
    }
  }
}
