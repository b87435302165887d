package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Similarity, Similarity4}

class Similarity4Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hamming-rerank recall@5 vs brute force is usable") {
    val exact = Similarity.topkBruteForce.run(spark, TestSpark.tiny)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val got = Similarity4.hammingRerank.run(spark, TestSpark.tiny)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(got).size.toDouble / exact.size
    // 100-of-500 Hamming shortlist over the 32-bit signature: measured
    // 0.70 on this corpus; the floor leaves hash-sensitivity headroom
    assert(recall >= 0.5, s"hamming-rerank recall@5 = $recall")
    info(f"hamming-rerank recall@5 = $recall%.2f")
  }

  test("hamming distances are consistent with an independent signature " +
    "computation and ranks are dense per query") {
    val rows = Similarity4.hammingRerank.run(spark, TestSpark.tiny)
      .select("q_id", "n_id", "hamming", "rank", "sim")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    // independent signatures straight from the shared sign-matrix column
    val sigs = Tables.embeddings(spark, TestSpark.tiny)
      .select(col("vec_id"),
        Similarity.lshSignature(col("embedding"), bits = 32).as("sig"))
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (q, n, ham, _, sim) =>
      assert(ham === java.lang.Long.bitCount(sigs(q) ^ sigs(n)),
        s"hamming($q,$n)")
      assert(ham >= 0L && ham <= 32L)
      assert(sim >= -1.0000001 && sim <= 1.0000001)
    }
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._4).sorted === (1L to rs.length), s"ranks for $q")
      // rerank order is by sim desc
      val bySim = rs.sortBy(_._4).map(_._5)
      assert(bySim.zip(bySim.tail).forall { case (a, b) => a >= b })
    }
  }

  test("sim_mmr_select ≡ plain-Scala greedy MMR over the exact shortlist") {
    val embs = Tables.embeddings(spark, TestSpark.tiny)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      // same sequential-fold shape as the engine's DotProduct
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = (0L until 10L).flatMap { q =>
      val rel = embs.keys.filter(_ != q).toSeq
        .map(n => (n, cos(embs(q), embs(n))))
        .sortBy { case (n, r) => (-r, n) }.take(20)
      val relMap = rel.toMap
      var picked = Vector(rel.head._1)
      while (picked.size < 5) {
        val next = rel.filterNot(c => picked.contains(c._1))
          .map { case (n, r) =>
            val maxdiv = picked.map(p => cos(embs(n), embs(p))).max
            (n, 0.7 * r - 0.3 * maxdiv)
          }
          .minBy { case (n, sc) => (-sc, n) }._1
        picked :+= next
      }
      picked.zipWithIndex.map { case (n, i) =>
        (q, i + 1L, n, relMap(n)) }
    }.toSet
    val got = Similarity4.mmrSelect.run(spark, TestSpark.tiny)
      .select("q_id", "pick", "n_id", "rel")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got === want)
    // diversity must bind: at least one query's picks differ from its
    // plain top-5 by relevance
    val top5 = (0L until 10L).map { q =>
      q -> embs.keys.filter(_ != q).toSeq
        .map(n => (n, cos(embs(q), embs(n))))
        .sortBy { case (n, r) => (-r, n) }.take(5).map(_._1).toSet
    }.toMap
    assert(got.groupBy(_._1).exists { case (q, rs) =>
      rs.map(_._3) != top5(q) })
  }

  test("sim_recall_matrix agrees with per-tier set intersections") {
    val exact = Similarity.topkBruteForce.run(spark, TestSpark.tiny)
      .select("q_id", "n_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val tiers = Map(
      "lsh" -> Similarity.annLsh.run(spark, TestSpark.tiny),
      "ivf" -> Similarity.annIvf.run(spark, TestSpark.tiny),
      "pq" -> graft.operators.Similarity2.annPq.run(spark, TestSpark.tiny),
      "hamming" -> Similarity4.hammingRerank.run(spark, TestSpark.tiny))
      .view.mapValues(_.select("q_id", "n_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap).toMap
    val got = Similarity4.recallMatrix.run(spark, TestSpark.tiny)
      .select("tier", "q_id", "n_matched").as[(String, Long, Long)]
      .collect()
    assert(got.length === 4 * exact.size)
    got.foreach { case (tier, q, n) =>
      val want = exact(q)
        .intersect(tiers(tier).getOrElse(q, Set.empty)).size.toLong
      assert(n === want, s"$tier/$q")
    }
    // every tier must find something somewhere, or the matrix is inert
    val byTier = got.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(byTier.values.forall(_ > 0L), byTier.toString)
  }
}
