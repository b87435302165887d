package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Similarity, Similarity12}

/** SQ8 ANN: approximation quality the oracle can't check — recall vs
  * the exact brute-force top-k (expected HIGH: 8-bit per-dim linear
  * quantization is far finer than PQ's 4 bits per 16-dim subspace),
  * determinism, and the k-per-query output contract. */
class Similarity12Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("SQ8 recall@5 vs brute force beats the PQ tier's floor") {
    val exact = Similarity.topkBruteForce.run(spark, TestSpark.tiny)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val sq = Similarity12.sq8Rerank.run(spark, TestSpark.tiny)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(sq).size.toDouble / exact.size
    // 255-level per-dim codes + 150-deep exact re-rank: the shortlist
    // is ranked on a near-faithful reconstruction, so recall should be
    // near-perfect (PQ's floor on this corpus is 0.5)
    assert(recall >= 0.9, s"SQ8 recall@5 = $recall")
    info(f"SQ8 recall@5 = $recall%.2f")
  }

  test("SQ8 top-k is deterministic across runs (min/max codebook)") {
    def once(): Seq[(Long, Long, Long)] =
      Similarity12.sq8Rerank.run(spark, TestSpark.tiny)
        .select("q_id", "n_id", "rank").as[(Long, Long, Long)]
        .collect().toSeq
    assert(once() === once())
  }

  test("SQ8 returns exactly k ranked neighbors per query, no self-matches") {
    val rows = Similarity12.sq8Rerank.run(spark, TestSpark.tiny)
      .select("q_id", "n_id", "rank").as[(Long, Long, Long)].collect()
    val byQ = rows.groupBy(_._1)
    assert(byQ.size == 10)
    byQ.foreach { case (q, rs) =>
      assert(rs.length == Similarity.K, s"query $q returned ${rs.length}")
      assert(rs.map(_._3).sorted.toSeq == (1L to Similarity.K), s"ranks of $q")
      assert(!rs.exists(_._2 == q), s"self-match for $q")
    }
  }
}
