package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Similarity, Similarity11}

/** IVF+PQ combined ANN: recall vs the exact brute-force top-k and vs
  * its IVF parent (the PQ shortlist should not cost much recall inside
  * the probed fraction), determinism, and the k-per-query contract.
  * (The full output is also hash-checked against the DuckDB oracle by
  * the driver; these cover the approximation QUALITY the oracle
  * can't.) */
class Similarity11Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("IVFPQ recall@5 vs brute force is usable, and close to IVF alone") {
    val exact = Similarity.topkBruteForce.run(spark, TestSpark.tiny)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.annIvf.run(spark, TestSpark.tiny)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val ivfpq = Similarity11.ivfpqAdc.run(spark, TestSpark.tiny)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(ivfpq).size.toDouble / exact.size
    val vsIvf = ivf.intersect(ivfpq).size.toDouble / ivf.size
    // IVF's own ceiling on this corpus is 0.56 (same probes); measured
    // IVFPQ: 0.46 vs exact, 0.82 agreement at shortlist 100 — floors
    // leave hash-sensitivity room
    assert(recall >= 0.35, s"IVFPQ recall@5 vs exact = $recall")
    assert(vsIvf >= 0.7, s"IVFPQ agreement with IVF parent = $vsIvf")
    info(f"IVFPQ recall@5 = $recall%.2f, agreement with IVF = $vsIvf%.2f")
  }

  test("IVFPQ top-k is deterministic across runs (fixed planes throughout)") {
    def once(): Seq[(Long, Long, Long)] =
      Similarity11.ivfpqAdc.run(spark, TestSpark.tiny)
        .select("q_id", "n_id", "rank").as[(Long, Long, Long)]
        .collect().toSeq
    assert(once() === once())
  }

  test("IVFPQ returns exactly k ranked neighbors per query, no self-matches") {
    val rows = Similarity11.ivfpqAdc.run(spark, TestSpark.tiny)
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
