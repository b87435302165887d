package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Dedup2}

class Dedup2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val sets: Array[(Long, Set[String])] =
    Tables.documents(spark, TestSpark.tiny)
      .select(col("doc_id"), Dedup.shingles(col("text")).as("s"))
      .as[(Long, Seq[String])].collect()
      .map { case (id, s) => id -> s.toSet }.filter(_._2.nonEmpty)

  test("prefix-filtered containment pairs ≡ driver-side brute force " +
    "(smaller-side prefix pruning is exact)") {
    val brute = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size
      c = inter.toDouble / math.min(sa.size, sb.size)
      if c >= 0.8
    } yield (a, b, c)).toSet
    val got = Dedup2.containment.run(spark, TestSpark.tiny)
      .as[(Long, Long, Double)].collect().toSet
    assert(got === brute)
    assert(got.nonEmpty, "fixture has no containment pairs — vacuous test")
  }

  test("containment ⊇ high-Jaccard pairs (C ≥ J always)") {
    val jac = Dedup.ngramJaccard.run(spark, TestSpark.tiny)
      .filter(col("sim") >= 0.8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val cont = Dedup2.containment.run(spark, TestSpark.tiny)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(jac.subsetOf(cont))
  }

  test("containment candidate plan has no cartesian product and keeps " +
    "the DF-cap window") {
    val plan = Dedup2.containmentCandidatePlan(
      Tables.documents(spark, TestSpark.tiny))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("containment LSH tier reproduces the exact tier's verified output") {
    // the scale route's whole contract: banded candidates + exact
    // verify ≡ the unfiltered exact relation (here, plus at every
    // measured SF via the shared hash oracle)
    val exact = Dedup2.containment.run(spark, TestSpark.tiny)
      .collect().map(_.toSeq).toSet
    val lsh = Dedup2.containmentLsh.run(spark, TestSpark.tiny)
      .collect().map(_.toSeq).toSet
    assert(exact.nonEmpty)
    assert(lsh == exact)
  }

  test("containment LSH tier joins band buckets, never all-pairs") {
    val plan = Dedup2.containmentLsh.run(spark, TestSpark.tiny)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("minhash estimator: identical docs match on all 16 components and " +
    "the estimate tracks true Jaccard") {
    import spark.implicits._
    val rows = Dedup2.minhashEstimate
      .run(spark, TestSpark.tiny)
      .select("a_id", "b_id", "sim", "n_match", "est")
      .as[(Long, Long, Double, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, sim, n, est) =>
      assert(n >= 0L && n <= 16L, s"($a,$b)")
      assert(est === n.toDouble / 16.0)
      // identical shingle sets must agree on every min component
      if (sim == 1.0) assert(n === 16L, s"exact dup ($a,$b) mismatched")
    }
    // unbiasedness in aggregate: mean |est − sim| over the verified
    // pairs stays under the 16-component binomial noise envelope
    val mae = rows.map { case (_, _, sim, _, est) =>
      math.abs(est - sim) }.sum / rows.length
    assert(mae <= 0.35, s"estimator MAE $mae")
  }
}
