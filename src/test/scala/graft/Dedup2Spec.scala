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

  test("3-witness candidates cover every verified pair and cut the " +
    "single-witness candidate set") {
    import org.apache.spark.sql.functions._
    val ranked = operators.Dedup.rankedShingleRows(
      Tables.documents(spark, TestSpark.tiny), operators.Dedup.ShingleDfCap)
      .localCheckpoint(true)
    val witness = Dedup2.containmentCandidatesFrom(ranked)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the r07 single-witness design, restated inline as the baseline
    val cOMin: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      n => floor((n * 4 + lit(4)) / lit(5)).cast("long")
    val single = operators.Dedup.prefixRows(ranked, cOMin).as("a")
      .join(ranked.as("b"),
        col("a.shingle") === col("b.shingle") &&
          (col("a.n") < col("b.n") ||
            (col("a.n") === col("b.n") && col("a.doc_id") < col("b.doc_id"))) &&
          operators.Dedup.positionalFilter((na, _) => cOMin(na)))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("a_id"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("b_id"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val verified = Dedup2.containment.run(spark, TestSpark.tiny)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified.nonEmpty)
    assert(verified.subsetOf(witness), "witness filter dropped a true pair")
    assert(witness.subsetOf(single), "witness set must prune, never add")
    assert(witness.size < single.size, "3-witness should strictly prune")
  }

  test("asymmetric-containment report is the ρ > 1 slice of the " +
    "verified containment relation") {
    import org.apache.spark.sql.functions._
    val asym = Dedup2.containmentAsym.run(spark, TestSpark.tiny)
    val plan = asym.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    val rows = asym.collect()
    val full = Dedup2.containment.run(spark, TestSpark.tiny)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    rows.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(full.get(key).contains(r.getAs[Double]("containment")))
      val (nMin, nMax) = (r.getAs[Long]("n_min"), r.getAs[Long]("n_max"))
      assert(nMax > nMin)
      assert(r.getAs[Double]("rho") === nMax.toDouble / nMin)
    }
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

  test("LSH tuning report: geometries ordered by candidate volume, " +
    "true-pair base consistent, recall monotone in band fineness") {
    val rows = Dedup2.lshTuning.run(spark, TestSpark.tiny)
      .select("r", "b", "n_candidates", "n_true", "n_caught", "recall")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
      .sortBy(_._1)
    assert(rows.map(x => (x._1, x._2)) === Seq((1L, 32L), (2L, 16L), (4L, 8L)))
    val nPairs = operators.Dedup.sharedPairs(spark, TestSpark.tiny).count()
    rows.foreach { case (r, b, cand, nTrue, nCaught, recall) =>
      assert(r * b === 32L)
      assert(nTrue === nPairs)
      assert(nCaught <= nTrue)
      assert(recall === nCaught.toDouble / nTrue)
      assert(cand >= 0L)
    }
    // finer bands can only ADD collisions: candidates and recall are
    // both monotone non-increasing in r
    assert(rows(0)._3 >= rows(1)._3 && rows(1)._3 >= rows(2)._3)
    assert(rows(0)._6 >= rows(1)._6 && rows(1)._6 >= rows(2)._6)
  }
}
