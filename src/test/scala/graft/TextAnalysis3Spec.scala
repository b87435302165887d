package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis3

class TextAnalysis3Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("pii_redact: counts follow the injection rule and output is masked") {
    val rows = TextAnalysis3.piiRedact.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) === (if (id % 3 != 0) 1L else 0L), s"emails doc $id")
      assert(r.getLong(2) === (if (id % 2 == 0) 1L else 0L), s"phones doc $id")
      val red = r.getString(3)
      assert(!red.contains("@mail.example.com") && !red.contains("call 555-0"))
      if (id % 3 != 0) assert(red.contains("<EMAIL>"))
      if (id % 2 == 0) assert(red.contains("<PHONE>"))
    }
  }

  test("repetition: fractions are in [0,1] and dup-3gram detects repeats") {
    val rows = TextAnalysis3.repetition.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val top = r.getDouble(2); val dup = r.getDouble(3)
      assert(top > 0.0 && top <= 1.0)
      assert(dup >= 0.0 && dup < 1.0)
    }
    // small vocab ⇒ at least one doc repeats a 3-gram
    assert(rows.exists(_.getDouble(3) > 0.0))
  }

  test("decontaminate: holdout docs excluded; flags agree with counts") {
    val rows = TextAnalysis3.decontaminate.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) % 50 !== 0L)
      assert(r.getBoolean(2) === (r.getLong(1) > 0))
    }
  }

  test("decontaminate_bloom ≡ exact decontaminate, and the plan prunes " +
    "the corpus scan with a bloom might_contain before any join") {
    val exact = TextAnalysis3.decontaminate.run(spark, sf).collect().toSeq
    val bloomDf = TextAnalysis3.decontaminateBloom.run(spark, sf)
    val bloom = bloomDf.collect().toSeq
    assert(bloom === exact)
    val plan = bloomDf.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom prefilter in plan:\n$plan")
  }

  test("entropy: bounded by ln(n_distinct) and exact for uniform docs") {
    val rows = TextAnalysis3.entropy.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(1); val k = r.getLong(2); val h = r.getDouble(3)
      assert(h >= -1e-12, s"doc ${r.getLong(0)} negative entropy")
      assert(h <= math.log(k.toDouble) + 1e-9,
        s"doc ${r.getLong(0)} exceeds ln(n_distinct): $h vs ${math.log(k.toDouble)}")
      assert(k <= n)
    }
  }
}
