package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{TextAnalysis3, TextAnalysis6}

class PplBucketsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val rows =
    TextAnalysis6.pplBuckets.run(spark, TestSpark.tiny)
      .select(col("lang"), col("bucket"), col("n_docs"),
        col("min_nll"), col("max_nll"))
      .as[(String, Long, Long, Double, Double)].collect()

  test("per-language terciles: counts partition the scored docs and " +
    "differ by at most 1 within a language") {
    val scored = TextAnalysis3.perplexity.run(spark, TestSpark.tiny)
      .join(Tables.documents(spark, TestSpark.tiny), "doc_id")
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    rows.groupBy(_._1).foreach { case (lang, bs) =>
      assert(bs.map(_._3).sum === scored(lang), s"lang=$lang")
      val sizes = bs.map(_._3)
      assert(sizes.max - sizes.min <= 1,
        s"lang=$lang tercile sizes $sizes not balanced")
    }
  }

  test("buckets are nll-ordered: head.max ≤ middle.min ≤ middle.max ≤ " +
    "tail.min per language") {
    rows.groupBy(_._1).foreach { case (lang, bs) =>
      val sorted = bs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(lo, hi) =>
          assert(lo._5 <= hi._4,
            s"lang=$lang bucket ${lo._2}.max_nll > bucket ${hi._2}.min_nll")
        case _ =>
      }
    }
  }
}
