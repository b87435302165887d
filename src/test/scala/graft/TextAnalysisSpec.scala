package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("minWindowHash: texts shorter than the window yield NULL (oracle parity)") {
    val got = Seq("short", "exactly8", "a longer text with windows")
      .toDF("text")
      .select(TextAnalysis.minWindowHash(col("text")).as("h"))
      .as[Option[Long]].collect()
    assert(got(0).isEmpty)         // 5 chars < 8 → NULL, not clamped hashes
    assert(got(1).isDefined)       // exactly one window
    assert(got(2).isDefined)
  }

  test("polyHash is the sequential base-31 fold") {
    val got = Seq("ab").toDF("text")
      .select(TextAnalysis.polyHash(col("text"))).as[Long].head()
    assert(got === (97L * 31 + 98) % 1000000007L)
  }
}
