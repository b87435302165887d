package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BmpPixels

class BmpPixelsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def refSum(seed: Long, w: Int, h: Int, ch: Int): Long = {
    var s = 0L
    for (x <- 0 until w; y <- 0 until h) s += (ch match {
      case 0 => (seed + 7L * x + 13L * y) % 256
      case 1 => (3L * seed + x) % 256
      case 2 => (x.toLong * y + seed) % 256
    })
    s
  }

  test("built BMPs are valid and pixel walks match the generating formula") {
    for (seed <- Seq(0L, 1L, 41L, 999L); (w, h) <- Seq((2, 1), (5, 3), (6, 3))) {
      val b = BmpPixels.buildBmp(seed, w, h)
      assert(b(0) == 'B' && b(1) == 'M')
      assert(graft.functions.MediaHeaders.imageWidth(b) === w)
      assert(graft.functions.MediaHeaders.imageHeight(b) === h)
      for (ch <- 0 to 2) {
        assert(BmpPixels.bmpChannelSum(b, ch) === refSum(seed, w, h, ch),
          s"seed=$seed w=$w h=$h ch=$ch")
      }
      // weighted sum is position-sensitive: recompute independently
      var ws = 0L
      for (x <- 0 until w; y <- 0 until h)
        ws += (x + 1).toLong * (y + 1) * ((x.toLong * y + seed) % 256)
      assert(BmpPixels.bmpWeightedSum(b, 2) === ws)
    }
  }

  test("invalid payloads yield NULL (sentinel), not garbage") {
    val good = BmpPixels.buildBmp(7L, 3, 2)
    val truncated = good.take(40)          // shorter than the pixel array
    val notBmp = "hello".getBytes
    val rows = Seq(good, truncated, notBmp).toDF("media")
      .select(BmpPixels.channelSum(col("media"), 0).as("s"))
      .as[Option[Long]].collect()
    assert(rows(0).isDefined)
    assert(rows(1).isEmpty)
    assert(rows(2).isEmpty)
  }

  test("expressions run inside whole-stage codegen") {
    val df = spark.range(1, 2).toDF("seed")
      .select(BmpPixels.channelSum(
        BmpPixels.build(col("seed"), lit(3), lit(2)), 2).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks a WholeStageCodegen stage in plan strings
    assert(plan.contains("*(1) Project"), plan)
    assert(df.as[Long].head() === refSum(1L, 3, 2, 2))
  }
}
