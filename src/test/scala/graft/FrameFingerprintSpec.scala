package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GifFrames
import graft.operators.Multimodal2

/** Frame-sequence (video-shaped) temporal fingerprint near-dup:
  * walker ≡ the generating formula, re-encode invariance (payload
  * bytes disjoint, fingerprint near), banded pair set ≡ brute force. */
class FrameFingerprintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def frames(c: Long): Int = 66 + (c % 13).toInt * 13

  /** expected fingerprint straight from the generating formulas (the
    * oracle's derivation): stat_i = delay_i + fw_i·fh_i, window
    * f(i) = (65·i+64)//n, bit = E_{f+1} > E_f */
  private def formulaFp(c: Long, n: Int, rendition: Int): Long = {
    val e = new Array[Long](65)
    for (i <- 0 until n) {
      val stat = GifFrames.fpDelay(c, i, rendition).toLong +
        (i % 3 + 1) * ((c + i) % 2 + 1)
      e(((65L * i + 64) / n).toInt) += stat
    }
    (0 until 64).foldLeft(0L)((acc, f) =>
      if (e(f + 1) > e(f)) acc | (1L << f) else acc)
  }

  test("fingerprint walker over built GIFs ≡ the generating-formula " +
    "hash (block walk pairs each delay with its frame, reads geometry)") {
    for (c <- Seq(0L, 7L, 123L, 99991L); rend <- Seq(0, 1)) {
      val got = GifFrames.gifFingerprint(
        GifFrames.buildGifFp(c, frames(c), rend), 64)
      assert(got === formulaFp(c, frames(c), rend), s"c=$c rend=$rend")
    }
  }

  test("re-encode invariance: renditions share NO payload bytes (exact/" +
    "byte dedup sees unrelated blobs) yet fingerprints stay near; pure " +
    "2x time-scaling preserves every bit") {
    for (c <- 0L until 60L) {
      val n = frames(c)
      val b0 = GifFrames.buildGifFp(c, n, 0)
      val b1 = GifFrames.buildGifFp(c, n, 1)
      assert(!java.util.Arrays.equals(b0, b1))
      val ham = java.lang.Long.bitCount(formulaFp(c, n, 0) ^ formulaFp(c, n, 1))
      assert(ham <= 6, s"dithered re-encode drifted too far (c=$c ham=$ham)")
      // uniform time-scaling (same clip, every delay doubled) preserves
      // every window-delta sign — computed driver-side from the formula
      // to isolate the invariance claim from the builder
      val e = new Array[Long](65)
      for (i <- 0 until n) {
        val stat = 2L * GifFrames.fpDelay(c, i, 0) +
          (i % 3 + 1) * ((c + i) % 2 + 1)
        e(((65L * i + 64) / n).toInt) += stat
      }
      val scaled = (0 until 64).foldLeft(0L)((acc, f) =>
        if (e(f + 1) > e(f)) acc | (1L << f) else acc)
      assert(java.lang.Long.bitCount(formulaFp(c, n, 0) ^ scaled) <= 1,
        s"pure time scaling must be ~sign-preserving (c=$c)")
    }
  }

  test("invalid input → NULL; too few frames for 65 windows → NULL") {
    val df = Seq(Array[Byte](1, 2, 3)).toDF("media")
      .select(GifFrames.fingerprint(col("media"), 64).as("h"))
    assert(df.collect()(0).isNullAt(0))
    val tiny = Seq(GifFrames.buildGifFp(1L, 10, 0)).toDF("media")
      .select(GifFrames.fingerprint(col("media"), 64).as("h"))
    assert(tiny.collect()(0).isNullAt(0))
  }

  test("framehash query returns exactly the banded-verified pair set " +
    "(brute force on the tiny corpus); planted re-encode pairs survive") {
    val pairs = Multimodal2.framehashDedup.run(spark, TestSpark.tiny)
      .as[(Long, Long, Long)].collect()
    assert(pairs.nonEmpty)
    val docs = Tables.documents(spark, TestSpark.tiny)
      .select("doc_id").as[Long].collect().sorted
    val fps = docs.map(id =>
      id -> formulaFp(id / 2, frames(id / 2), (id % 2).toInt)).toMap
    def bands(x: Long): Seq[Long] = (0 until 4).map(k => (x >> (16 * k)) & 0xFFFFL)
    val brute = (for {
      a <- docs; b <- docs if a < b
      if frames(a / 2) == frames(b / 2)
      ha = fps(a); hb = fps(b)
      if bands(ha).zip(bands(hb)).exists { case (x, y) => x == y }
      dist = java.lang.Long.bitCount(ha ^ hb)
      if dist <= 3
    } yield (a, b, dist.toLong)).toSet
    assert(pairs.toSet === brute)
    // the planted re-encode pairs (same content seed) survive blocking
    assert(brute.exists { case (a, b, _) => a / 2 == b / 2 })
  }

  test("banded framehash plan: equi-join buckets, never cartesian/BNL") {
    val plan = Multimodal2.framehashDedup.run(spark, TestSpark.tiny)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
