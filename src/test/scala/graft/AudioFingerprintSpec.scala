package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PcmSamples
import graft.operators.Multimodal2

/** Audio sign-of-energy-delta fingerprint near-dup: walker ≡ the
  * generating formula, gain invariance, banded pair set ≡ brute force. */
class AudioFingerprintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** expected fingerprint straight from the generating formula (the
    * oracle's derivation): frame f(i) = (65·i+64)//n, bit = E_{f+1} > E_f */
  private def formulaFp(c: Long, n: Int, rendition: Int): Long = {
    val e = new Array[Long](65)
    for (i <- 0 until n) {
      val v = PcmSamples.fpSample(c, i, rendition).toLong
      e(((65 * i + 64) / n).toInt) += v * v
    }
    (0 until 64).foldLeft(0L)((acc, f) =>
      if (e(f + 1) > e(f)) acc | (1L << f) else acc)
  }

  test("fingerprint walker over built WAVs ≡ the generating-formula " +
    "hash (chunk walk honors the filler chunk and LE samples)") {
    for (c <- Seq(0L, 7L, 123L, 99991L); rend <- Seq(0, 1)) {
      val n = 400 + (c % 13).toInt * 40
      val got = PcmSamples.pcmFingerprint(
        PcmSamples.buildWavFp(c, 8000, n, rend), 64)
      assert(got === formulaFp(c, n, rend), s"c=$c rend=$rend")
    }
  }

  test("gain invariance: PURE half-gain (no dither) preserves every " +
    "energy-delta sign — fingerprint identical; the dithered re-encode " +
    "stays within the near range") {
    for (c <- 0L until 60L) {
      val n = 400 + (c % 13).toInt * 40
      val base = formulaFp(c, n, 0)
      // rendition semantics WITHOUT the dither term: v/2 scales every
      // frame energy ~uniformly, so all delta signs survive — computed
      // here driver-side to isolate the invariance claim from fpSample
      val e = new Array[Long](65)
      for (i <- 0 until n) {
        val v = (PcmSamples.fpSample(c, i, 0) / 2).toLong
        e(((65 * i + 64) / n).toInt) += v * v
      }
      val halved = (0 until 64).foldLeft(0L)((acc, f) =>
        if (e(f + 1) > e(f)) acc | (1L << f) else acc)
      assert(java.lang.Long.bitCount(base ^ halved) <= 1,
        s"pure gain scaling must be ~sign-preserving (c=$c)")
      val dithered = formulaFp(c, n, 1)
      assert(java.lang.Long.bitCount(base ^ dithered) <= 6,
        s"dithered re-encode drifted too far (c=$c)")
    }
  }

  test("invalid input → NULL; a valid fingerprint is never nulled by " +
    "the Invalid-collision trap (bit-63-only pattern is legitimate)") {
    val df = Seq(Array[Byte](1, 2, 3)).toDF("media")
      .select(PcmSamples.fingerprint(col("media"), 64).as("h"))
    assert(df.collect()(0).isNullAt(0))
    // too few samples for 65 frames → NULL, not garbage
    val tiny = Seq(PcmSamples.buildWavFp(1L, 8000, 10, 0)).toDF("media")
      .select(PcmSamples.fingerprint(col("media"), 64).as("h"))
    assert(tiny.collect()(0).isNullAt(0))
  }

  test("audio query returns exactly the banded-verified pair set " +
    "(brute force on the tiny corpus); planted re-encode pairs survive") {
    val pairs = Multimodal2.audioFingerprint.run(spark, TestSpark.tiny)
      .as[(Long, Long, Long)].collect()
    assert(pairs.nonEmpty)
    val docs = Tables.documents(spark, TestSpark.tiny)
      .select("doc_id").as[Long].collect().sorted
    def geom(id: Long): Int = 400 + ((id / 2) % 13).toInt * 40
    val fps = docs.map(id =>
      id -> formulaFp(id / 2, geom(id), (id % 2).toInt)).toMap
    def bands(x: Long): Seq[Long] = (0 until 4).map(k => (x >> (16 * k)) & 0xFFFFL)
    val brute = (for {
      a <- docs; b <- docs if a < b
      if geom(a) == geom(b)
      ha = fps(a); hb = fps(b)
      if bands(ha).zip(bands(hb)).exists { case (x, y) => x == y }
      dist = java.lang.Long.bitCount(ha ^ hb)
      if dist <= 3
    } yield (a, b, dist.toLong)).toSet
    assert(pairs.toSet === brute)
    // the planted re-encode pairs (same content seed) survive blocking
    assert(brute.exists { case (a, b, _) => a / 2 == b / 2 })
  }

  test("banded audio plan: equi-join buckets, never cartesian/BNL") {
    val plan = Multimodal2.audioFingerprint.run(spark, TestSpark.tiny)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
