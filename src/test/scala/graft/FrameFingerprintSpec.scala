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

  // ---- the SAME fingerprint over a second container grammar (EBML
  // cluster timestamps, r15 VERDICT task 8) — only the stats collector
  // changes; the 65-window fold is shared code ----

  import graft.functions.EbmlTree

  /** expected EBML fingerprint straight from the generating formula:
    * stat_i = the inter-cluster duration fpClusterDelta(c, i, rend) */
  private def ebmlFormulaFp(c: Long, n: Int, rendition: Int): Long = {
    val e = new Array[Long](65)
    for (i <- 0 until n)
      e(((65L * i + 64) / n).toInt) += EbmlTree.fpClusterDelta(c, i, rendition)
    (0 until 64).foldLeft(0L)((acc, f) =>
      if (e(f + 1) > e(f)) acc | (1L << f) else acc)
  }

  test("EBML cluster-timestamp walker ≡ the generating-formula hash; " +
    "the VINT tree walk recovers every inter-cluster duration") {
    for (c <- Seq(0L, 7L, 123L, 99991L); rend <- Seq(0, 1)) {
      val n = frames(c)
      val b = EbmlTree.buildEbmlFp(c, n, rend)
      val stats = EbmlTree.ebmlClusterStats(b)
      assert(stats !== null)
      assert(stats.length === n)
      assert(stats.toSeq ===
        (0 until n).map(i => EbmlTree.fpClusterDelta(c, i, rend)))
      assert(GifFrames.gifFingerprintFromStats(stats, 64) ===
        ebmlFormulaFp(c, n, rend), s"c=$c rend=$rend")
    }
  }

  test("EBML re-encode invariance: renditions share NO SimpleBlock " +
    "payload bytes yet fingerprints stay near; 2x time-scaling " +
    "preserves every bit exactly") {
    for (c <- 0L until 60L) {
      val n = frames(c)
      val b0 = EbmlTree.buildEbmlFp(c, n, 0)
      val b1 = EbmlTree.buildEbmlFp(c, n, 1)
      assert(!java.util.Arrays.equals(b0, b1))
      val ham = java.lang.Long.bitCount(
        ebmlFormulaFp(c, n, 0) ^ ebmlFormulaFp(c, n, 1))
      assert(ham <= 6, s"dithered re-encode drifted too far (c=$c ham=$ham)")
      // doubling every cluster duration doubles every window sum, so
      // every delta sign — hence every bit — is preserved EXACTLY
      val e = new Array[Long](65)
      for (i <- 0 until n)
        e(((65L * i + 64) / n).toInt) += 2L * EbmlTree.fpClusterDelta(c, i, 0)
      val scaled = (0 until 64).foldLeft(0L)((acc, f) =>
        if (e(f + 1) > e(f)) acc | (1L << f) else acc)
      assert(scaled === ebmlFormulaFp(c, n, 0),
        s"pure time scaling must be sign-preserving (c=$c)")
    }
  }

  test("EBML fingerprint NULL gates: malformed VINTs, truncated " +
    "containers, clusters without timestamps, too-few clusters") {
    val good = EbmlTree.buildEbmlFp(5L, frames(5L), 0)
    assert(EbmlTree.ebmlClusterStats(good) !== null)
    assert(EbmlTree.ebmlClusterStats(good.dropRight(1)) === null)
    assert(EbmlTree.ebmlClusterStats(good.take(20)) === null)
    assert(EbmlTree.ebmlClusterStats(Array[Byte](0, 0, 0, 0, 0, 0)) === null)
    assert(EbmlTree.ebmlClusterStats(null) === null)
    // the ORIGINAL buildEbml writes clusters WITHOUT Timestamp children
    // — valid for the census walk, rejected by the fingerprint walk
    assert(EbmlTree.ebmlWalk(EbmlTree.buildEbml(9L), 0) > 0L)
    assert(EbmlTree.ebmlClusterStats(EbmlTree.buildEbml(9L)) === null)
    val tiny = Seq(EbmlTree.buildEbmlFp(1L, 10, 0)).toDF("media")
      .select(EbmlTree.fingerprint(col("media"), 64).as("h"))
    assert(tiny.collect()(0).isNullAt(0))
  }

  test("EBML framehash query ≡ brute force on the tiny corpus; planted " +
    "re-encode pairs survive; plan equi-joins buckets (no cartesian); " +
    "fingerprint stays inside whole-stage codegen") {
    val q = Multimodal2.ebmlFramehash.run(spark, TestSpark.tiny)
    val pairs = q.as[(Long, Long, Long)].collect()
    assert(pairs.nonEmpty)
    val docs = Tables.documents(spark, TestSpark.tiny)
      .select("doc_id").as[Long].collect().sorted
    val fps = docs.map(id =>
      id -> ebmlFormulaFp(id / 2, frames(id / 2), (id % 2).toInt)).toMap
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
    assert(brute.exists { case (a, b, _) => a / 2 == b / 2 })
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    // the signature projection is codegen'd (the GIF assertion, ported)
    val sigPlan = Tables.documents(spark, TestSpark.tiny)
      .select(EbmlTree.fingerprint(
        EbmlTree.buildFp(expr("doc_id div 2"),
          lit(66) + (expr("doc_id div 2") % 13) * 13, 0), 64).as("h"))
    // the "*(n)" prefix marks a WholeStageCodegen stage in plan strings
    assert(sigPlan.queryExecution.executedPlan.toString
      .contains("*(1) Project [ebml_fingerprint(ebml_fp_build("))
  }
}
