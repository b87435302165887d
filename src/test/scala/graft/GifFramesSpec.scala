package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{BmpPixels, GifFrames}

/** Frame-sampling walker (GIF) + nearest-neighbor resample (BMP):
  * reference-formula equality, malformed-input NULLs, structure
  * tolerance the builder never emits (global/local color tables), and
  * whole-stage-codegen placement. */
class GifFramesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def refStats(seed: Long, n: Int): (Long, Long, Long) = {
    var total = 0L; var sampled = 0L
    for (i <- 0 until n) {
      val delay = (seed + 3 * i) % 50 + 1
      val area = (i % 3 + 1).toLong * ((seed + i) % 2 + 1)
      total += delay
      if (i % 2 == 0) sampled += (i + 1) * (delay + area)
    }
    (n.toLong, total, sampled)
  }

  test("built GIFs walk back to the generating formulas") {
    for (seed <- Seq(0L, 1L, 41L, 999L); n <- 1 to 4) {
      val b = GifFrames.buildGif(seed, n)
      val (fc, td, ss) = refStats(seed, n)
      assert(GifFrames.gifWalk(b, 0, 1) === fc, s"frames seed=$seed n=$n")
      assert(GifFrames.gifWalk(b, 1, 1) === td, s"delay seed=$seed n=$n")
      assert(GifFrames.gifWalk(b, 2, 2) === ss, s"sampled seed=$seed n=$n")
      // k=1 samples every frame; k>n samples only frame 0
      assert(GifFrames.gifWalk(b, 2, 1) >= GifFrames.gifWalk(b, 2, 2))
      // k <= 0 is the -1 sentinel (pcmWalk's contract), not an
      // ArithmeticException inside the codegen'd expression
      assert(GifFrames.gifWalk(b, 2, 0) === -1L)
      assert(GifFrames.gifWalk(b, 2, -3) === -1L)
    }
  }

  test("walker tolerates structures the builder never emits") {
    // hand-build: global color table (2 entries), a comment extension
    // between frames, and a local color table on the frame
    val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    buf ++= "GIF89a".getBytes("US-ASCII")
    buf ++= Seq[Byte](4, 0, 3, 0) // screen 4×3
    buf += 0x80.toByte // GCT flag, size field 0 → 2 entries
    buf += 0x00; buf += 0x00
    buf ++= Seq.fill(6)(0x11.toByte) // 2-entry GCT
    // comment extension (label 0xFE), one sub-block
    buf += 0x21; buf += 0xFE.toByte; buf += 0x02; buf += 'h'.toByte
    buf += 'i'.toByte; buf += 0x00
    // GCE with delay 7
    buf += 0x21; buf += 0xF9.toByte; buf += 0x04; buf += 0x00
    buf += 0x07; buf += 0x00; buf += 0x00; buf += 0x00
    // image descriptor 2×3 with a 2-entry local color table
    buf += 0x2C
    buf ++= Seq[Byte](0, 0, 0, 0, 2, 0, 3, 0)
    buf += 0x80.toByte
    buf ++= Seq.fill(6)(0x22.toByte) // LCT
    buf += 0x02 // lzw min code
    buf += 0x01; buf += 0x55.toByte; buf += 0x00 // one payload block
    buf += 0x3B.toByte
    val b = buf.toArray
    assert(GifFrames.gifWalk(b, 0, 1) === 1L)
    assert(GifFrames.gifWalk(b, 1, 1) === 7L)
    assert(GifFrames.gifWalk(b, 2, 2) === 1L * (7 + 2 * 3))
  }

  test("malformed GIFs yield NULL (sentinel), not garbage") {
    val good = GifFrames.buildGif(7L, 3)
    val noTrailer = good.dropRight(1)
    val truncated = good.take(20)
    val notGif = "GIF87a junk".getBytes
    val rows = Seq(good, noTrailer, truncated, notGif).toDF("media")
      .select(GifFrames.frameCount(col("media")).as("s"))
      .as[Option[Long]].collect()
    assert(rows(0).contains(3L))
    assert(rows(1).isEmpty)
    assert(rows(2).isEmpty)
    assert(rows(3).isEmpty)
  }

  test("gifFrameStats single walk ≡ gifWalk gate (valid + malformed corpus)") {
    // r15 ADVICE: the fingerprint expr must walk the container ONCE;
    // gifFrameStats is that walk, so its acceptance set and per-frame
    // totals must match gifWalk's exactly.
    val good = GifFrames.buildGif(7L, 3)
    val fp = GifFrames.buildGifFp(11L, 70, 0)
    for (b <- Seq(good, fp)) {
      val stats = GifFrames.gifFrameStats(b)
      assert(stats !== null)
      assert(stats.length.toLong === GifFrames.gifWalk(b, 0, 1))
      // Σ stats = Σ delay + Σ w·h; mode 2 with k=1 gives Σ (i+1)·stat_i —
      // cross-check via the straight sum instead: mode 1 + per-frame area
      val area = stats.sum - GifFrames.gifWalk(b, 1, 1)
      assert(area > 0L)
      // fingerprint from the one-walk stats ≡ the public wrapper
      assert(GifFrames.gifFingerprintFromStats(stats, 2) ===
        GifFrames.gifFingerprint(b, 2))
    }
    for (b <- Seq(good.dropRight(1), good.take(20),
        "GIF87a junk".getBytes, Array[Byte](), null: Array[Byte])) {
      assert(GifFrames.gifFrameStats(b) === null)
      assert(GifFrames.gifWalk(b, 0, 1) === -1L)
    }
  }

  private def refResample(seed: Long, w: Int, h: Int, rw: Int, rh: Int,
      ch: Int, weighted: Boolean): Long = {
    var s = 0L
    for (yy <- 0 until rh; xx <- 0 until rw) {
      val sx = xx * w / rw; val sy = yy * h / rh
      val v = ch match {
        case 0 => (seed + 7L * sx + 13L * sy) % 256
        case 1 => (3L * seed + sx) % 256
        case 2 => (sx.toLong * sy + seed) % 256
      }
      s += (if (weighted) (xx + 1).toLong * (yy + 1) * v else v)
    }
    s
  }

  test("BMP nearest-neighbor resample matches the index-math reference " +
    "for down- AND up-scaling") {
    for (seed <- Seq(0L, 5L, 123L); (w, h) <- Seq((2, 1), (5, 3), (6, 3));
        (rw, rh) <- Seq((3, 2), (1, 1), (8, 5))) {
      val b = BmpPixels.buildBmp(seed, w, h)
      for (ch <- 0 to 2)
        assert(BmpPixels.bmpResampleSum(b, rw, rh, ch, weighted = false) ===
          refResample(seed, w, h, rw, rh, ch, weighted = false),
          s"seed=$seed $w×$h→$rw×$rh ch=$ch")
      assert(BmpPixels.bmpResampleSum(b, rw, rh, 2, weighted = true) ===
        refResample(seed, w, h, rw, rh, 2, weighted = true))
    }
    // identity resample ≡ plain channel sum
    val b = BmpPixels.buildBmp(9L, 4, 3)
    assert(BmpPixels.bmpResampleSum(b, 4, 3, 1, weighted = false) ===
      BmpPixels.bmpChannelSum(b, 1))
  }

  test("new expressions run inside whole-stage codegen") {
    val df = spark.range(1, 2).toDF("seed")
      .select(
        GifFrames.frameCount(GifFrames.build(col("seed"), lit(3))).as("fc"),
        BmpPixels.resampleSum(
          BmpPixels.build(col("seed"), lit(5), lit(3)), 3, 2, 2).as("rs"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    val (fc, rs) = df.as[(Long, Long)].head()
    assert(fc === 3L)
    assert(rs === refResample(1L, 5, 3, 3, 2, 2, weighted = false))
    // the r15 fingerprint pair (builder + temporal fingerprint) too:
    // one codegen'd span end-to-end, value equal to the static walk
    val df2 = spark.range(1, 2).toDF("c")
      .select(GifFrames.fingerprint(
        GifFrames.buildFp(col("c"), lit(70), 1), 64).as("h"))
    val plan2 = df2.queryExecution.executedPlan.toString
    assert(plan2.contains("*(1) Project"), plan2)
    assert(df2.as[Long].head() ===
      GifFrames.gifFingerprint(GifFrames.buildGifFp(1L, 70, 1), 64))
  }
}
