package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PcmSamples

/** PCM sample walker (WAV): reference-formula equality, chunk-walking
  * honesty (the filler chunk, extra chunks the builder never emits,
  * even-padding), malformed-input NULLs, and whole-stage-codegen
  * placement. */
class PcmSamplesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def refSample(seed: Long, i: Int): Int =
    (((seed * 31 + i.toLong * 37) % 65536) - 32768).toInt

  private def refStats(seed: Long, n: Int, k: Int): (Long, Long, Long, Long) = {
    var energy = 0L; var peak = 0L; var cross = 0L; var decim = 0L
    for (i <- 0 until n) {
      val v = refSample(seed, i)
      energy += v.toLong * v
      peak = math.max(peak, math.abs(v.toLong))
      if (i > 0 && (v < 0) != (refSample(seed, i - 1) < 0)) cross += 1
      if (i % k == 0) decim += (i / k + 1).toLong * v
    }
    (energy, peak, cross, decim)
  }

  test("built WAVs walk back to the generating formulas") {
    for (seed <- Seq(0L, 1L, 41L, 999L); n <- Seq(1, 7, 400, 881)) {
      val b = PcmSamples.buildWav(seed, 16000, n)
      val (e, p, c, d) = refStats(seed, n, 4)
      assert(PcmSamples.pcmWalk(b, 0, 1) === n.toLong, s"count seed=$seed")
      assert(PcmSamples.pcmWalk(b, 1, 1) === 16000L, s"rate seed=$seed")
      assert(PcmSamples.pcmWalk(b, 2, 1) === e, s"energy seed=$seed n=$n")
      assert(PcmSamples.pcmWalk(b, 3, 1) === p, s"peak seed=$seed n=$n")
      assert(PcmSamples.pcmWalk(b, 4, 1) === c, s"cross seed=$seed n=$n")
      assert(PcmSamples.pcmWalk(b, 5, 4) === d, s"decim seed=$seed n=$n")
    }
  }

  test("walker is chunk-order honest: data before fmt, extra chunks, " +
    "even-padding after an odd chunk") {
    // hand-build: fmt AFTER data, an extra odd-sized "cue " chunk whose
    // body would parse as plausible samples if the walker mis-skipped
    val samples = Seq[Int](1000, -1000, 500)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    def tag(t: String): Unit = buf ++= t.getBytes("US-ASCII")
    def le32(v: Int): Unit = { buf += v.toByte; buf += (v >> 8).toByte
      buf += (v >> 16).toByte; buf += (v >> 24).toByte }
    def le16(v: Int): Unit = { buf += v.toByte; buf += (v >> 8).toByte }
    tag("RIFF"); le32(0); tag("WAVE") // size patched below
    tag("cue "); le32(3); buf += 0x7F; buf += 0x7F; buf += 0x7F
    buf += 0x00 // pad: odd chunk rounds up to even
    tag("data"); le32(2 * samples.length)
    samples.foreach(le16)
    tag("fmt "); le32(16)
    le16(1); le16(1); le32(8000); le32(16000); le16(2); le16(16)
    val b = buf.toArray
    b(4) = (b.length - 8).toByte // single-byte size is enough here
    assert(PcmSamples.pcmWalk(b, 0, 1) === 3L)
    assert(PcmSamples.pcmWalk(b, 1, 1) === 8000L)
    assert(PcmSamples.pcmWalk(b, 2, 1) === 1000L * 1000 + 1000L * 1000 + 500L * 500)
    assert(PcmSamples.pcmWalk(b, 3, 1) === 1000L)
    assert(PcmSamples.pcmWalk(b, 4, 1) === 2L) // + - +
    assert(PcmSamples.pcmWalk(b, 5, 2) === 1L * 1000 + 2L * 500)
  }

  test("malformed WAVs yield NULL (sentinel), not garbage") {
    val good = PcmSamples.buildWav(7L, 8000, 10)
    val truncated = good.take(30)           // data chunk cut mid-declared-size
    val notWav = "RIFFxxxxJUNK".getBytes
    // stereo: flip the channel-count field
    val stereo = good.clone(); stereo(22) = 2
    // 8-bit: flip bits-per-sample
    val eightBit = good.clone(); eightBit(34) = 8
    val rows = Seq(good, truncated, notWav, stereo, eightBit).toDF("media")
      .select(PcmSamples.energy(col("media")).as("s"))
      .as[Option[Long]].collect()
    assert(rows(0).isDefined)
    assert(rows(1).isEmpty)
    assert(rows(2).isEmpty)
    assert(rows(3).isEmpty)
    assert(rows(4).isEmpty)
  }

  test("fixed-offset-44 parsing would read the filler as audio " +
    "(the LIST chunk is load-bearing)") {
    val b = PcmSamples.buildWav(3L, 8000, 5)
    // bytes at 44.. are the filler ("INFO" + junk), not samples: a
    // naive parser's first "sample" would be 'I'|'N'<<8, which is not
    // the formula's sample 0
    val naive = ((b(44) & 0xFF) | (b(45) << 8)).toShort.toInt
    assert(naive !== refSample(3L, 0))
    // the walker, which skips to the data chunk, gets sample 0 right:
    // decimation at k > n isolates sample 0 with weight 1
    assert(PcmSamples.pcmWalk(b, 5, 100) === refSample(3L, 0).toLong)
  }

  test("pcm expressions run inside whole-stage codegen") {
    val df = spark.range(1, 2).toDF("seed")
      .select(PcmSamples.energy(
        PcmSamples.build(col("seed"), lit(8000), lit(11))).as("e"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(df.as[Long].head() === refStats(1L, 11, 4)._1)
  }
}
