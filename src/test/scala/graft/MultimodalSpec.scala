package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("decodeStub: deterministic normalized byte histogram") {
    val f = Multimodal.decodeStub("aaaa".getBytes("UTF-8"))
    assert(f.length === 8)
    assert(f.sum === 1.0) // all mass in one bin ('a' = 97 → bin 3)
    assert(f(3) === 1.0)
    assert(Multimodal.decodeStub(Array.emptyByteArray).sum === 0.0)
  }

  test("resizeStub bounds payloads at w*h bytes, deterministically") {
    val in = (0 until 1000).map(_.toByte).toArray
    val out = Multimodal.resizeStub(in, 8, 8)
    assert(out.length === 64)
    assert(out.toSeq === Multimodal.resizeStub(in, 8, 8).toSeq) // stable
    assert(Multimodal.resizeStub(Array[Byte](1, 2), 8, 8).toSeq === Seq(1, 2))
  }

  test("sampleFrames fans one media row into every-nth frame rows") {
    val docs = Seq((1L, "abcdefghij")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("bigint"))
    val frames = Multimodal.sampleFrames(
      Multimodal.asMedia(docs), frameBytes = 2, everyN = 2).collect()
    // 5 frames of 2 bytes, keep idx 0,2,4
    assert(frames.map(_.frame_idx).sorted === Array(0L, 2L, 4L))
    assert(new String(frames.find(_.frame_idx == 2L).get.frame) === "ef")
  }

  test("decodeBmp: lenient on malformed input — crafted overflow width " +
    "and wrong bit depth yield null, never a crash") {
    import graft.functions.BmpPixels
    def le32(b: Array[Byte], i: Int, v: Int): Unit = {
      b(i) = v.toByte; b(i + 1) = (v >> 8).toByte
      b(i + 2) = (v >> 16).toByte; b(i + 3) = (v >> 24).toByte
    }
    // width crafted so 3*w overflows Int → stride negative without the
    // Long fix; must be null/-1, not ArrayIndexOutOfBoundsException
    val crafted = new Array[Byte](54)
    crafted(0) = 'B'; crafted(1) = 'M'
    le32(crafted, 10, 54); le32(crafted, 18, 800000000); le32(crafted, 22, 1)
    crafted(28) = 24
    assert(Multimodal.decodeBmp(crafted) === null)
    assert(BmpPixels.bmpChannelSum(crafted, 0) === -1L)
    assert(BmpPixels.bmpWeightedSum(crafted, 0) === -1L)
    // width AND height both near Int.MaxValue: strideL*h (~1.4e19)
    // overflows LONG and wraps negative, so a multiply-form bounds
    // check passes and the walk crashes — the division form must reject
    val crafted2 = new Array[Byte](54)
    crafted2(0) = 'B'; crafted2(1) = 'M'
    le32(crafted2, 10, 54)
    le32(crafted2, 18, Int.MaxValue); le32(crafted2, 22, Int.MaxValue)
    crafted2(28) = 24
    assert(Multimodal.decodeBmp(crafted2) === null)
    assert(BmpPixels.bmpChannelSum(crafted2, 0) === -1L)
    assert(BmpPixels.bmpWeightedSum(crafted2, 0) === -1L)
    // offset beyond the buffer must also reject, not wrap the subtraction
    val crafted3 = BmpPixels.buildBmp(7L, 3, 2).clone()
    le32(crafted3, 10, Int.MaxValue)
    assert(Multimodal.decodeBmp(crafted3) === null)
    assert(BmpPixels.bmpChannelSum(crafted3, 0) === -1L)
    // a 32-bpp header must be rejected (the walker assumes 3 bytes/px)
    val bpp32 = BmpPixels.buildBmp(7L, 3, 2).clone()
    bpp32(28) = 32
    assert(Multimodal.decodeBmp(bpp32) === null)
    // and the happy path still decodes
    val ok = Multimodal.decodeBmp(BmpPixels.buildBmp(7L, 3, 2))
    assert(ok(0) === 3.0 && ok(1) === 2.0)
  }

  test("media pipeline: binary payload + metadata survive mapPartitions") {
    val docs = Seq((1L, "hello world"), (2L, "abc")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("bigint"))
    val feats = Multimodal.extractFeatures(Multimodal.asMedia(docs)).collect()
    assert(feats.map(_.doc_id).sorted === Array(1L, 2L))
    val h = feats.find(_.doc_id === 1L).get
    assert(h.n_bytes === 11L)
    assert(h.format === "text/plain")
    assert(math.abs(h.features.sum - 1.0) < 1e-12)
  }
}
