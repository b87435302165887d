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
