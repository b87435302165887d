package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams

/** Incremental KL-drift monitor: the cumulative output after the last
  * micro-batch must equal the one-shot `text_kl_drift` answer, in
  * sorted AND shuffled arrival order, and a batch retry must be
  * idempotent (overwrite-own-partition state).
  */
class KlDriftStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def oneShot(): Seq[(String, Long, Double)] =
    graft.operators.TextAnalysis6.klDrift.run(spark, TestSpark.tiny)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq

  private def collect(df: org.apache.spark.sql.DataFrame)
      : Seq[(String, Long, Double)] =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq

  test("cumulative drift after the last batch equals the one-shot query") {
    import spark.implicits._
    val expected = oneShot()
    val docs = Tables.documents(spark, TestSpark.tiny)
      .select("doc_id", "text", "source")
      .as[(Long, String, String)].collect()
    def run(order: IndexedSeq[(Long, String, String)], tag: String)
        : Seq[(String, Long, Double)] = {
      val dir = java.nio.file.Files.createTempDirectory(s"kldrift_$tag")
        .toString + "/state"
      var last: Seq[(String, Long, Double)] = Seq.empty
      order.grouped(order.length / 3 + 1).zipWithIndex.foreach {
        case (g, bid) =>
          last = collect(Streams.klDriftIncrementalBatch(
            g.toIndexedSeq.toDF("doc_id", "text", "source"),
            dir, bid.toLong))
      }
      last
    }
    assert(run(docs.sortBy(_._1).toIndexedSeq, "sorted") === expected)
    assert(run(new scala.util.Random(7).shuffle(docs.toIndexedSeq),
      "shuffled") === expected)
  }

  test("a batch retry is idempotent: re-running it changes nothing") {
    import spark.implicits._
    val docs = Tables.documents(spark, TestSpark.tiny)
      .select("doc_id", "text", "source")
      .as[(Long, String, String)].collect().sortBy(_._1).toIndexedSeq
    val dir = java.nio.file.Files.createTempDirectory("kldrift_retry")
      .toString + "/state"
    val batches = docs.grouped(docs.length / 3 + 1).toIndexedSeq
    Streams.klDriftIncrementalBatch(
      batches(0).toDF("doc_id", "text", "source"), dir, 0L)
    val after1 = collect(Streams.klDriftIncrementalBatch(
      batches(1).toDF("doc_id", "text", "source"), dir, 1L))
    // at-least-once: batch 1 redelivered (same payload, same batch id)
    val retried = collect(Streams.klDriftIncrementalBatch(
      batches(1).toDF("doc_id", "text", "source"), dir, 1L))
    assert(retried === after1)
    // and the monitor still converges to the one-shot answer
    val fin = collect(Streams.klDriftIncrementalBatch(
      batches(2).toDF("doc_id", "text", "source"), dir, 2L))
    assert(fin === oneShot())
  }
}
