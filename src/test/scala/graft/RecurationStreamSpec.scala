package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, TextAnalysis3}
import graft.streaming.Streams

/** ST6 incremental twin of `cdc_recuration_delta`
  * ([[Streams.recurationDeltaBatch]]): per-batch verdict deltas vs the
  * pre-batch state, version-gated against stale redelivery, idempotent
  * under foreachBatch retries, with the one-shot query as golden. */
class RecurationStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newState(): String =
    java.nio.file.Files.createTempDirectory("recur_state").toString

  test("golden ≡ one-shot: the registered query's edit stream split " +
    "across batches with cross-batch redelivery") {
    val d = TestSpark.tiny
    val docs = Tables.documents(spark, d)
    val trimmed = trim(col("text"))
    // the registered query's own edit rule (Curation.recurationDelta)
    val edited = when(col("doc_id") % 14 === 3,
        array_join(slice(split(trimmed, " "), 1, 15), " "))
      .otherwise(concat(trimmed, lit(" "), trimmed))
    val touched = docs.filter(col("doc_id") % 7 === 3)
    val v2 = touched.select(col("doc_id"), edited.as("text"),
      lit(2L).as("version"))
    val v1 = touched.select(col("doc_id"), col("text"),
      lit(1L).as("version"))
    // batch 1: first half of the edits + their stale v1 redelivery;
    // batch 2: second half + a verbatim REDELIVERY of batch 1's edits
    // (cross-batch duplicate — must be absorbed, not re-emitted)
    val half = v2.filter(col("doc_id") % 2 === 1)
    val rest = v2.filter(col("doc_id") % 2 === 0)
    val b1 = half.unionByName(v1.filter(col("doc_id") % 2 === 1))
    val b2 = rest.unionByName(half)

    val flags = TextAnalysis3.curationFlags(spark, d)
    val state = newState()
    val e1 = Streams.recurationDeltaBatch(b1, state, 0L, flags).collect()
    val e2 = Streams.recurationDeltaBatch(b2, state, 1L, flags).collect()
    val streamed = (e1 ++ e2)
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val oneShot = Curation.recurationDelta.run(spark, d)
      .select("doc_id", "old_reason", "new_reason")
      .as[(Long, String, String)].collect().toSet
    assert(streamed === oneShot)
    // every doc emitted at most once across the two batches: the
    // cross-batch redelivery was absorbed by state, not re-emitted
    assert((e1 ++ e2).map(_.getLong(0)).distinct.length === e1.length + e2.length)
  }

  test("revert folds back to epoch; stale redelivery never regresses; " +
    "retry emits identically and leaves state unchanged") {
    // synthetic epoch flags exercising the precedence paths directly
    val flags = Seq(
      // doc 1: clean kept doc; doc 2: near-dup; doc 3: holdout;
      // doc 4: epoch-quality-bad
      (1L, false, false, false, false, false),
      (2L, false, false, false, true, false),
      (3L, true, false, false, false, false),
      (4L, false, true, false, false, false))
      .toDF("doc_id", "holdout", "quality_bad", "exact_dup", "near_dup",
        "contaminated")
    val good = (1 to 30).map(i => s"tok$i").mkString(" ") // 30 distinct words
    val short = "too short"
    val state = newState()
    def run(id: Long, rows: Seq[(Long, Long, String)]): Set[(Long, String, String)] =
      Streams.recurationDeltaBatch(
          rows.toDF("doc_id", "version", "text"), state, id, flags)
        .as[(Long, String, String)].collect().toSet

    // batch 0: doc 1 edited bad, doc 2 edited bad, doc 3 edited bad
    // (holdout masks — no delta), doc 4 edited GOOD (quality → kept)
    val e0 = run(0L, Seq((1L, 2L, short), (2L, 2L, short),
      (3L, 2L, short), (4L, 2L, good)))
    assert(e0 === Set((1L, "kept", "quality"), (2L, "near_dup", "quality"),
      (4L, "quality", "kept")))
    // batch 1: doc 1 REVERTED to good text (v3) → folds back to epoch
    // verdict; doc 2 gets a STALE v1 redelivery → no regression, no row
    val e1 = run(1L, Seq((1L, 3L, good), (2L, 1L, good)))
    assert(e1 === Set((1L, "quality", "kept")))
    // retry of batch 1 (same batchId): identical emission, state unchanged
    val e1retry = run(1L, Seq((1L, 3L, good), (2L, 1L, good)))
    assert(e1retry === e1)
    // batch 2 sees the post-retry state: doc 1 is 'kept' at v3, so a
    // fresh bad edit at v4 deltas from 'kept', not from anything stale
    val e2 = run(2L, Seq((1L, 4L, short)))
    assert(e2 === Set((1L, "kept", "quality")))
  }
}
