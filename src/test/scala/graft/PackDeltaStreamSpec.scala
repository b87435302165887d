package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation
import graft.streaming.Streams

/** ST6 incremental twin of `curation_pack_delta`
  * ([[Streams.packDeltaIncrementalBatch]]): the O(edits) as-of path —
  * per-batch chunk-invalidation DELTAS against the at-rest epoch pack,
  * with the registered one-shot query as golden (r15 VERDICT task 4).
  */
class PackDeltaStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Cap = 2048L

  private def newState(): String =
    java.nio.file.Files.createTempDirectory("packdelta_state").toString

  private type DeltaRow =
    (Long, String, Option[Long], Option[Long], Option[Long], Option[Long])

  private def key(r: Row): DeltaRow = {
    def opt(i: Int): Option[Long] =
      if (r.isNullAt(i)) None else Some(r.getLong(i))
    (r.getLong(0), r.getString(1), opt(2), opt(3), opt(4), opt(5))
  }

  /** fold emissions: latest row per doc across batches (in batch
    * order), dropping docs whose latest op is a retract */
  private def fold(batches: Seq[Array[Row]]): Set[DeltaRow] = {
    val latest = scala.collection.mutable.LinkedHashMap.empty[Long, Row]
    batches.foreach(_.foreach(r => latest(r.getLong(0)) = r))
    latest.values.filter(_.getString(6) == "upsert").map(key).toSet
  }

  test("golden ≡ one-shot: the registered query's edit stream split " +
    "across batches with cross-batch redelivery") {
    val d = TestSpark.tiny
    val docs = Tables.documents(spark, d)
    val trimmed = trim(col("text"))
    // the registered query's own edit rule (Curation.packDelta)
    val edited = when(col("doc_id") % 14 === 3,
        array_join(slice(split(trimmed, " "), 1, 15), " "))
      .otherwise(concat(trimmed, lit(" "), trimmed))
    val touched = docs.filter(col("doc_id") % 7 === 3)
    val v2 = touched.select(col("doc_id"), edited.as("text"),
      lit(2L).as("version")).localCheckpoint(true)
    val v1 = touched.select(col("doc_id"), col("text"),
      lit(1L).as("version")).localCheckpoint(true)
    val half = v2.filter(col("doc_id") % 2 === 1)
    val rest = v2.filter(col("doc_id") % 2 === 0)
    val b1 = half.unionByName(v1.filter(col("doc_id") % 2 === 1))
    val b2 = rest.unionByName(half) // cross-batch redelivery of b1

    val state = newState()
    Streams.packDeltaEpochInit(docs, state)
    val e1 = Streams.packDeltaIncrementalBatch(b1, state, 0L, Cap).collect()
    val e2 = Streams.packDeltaIncrementalBatch(b2, state, 1L, Cap).collect()
    val oneShot = Curation.packDelta.run(spark, d).collect().map(key).toSet
    assert(fold(Seq(e1, e2)) === oneShot)
    assert(oneShot.nonEmpty)

    // prefix stability, now load-bearing: nothing before the first
    // effective edit is ever emitted
    val firstEdit = touched.agg(min("doc_id")).head().getLong(0)
    assert((e1 ++ e2).map(_.getLong(0)).min >= firstEdit)

    // a verbatim redelivery batch emits NOTHING (state absorbed it)
    val e3 = Streams.packDeltaIncrementalBatch(b1, state, 2L, Cap).collect()
    assert(e3.isEmpty)
    // and a foreachBatch RETRY of batch 1 emits identically
    val e2retry =
      Streams.packDeltaIncrementalBatch(b2, state, 1L, Cap).collect()
    assert(e2retry.map(key).toSet === e2.map(key).toSet)
  }

  test("full revert retracts every emission; fold returns to empty") {
    val d = TestSpark.tiny
    val docs = Tables.documents(spark, d)
    val trimmed = trim(col("text"))
    val edited = concat(trimmed, lit(" "), trimmed)
    val touched = docs.filter(col("doc_id") % 7 === 3)
    val b1 = touched.select(col("doc_id"), edited.as("text"),
      lit(2L).as("version")).localCheckpoint(true)
    // version 3 carries the ORIGINAL text: corrections cancel exactly
    val b2 = touched.select(col("doc_id"), col("text"),
      lit(3L).as("version")).localCheckpoint(true)
    val state = newState()
    Streams.packDeltaEpochInit(docs, state)
    val e1 = Streams.packDeltaIncrementalBatch(b1, state, 0L, Cap).collect()
    val e2 = Streams.packDeltaIncrementalBatch(b2, state, 1L, Cap).collect()
    assert(e1.nonEmpty)
    assert(e2.nonEmpty && e2.forall(_.getString(6) == "retract"))
    assert(fold(Seq(e1, e2)) === Set.empty[DeltaRow])
  }

  test("per-batch plan reads only epoch/edit state: no documents scan, " +
    "epoch pruned by the doc_id >= m pushdown") {
    val d = TestSpark.tiny
    val docs = Tables.documents(spark, d)
    val state = newState()
    Streams.packDeltaEpochInit(docs, state)
    // a synthetic edit batch with NO lineage to the corpus, targeting
    // an epoch-KEPT doc (so the edit has a nonzero token correction)
    val someDoc = docs.filter(col("doc_id") % 7 === 3 &&
        !graft.operators.TextAnalysis3.isHoldout(col("doc_id")) &&
        !graft.operators.TextAnalysis3.qualityBad(col("text")))
      .agg(max("doc_id")).head().getLong(0)
    val b = Seq((someDoc, 2L, "tiny edited text"))
      .toDF("doc_id", "version", "text")
    val out = Streams.packDeltaIncrementalBatch(b, state, 0L, Cap)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet"),
      "the per-batch plan must not rescan the corpus")
    assert(plan.contains("GreaterThanOrEqual(doc_id"),
      "the epoch-state scan must carry the doc_id >= m pushdown")
    // and the suffix really is a suffix: one changed edit at the max
    // touched doc invalidates only docs at or after it
    assert(out.collect().map(_.getLong(0)).min >= someDoc)
  }
}
