package graft

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, TextAnalysis3}
import graft.streaming.Streams

/** The full CDC → curation → packing loop in ONE checkpointed run
  * (r15 VERDICT task 5): a document-edit stream drives
  * [[Streams.recurationDeltaBatch]] (verdict deltas) and
  * [[Streams.packDeltaIncrementalBatch]] (chunk invalidations) inside
  * a single foreachBatch pipeline — the reference's topology (Debezium
  * → consumer → sink, reference: docker-compose.yml:1-174) applied to
  * the training-data refresh — with an injected crash BETWEEN the two
  * stages and the restart replaying the half-applied batch. Landed
  * tables after recovery must equal the one-shot registered queries
  * over the total edit set. */
class PipelineE2ESpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Cap = 2048L

  test("edit stream → verdict deltas → pack invalidations, one " +
    "checkpointed foreachBatch, kill/restart mid-pipeline") {
    val d = TestSpark.tiny
    val docs = Tables.documents(spark, d)
    val trimmed = trim(col("text"))
    // the registered queries' shared edit rule
    val edited = when(col("doc_id") % 14 === 3,
        array_join(slice(split(trimmed, " "), 1, 15), " "))
      .otherwise(concat(trimmed, lit(" "), trimmed))
    val touched = docs.filter(col("doc_id") % 7 === 3)
    val v2 = touched.select(col("doc_id"), edited.as("text"),
      lit(2L).as("version")).localCheckpoint(true)
    val v1 = touched.select(col("doc_id"), col("text"),
      lit(1L).as("version")).localCheckpoint(true)

    val srcDir = java.nio.file.Files.createTempDirectory("pipe_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("pipe_ckpt").toString
    val state = java.nio.file.Files.createTempDirectory("pipe_state").toString
    val land = java.nio.file.Files.createTempDirectory("pipe_land").toString
    def writeChunk(dfc: DataFrame): Unit =
      dfc.coalesce(1).write.mode("append").parquet(srcDir)
    // chunk 1: odd-doc edits + their stale v1s; chunk 2: the rest plus
    // a verbatim cross-batch redelivery of chunk 1's edits
    val half = v2.filter(col("doc_id") % 2 === 1)
    writeChunk(half.unionByName(v1.filter(col("doc_id") % 2 === 1)))
    writeChunk(v2.filter(col("doc_id") % 2 === 0).unionByName(half))

    val epochFlags = TextAnalysis3.curationFlags(spark, d)
      .localCheckpoint(true)
    Streams.packDeltaEpochInit(docs, s"$state/pack")

    val crashed = new AtomicBoolean(false)
    val body: (DataFrame, Long) => Unit = (batch, bid) => {
      val edits = batch.select("doc_id", "version", "text")
        .localCheckpoint(true)
      // stage 1: CDC edits → curation verdict deltas, landed
      Streams.recurationDeltaBatch(edits, s"$state/recur", bid, epochFlags)
        .write.mode("overwrite").parquet(s"$land/verdicts/batch_id=$bid")
      // injected crash BETWEEN the stages on batch 1's first attempt:
      // verdicts landed, pack deltas not — the offsets never commit,
      // so the restart replays the whole batch through BOTH stages
      if (bid == 1L && crashed.compareAndSet(false, true))
        throw new RuntimeException("injected crash mid-pipeline")
      // stage 2: verdict/token flips → pack chunk invalidations, landed
      Streams.packDeltaIncrementalBatch(edits, s"$state/pack", bid, Cap)
        .write.mode("overwrite").parquet(s"$land/packs/batch_id=$bid")
    }
    def start() = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("version",
          org.apache.spark.sql.types.LongType))))
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream.foreachBatch(body)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()

    val q1 = start()
    val failed =
      try { q1.awaitTermination(180000); false }
      catch { case _: StreamingQueryException => true }
    assert(failed, "first run must die on the injected crash")
    assert(crashed.get())
    // mid-crash state: batch 1's verdicts landed, its pack deltas did not
    assert(new java.io.File(s"$land/verdicts/batch_id=1").exists())
    assert(!new java.io.File(s"$land/packs/batch_id=1").exists())

    val q2 = start()
    q2.awaitTermination(180000)

    // landed verdicts ≡ the one-shot registered cdc_recuration_delta
    val verdicts = spark.read.parquet(s"$land/verdicts")
      .select("doc_id", "old_reason", "new_reason")
      .as[(Long, String, String)].collect().toSet
    val verdictGolden = Curation.recurationDelta.run(spark, d)
      .select("doc_id", "old_reason", "new_reason")
      .as[(Long, String, String)].collect().toSet
    assert(verdicts === verdictGolden)
    assert(verdictGolden.nonEmpty)

    // landed pack deltas, folded (latest batch per doc, retracts drop)
    // ≡ the one-shot registered curation_pack_delta
    def opt(r: Row, i: Int): Option[Long] =
      if (r.isNullAt(i)) None else Some(r.getLong(i))
    val packRows = spark.read.parquet(s"$land/packs").collect()
    val latest = scala.collection.mutable.Map.empty[Long, (Long, Row)]
    packRows.foreach { r =>
      val bid = r.getAs[Number]("batch_id").longValue()
      val id = r.getAs[Long]("doc_id")
      if (!latest.contains(id) || latest(id)._1 < bid) latest(id) = (bid, r)
    }
    val folded = latest.values.collect {
      case (_, r) if r.getAs[String]("op") == "upsert" =>
        (r.getAs[Long]("doc_id"), r.getAs[String]("change"),
          opt(r, r.fieldIndex("old_first_chunk")),
          opt(r, r.fieldIndex("new_first_chunk")),
          opt(r, r.fieldIndex("old_chunk_offset")),
          opt(r, r.fieldIndex("new_chunk_offset")))
    }.toSet
    val packGolden = Curation.packDelta.run(spark, d).collect().map { r =>
      (r.getLong(0), r.getString(1), opt(r, 2), opt(r, 3), opt(r, 4),
        opt(r, 5))
    }.toSet
    assert(folded === packGolden)
    assert(packGolden.nonEmpty)
  }
}
