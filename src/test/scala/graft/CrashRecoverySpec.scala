package graft

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.JdbcUpsertSink

/** ST1→ST2 end-to-end crash recovery: the at-least-once checkpointed
  * stream + idempotent MERGE sink claim, proven by actually crashing a
  * checkpointed query mid-batch and restarting it (reference semantics:
  * group offsets + idempotent landing, main.py:27-55 + debezium.json:18).
  *
  * The injected failure is the WORST case for an upsert sink: the
  * foreachBatch body applies a PARTIAL slice of its batch to the target
  * table and then dies, so the batch's offsets are never committed.
  * The restart replays the whole batch from the checkpoint; the
  * version-gated MERGE must absorb both the half-applied rows (replay
  * idempotence) and the unseen remainder. Final table must equal the
  * latest-per-key answer over ALL input — the exactly-once-sink
  * observable effect built from at-least-once delivery. */
class CrashRecoverySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def readTable(url: String, table: String) =
    spark.read.jdbc(url, "\"" + table + "\"", new java.util.Properties)

  test("checkpointed stream crashes mid-batch, restarts, lands the exact answer") {
    val url = "jdbc:derby:memory:graft_crash;create=true"
    val srcDir = java.nio.file.Files.createTempDirectory("crash_src")
    val ckpt = java.nio.file.Files.createTempDirectory("crash_ckpt").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("username", StringType),
      StructField("version", LongType), StructField("__deleted", BooleanType)))

    // three source files -> three micro-batches (maxFilesPerTrigger=1)
    def writeFile(name: String, rows: Seq[(Long, String, Long, Boolean)]): Unit =
      java.nio.file.Files.writeString(srcDir.resolve(name),
        rows.map { case (i, u, v, d) =>
          s"""{"id":$i,"username":"$u","version":$v,"__deleted":$d}"""
        }.mkString("", "\n", "\n"))
    writeFile("f0.json", Seq((1L, "ann", 1L, false), (2L, "bob", 1L, false)))
    writeFile("f1.json", Seq((1L, "ann2", 2L, false), (3L, "carl", 1L, false)))
    writeFile("f2.json", Seq((2L, "bob", 2L, true), (4L, "dana", 1L, false)))

    val merge = JdbcUpsertSink(url, "crash_latest", "id", "version", "__deleted")
    val crashed = new AtomicBoolean(false)
    // crash injection keyed on CONTENT (the batch carrying id=3), not on
    // batchId, so the test is robust to file-listing order: apply only
    // the id>=3 slice of that batch, then die before offsets commit
    val body: (DataFrame, Long) => Unit = (batch, id) => {
      val rows = batch.localCheckpoint(true)
      if (rows.filter(col("id") === 3L).count() > 0 &&
          crashed.compareAndSet(false, true)) {
        merge(rows.filter(col("id") >= 3L), id)
        throw new RuntimeException("injected crash after partial apply")
      }
      merge(rows, id)
    }
    def start() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").json(srcDir.toString)
      .writeStream.foreachBatch(body)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()

    // run 1: must die on the injected crash
    val q1 = start()
    val failed =
      try { q1.awaitTermination(120000); false }
      catch { case _: StreamingQueryException => true }
    assert(failed, "first run must fail on the injected mid-batch crash")
    assert(crashed.get())
    // the partial slice really landed before the crash (id=3 present,
    // id=1 NOT at v2) — the state a naive sink cannot heal. id=1's v2
    // row rides the crashed batch's DROPPED slice, so regardless of
    // which file the source listed first, id=1 is either still at v1
    // (its f0 batch already applied) or absent (f0 not yet processed);
    // it must never be at v2 here.
    val partial = readTable(url, "crash_latest")
      .select("id", "version").as[(Long, Long)].collect().toMap
    assert(partial(3L) === 1L)
    assert(partial.get(1L).forall(_ === 1L),
      "id=1's v2 update must NOT have applied yet (v1 or absent only)")

    // run 2: restart from the same checkpoint; the failed batch replays
    // (its offsets were never committed) and the remaining file lands
    val q2 = start()
    q2.awaitTermination(120000)
    val got = readTable(url, "crash_latest")
      .select("id", "username", "version")
      .as[(Long, String, Long)].collect().toSet
    assert(got === Set((1L, "ann2", 2L), (3L, "carl", 1L), (4L, "dana", 1L)),
      "post-restart table must equal the latest-per-key batch answer " +
        "(id=2 tombstoned, the half-applied batch healed by replay)")
  }
}
