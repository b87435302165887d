package graft

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.EncoderFactory
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{InMemorySchemaRegistry, JdbcUpsertSink, KafkaCdc, SchemaRegistry}

/** Schema drift END-TO-END through the sink (r14 VERDICT task 8): an
  * EVOLVED Avro schema (new nullable column mid-stream) driven through
  * decode → upsert → landed table in one checkpointed run, with the
  * kill/restart SPANNING the evolution boundary — the whole-DB CDC
  * scenario where an upstream table changes shape while a consumer is
  * down. The replayed batch still carries old-wire-id bytes after the
  * registry moved on, which is exactly what
  * [[SchemaRegistry.resolveAndDecodeById]] exists for. */
class SchemaDriftE2ESpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val v1 =
    """{"type":"record","name":"users","fields":[
      |{"name":"id","type":"long"},
      |{"name":"username","type":"string"},
      |{"name":"version","type":"long"}]}""".stripMargin
  private val v2 =
    """{"type":"record","name":"users","fields":[
      |{"name":"id","type":"long"},
      |{"name":"username","type":"string"},
      |{"name":"version","type":"long"},
      |{"name":"email","type":["null","string"],"default":null}]}""".stripMargin

  /** Confluent wire framing: magic 0 + 4-byte registry id + avro body */
  private def enc(json: String, wireId: Int)(
      fill: GenericRecord => Unit): Array[Byte] = {
    val sc = new Schema.Parser().parse(json)
    val rec: GenericRecord = new GenericData.Record(sc)
    fill(rec)
    val out = new ByteArrayOutputStream()
    val e = EncoderFactory.get.binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](sc).write(rec, e); e.flush()
    ByteBuffer.allocate(5 + out.size())
      .put(0.toByte).putInt(wireId).put(out.toByteArray).array()
  }

  private def v1Rec(id: Long, u: String, v: Long): Array[Byte] =
    enc(v1, 1) { r => r.put("id", id); r.put("username", u); r.put("version", v) }
  private def v2Rec(id: Long, u: String, v: Long, email: String): Array[Byte] =
    enc(v2, 2) { r =>
      r.put("id", id); r.put("username", u); r.put("version", v)
      r.put("email", email)
    }

  test("evolved schema mid-stream lands through decode → upsert with a " +
    "kill/restart spanning the evolution boundary (replayed batch " +
    "carries old-wire-id bytes; mixed-id batch decodes per slice)") {
    val topic = "pg.public.users"
    val reg = new InMemorySchemaRegistry
    reg.register(s"$topic-value", 1, v1)
    val url = "jdbc:derby:memory:graft_drift;create=true"
    val srcDir = java.nio.file.Files.createTempDirectory("drift_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("drift_ckpt").toString
    var off = 0L
    def writeChunk(values: Seq[Array[Byte]]): Unit = {
      val rows = values.map { v =>
        off += 1
        Row("k".getBytes, v, topic, 0, off,
          Timestamp.valueOf("2024-01-01 00:00:00"))
      }
      spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 1), KafkaCdc.recordSchema)
        .write.mode("append").parquet(srcDir)
    }
    // pre-evolution traffic: two v1 files (one will replay post-crash)
    writeChunk(Seq(v1Rec(1L, "ann", 10L), v1Rec(2L, "bob", 11L)))
    writeChunk(Seq(v1Rec(2L, "bob2", 12L), v1Rec(3L, "carl", 13L)))

    val merge = JdbcUpsertSink(url, "drift_latest", "id", "version", "__deleted")
    val crashed = new AtomicBoolean(false)
    val body: (DataFrame, Long) => Unit = (batch, bid) => {
      // re-resolve per batch, decode per WRITER id: after the registry
      // evolves, replayed old-id bytes and fresh new-id bytes may share
      // one batch and must both decode
      val rows = SchemaRegistry.resolveAndDecodeById(batch, reg, topic)
        .filter(!col("is_tombstone"))
        .select(col("after.*"), lit(false).as("__deleted"))
        .localCheckpoint(true)
      // crash keyed on CONTENT (the batch carrying id=3), before apply,
      // so its offsets never commit and it replays AFTER the evolution
      if (rows.filter(col("id") === 3L).count() > 0 &&
          crashed.compareAndSet(false, true))
        throw new RuntimeException("injected crash before apply")
      merge(rows, bid)
    }
    def start() = spark.readStream.schema(KafkaCdc.recordSchema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream.foreachBatch(body)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()

    val q1 = start()
    val failed =
      try { q1.awaitTermination(120000); false }
      catch { case _: StreamingQueryException => true }
    assert(failed, "first run must die on the injected crash")
    assert(crashed.get())
    // the crashed batch never landed: id=3 absent
    val mid = spark.read.jdbc(url, "\"drift_latest\"", new java.util.Properties)
      .select("id").as[Long].collect().toSet
    assert(!mid.contains(3L))

    // ---- the evolution happens while the consumer is down ----
    reg.register(s"$topic-value", 2, v2)
    // post-evolution traffic: a MIXED-wire-id file (v2 update of id=1
    // with the new column + a straggler producer still writing v1)
    writeChunk(Seq(v2Rec(1L, "ann2", 20L, "a@x.io"), v1Rec(4L, "dana", 14L)))

    val q2 = start()
    q2.awaitTermination(120000)
    val got = spark.read.jdbc(url, "\"drift_latest\"", new java.util.Properties)
      .select("id", "username", "version", "email")
      .as[(Long, String, Long, Option[String])].collect().toSet
    assert(got === Set(
      (1L, "ann2", 20L, Some("a@x.io")), // v2 row: the new column landed
      (2L, "bob2", 12L, None), // replayed v1 batch, decoded under latest=v2
      (3L, "carl", 13L, None), // the crashed batch healed by replay
      (4L, "dana", 14L, None))) // v1 straggler in the mixed batch
  }

  test("resolveAndDecodeById routes tombstones and rejects unknown wire ids") {
    val topic = "pg.public.t2"
    val reg = new InMemorySchemaRegistry
    reg.register(s"$topic-value", 1, v1)
    def rec(v: Array[Byte]): Row =
      Row("k".getBytes, v, topic, 0, 0L, Timestamp.valueOf("2024-01-01 00:00:00"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(rec(v1Rec(9L, "zoe", 1L)), rec(null))),
      KafkaCdc.recordSchema)
    val out = SchemaRegistry.resolveAndDecodeById(df, reg, topic)
      .select(col("after.id"), col("is_tombstone"))
      .as[(Option[Long], Boolean)].collect().toSet
    assert(out === Set((Some(9L), false), (None, true)))
    // a wire id the registry has never seen must fail LOUDLY, not null
    val bad = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(rec(enc(v1, 99) { r =>
        r.put("id", 1L); r.put("username", "x"); r.put("version", 1L)
      }))),
      KafkaCdc.recordSchema)
    val e = intercept[IllegalStateException] {
      SchemaRegistry.resolveAndDecodeById(bad, reg, topic)
    }
    assert(e.getMessage.contains("99"))
  }
}
