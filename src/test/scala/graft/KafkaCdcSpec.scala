package graft

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.sql.Timestamp

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.EncoderFactory
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.KafkaCdc

/** S1–S7 source surface over synthesized Kafka-shaped records (the
  * connector jar isn't in this distribution; the decode pipeline is
  * source-agnostic so these records are bit-compatible with what
  * format("kafka") yields). */
class KafkaCdcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val valueSchemaJson =
    """{"type":"record","name":"users","fields":[
      |{"name":"id","type":"int"},{"name":"username","type":"string"}]}""".stripMargin

  private def avroBytes(id: Int, username: String): Array[Byte] = {
    val schema = new Schema.Parser().parse(valueSchemaJson)
    val rec: GenericRecord = new GenericData.Record(schema)
    rec.put("id", id); rec.put("username", username)
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get.binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    ByteBuffer.allocate(5 + out.size())
      .put(0.toByte).putInt(9).put(out.toByteArray).array()
  }

  private def kafkaRecords = {
    val t = "pg.public.users"
    def key(id: Int) = id.toString.getBytes("UTF-8")
    val rows = Seq(
      Row(key(1), avroBytes(1, "ann"), t, 0, 0L, Timestamp.valueOf("2024-01-01 00:00:00")),
      Row(key(2), avroBytes(2, "bob"), t, 0, 1L, Timestamp.valueOf("2024-01-01 00:00:01")),
      Row(key(1), avroBytes(1, "ann2"), t, 0, 2L, Timestamp.valueOf("2024-01-01 00:00:02")),
      Row(key(2), null, t, 0, 3L, Timestamp.valueOf("2024-01-01 00:00:03"))) // tombstone
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), KafkaCdc.recordSchema)
  }

  test("decodeCdc: Avro after-images + tombstone flags, demux cols kept") {
    val decoded = KafkaCdc.decodeCdc(kafkaRecords, valueSchemaJson)
    import spark.implicits._
    assert(decoded.filter($"is_tombstone").select("offset").as[Long].collect()
      === Array(3L))
    assert(decoded.filter($"offset" === 2L)
      .select("after.username").as[String].head() === "ann2")
    assert(decoded.columns.contains("topic"))
  }

  test("materializeTable: latest image per key, tombstoned keys dropped") {
    val decoded = KafkaCdc.decodeCdc(kafkaRecords, valueSchemaJson)
    val state = KafkaCdc.materializeTable(decoded,
      recordKey = col("key").cast("string"))
    import spark.implicits._
    val got = state.as[(Int, String)].collect().toSet
    assert(got === Set((1, "ann2"))) // key 2 deleted by tombstone
  }

  test("replayOptions builds the bounded offset-range scan (S2+S3)") {
    val o = KafkaCdc.replayOptions("broker:9092", "pg.public.users", 0, 0L, 5L)
    assert(o("startingOffsets") === """{"pg.public.users":{"0":0}}""")
    assert(o("endingOffsets") === """{"pg.public.users":{"0":5}}""")
    assert(o("kafka.isolation.level") === "read_committed")
    assert(o("assign") === """{"pg.public.users":[0]}""")
  }

  test("subscribePatternOptions covers the whole-DB fan-out (S7)") {
    val o = KafkaCdc.subscribePatternOptions("broker:9092", "pg_schemas")
    assert(o("subscribePattern") === "\\Qpg_schemas\\E\\..*")
  }
}
