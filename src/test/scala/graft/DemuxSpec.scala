package graft

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.sql.Timestamp

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.EncoderFactory
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{InMemorySchemaRegistry, KafkaCdc}

/** S7 whole-DB fan-out: one multi-topic record stream demuxed into
  * per-table changelogs, each decoded with its own schema. */
class DemuxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val usersSchema =
    """{"type":"record","name":"users","fields":[
      |{"name":"id","type":"int"},{"name":"username","type":"string"}]}""".stripMargin
  private val ordersSchema =
    """{"type":"record","name":"orders","fields":[
      |{"name":"order_id","type":"long"},{"name":"amount","type":"double"}]}""".stripMargin

  private def enc(json: String)(fill: GenericRecord => Unit): Array[Byte] = {
    val sc = new Schema.Parser().parse(json)
    val rec: GenericRecord = new GenericData.Record(sc)
    fill(rec)
    val out = new ByteArrayOutputStream()
    val e = EncoderFactory.get.binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](sc).write(rec, e); e.flush()
    ByteBuffer.allocate(5 + out.size())
      .put(0.toByte).putInt(1).put(out.toByteArray).array()
  }

  test("demuxTables splits a pattern-subscribed stream per table") {
    val reg = new InMemorySchemaRegistry
    reg.register("pg_schemas.public.users-value", 1, usersSchema)
    reg.register("pg_schemas.public.orders-value", 2, ordersSchema)
    val ts = Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = Seq(
      Row("1".getBytes, enc(usersSchema) { r => r.put("id", 1); r.put("username", "ann") },
        "pg_schemas.public.users", 0, 0L, ts),
      Row("9".getBytes, enc(ordersSchema) { r => r.put("order_id", 9L); r.put("amount", 12.5) },
        "pg_schemas.public.orders", 0, 0L, ts),
      Row("2".getBytes, enc(usersSchema) { r => r.put("id", 2); r.put("username", "bob") },
        "pg_schemas.public.users", 0, 1L, ts))
    val records = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), KafkaCdc.recordSchema)
    val tables = KafkaCdc.demuxTables(records, reg,
      Seq("pg_schemas.public.users", "pg_schemas.public.orders"))
    import spark.implicits._
    val users = tables("pg_schemas.public.users")
      .select("after.id", "after.username").as[(Int, String)].collect().toSet
    assert(users === Set((1, "ann"), (2, "bob")))
    val orders = tables("pg_schemas.public.orders")
      .select("after.order_id", "after.amount").as[(Long, Double)].collect().toSet
    assert(orders === Set((9L, 12.5)))
  }
}
