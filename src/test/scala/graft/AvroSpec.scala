package graft

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.EncoderFactory
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.AvroCodec

/** D1–D3: Confluent-framed Avro decode against real Avro-encoded bytes,
  * with the users schema shape from the reference (schema.avsc). */
class AvroSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val usersSchemaJson =
    """{"type":"record","name":"users","fields":[
      |{"name":"id","type":"int"},
      |{"name":"username","type":"string"},
      |{"name":"email","type":"string"},
      |{"name":"created_at","type":[{"type":"long",
      |  "connect.name":"io.debezium.time.MicroTimestamp"},"null"],"default":0}
      |]}""".stripMargin

  private def encodeUser(id: Int, username: String, email: String,
      createdAt: Option[Long]): Array[Byte] = {
    val schema = new Schema.Parser().parse(usersSchemaJson)
    val rec: GenericRecord = new GenericData.Record(schema)
    rec.put("id", id); rec.put("username", username); rec.put("email", email)
    rec.put("created_at", createdAt.map(Long.box).orNull)
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get.binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  private def confluentFrame(schemaId: Int, body: Array[Byte]): Array[Byte] =
    ByteBuffer.allocate(5 + body.length)
      .put(0.toByte).putInt(schemaId).put(body).array()

  test("fromConfluentAvro decodes a framed users record") {
    val framed = confluentFrame(7,
      encodeUser(1, "ann", "a@x.io", Some(1700000000123456L)))
    val df = Seq(framed).toDF("value")
      .select(AvroCodec.fromConfluentAvro(col("value"), usersSchemaJson).as("r"))
    val row = df.select("r.id", "r.username", "r.email", "r.created_at")
      .as[(Int, String, String, Long)].head()
    assert(row === ((1, "ann", "a@x.io", 1700000000123456L)))
  }

  test("decodes a Confluent-framed Avro KEY end-to-end (debezium key.converter)") {
    // the reference frames KEYS as Avro too (debezium.json:14-15 sets
    // key.converter = AvroConverter): the key of pg.public.users is a
    // one-field record {id} — the table's primary key
    val keySchemaJson =
      """{"type":"record","name":"users_key","fields":[
        |{"name":"id","type":"int"}]}""".stripMargin
    val schema = new Schema.Parser().parse(keySchemaJson)
    def encodeKey(id: Int): Array[Byte] = {
      val rec: GenericRecord = new GenericData.Record(schema)
      rec.put("id", id)
      val out = new ByteArrayOutputStream()
      val enc = EncoderFactory.get.binaryEncoder(out, null)
      new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
      enc.flush(); out.toByteArray
    }
    // a full (key, value) record pair, both Confluent-framed, decoded to
    // the (pk, row) shape a CDC consumer keys its state by
    val records = Seq(
      (confluentFrame(9, encodeKey(1)),
        confluentFrame(7, encodeUser(1, "ann", "a@x.io", Some(5L)))),
      (confluentFrame(9, encodeKey(2)),
        confluentFrame(7, encodeUser(2, "bob", "b@x.io", None))))
      .toDF("key", "value")
    // registry ids differ per subject (key vs value), as with a real registry
    assert(records.select(AvroCodec.confluentSchemaId(col("key")))
      .as[Int].collect().toSet === Set(9))
    val decoded = records.select(
        AvroCodec.fromConfluentAvro(col("key"), keySchemaJson)
          .getField("id").as("pk"),
        AvroCodec.fromConfluentAvro(col("value"), usersSchemaJson).as("r"))
      .select(col("pk"), col("r.username"))
      .as[(Int, String)].collect().toSet
    assert(decoded === Set((1, "ann"), (2, "bob")))
  }

  test("union-with-null created_at decodes to null (nullable column)") {
    val framed = confluentFrame(7, encodeUser(2, "bob", "b@x.io", None))
    val got = Seq(framed).toDF("value")
      .select(AvroCodec.fromConfluentAvro(col("value"), usersSchemaJson)
        .getField("created_at").as("c"))
      .collect()(0)
    assert(got.isNullAt(0))
  }

  test("confluentSchemaId reads the big-endian registry id") {
    val framed = confluentFrame(123456, encodeUser(1, "x", "y", None))
    val got = Seq(framed).toDF("value")
      .select(AvroCodec.confluentSchemaId(col("value"))).as[Int].head()
    assert(got === 123456)
  }

  test("lenient decode routes corrupt records to null (D7 resilience)") {
    val bad = confluentFrame(1, Array[Byte](1, 2)) // truncated body
    val good = confluentFrame(1, encodeUser(3, "cat", "c@x.io", Some(5L)))
    val df = Seq(bad, good).toDF("value")
      .select(AvroCodec.fromAvroLenient(
        AvroCodec.stripConfluentHeader(col("value")), usersSchemaJson).as("r"))
    val rows = df.select(col("r").isNull.as("corrupt")).as[Boolean].collect()
    assert(rows.count(identity) === 1) // bad → null
    assert(df.filter(col("r").isNotNull)
      .select("r.username").as[String].head() === "cat")
  }

  test("encode → frame → decode round-trips through the publish path") {
    import graft.sources.KafkaSink
    val rows = Seq((1, "ann", "a@x.io", Some(123456L)),
        (2, "bob", "b@x.io", None))
      .toDF("id", "username", "email", "created_at")
    val records = KafkaSink.toRecords(rows,
      key = col("id").cast("string"),
      valueStruct = struct(col("id"), col("username"), col("email"),
        col("created_at")),
      valueSchemaJson = usersSchemaJson, schemaId = 42, topic = "t.out")
    assert(records.columns.toSeq === Seq("key", "value", "topic"))
    // registry id survives framing
    assert(records.select(AvroCodec.confluentSchemaId(col("value")))
      .as[Int].collect().toSet === Set(42))
    // and the reference-style consumer decodes what we published
    val back = records.select(
        AvroCodec.fromConfluentAvro(col("value"), usersSchemaJson).as("r"))
      .select("r.id", "r.username", "r.email", "r.created_at")
      .as[(Int, String, String, Option[Long])].collect().toSet
    assert(back === Set((1, "ann", "a@x.io", Some(123456L)),
      (2, "bob", "b@x.io", None)))
  }

  test("encode round-trips map and fixed fields") {
    val schema =
      """{"type":"record","name":"mf","fields":[
        |{"name":"tags","type":{"type":"map","values":"long"}},
        |{"name":"checksum","type":{"type":"fixed","name":"c16","size":4}}
        |]}""".stripMargin
    val rows = Seq((Map("a" -> 1L, "b" -> 2L), Array[Byte](1, 2, 3, 4)))
      .toDF("tags", "checksum")
    val back = rows
      .select(AvroCodec.toAvro(struct(col("tags"), col("checksum")), schema).as("bin"))
      .select(AvroCodec.fromAvro(col("bin"), schema).as("r"))
      .select("r.tags", "r.checksum")
      .as[(Map[String, Long], Array[Byte])].head()
    assert(back._1 === Map("a" -> 1L, "b" -> 2L))
    assert(back._2.toSeq === Seq[Byte](1, 2, 3, 4))
  }

  test("hexKeyToString unhexes the replay consumer's key bytes") {
    val key = "7b226964223a317d".getBytes("UTF-8") // hex of {"id":1}
    val got = Seq(key).toDF("key")
      .select(AvroCodec.hexKeyToString(col("key"))).as[String].head()
    assert(got === """{"id":1}""")
  }

  test("MicroTimestamp long converts via timestamp_micros downstream") {
    val framed = confluentFrame(7,
      encodeUser(4, "dee", "d@x.io", Some(1700000000000000L)))
    val got = Seq(framed).toDF("value")
      .select(timestamp_micros(
        AvroCodec.fromConfluentAvro(col("value"), usersSchemaJson)
          .getField("created_at")).cast("string")).as[String].head()
    assert(got === "2023-11-14 22:13:20")
  }
}
