package graft
import org.apache.spark.sql.functions._
import graft.functions.AvroCodec
import graft.sources.KafkaSink
/** Publish-path demo: rows → Confluent-framed Avro records → decoded
  * back by the consumer path (what a registry-aware consumer sees). */
object DemoPublish {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    val json = """{"type":"record","name":"users","fields":[{"name":"id","type":"int"},{"name":"username","type":"string"}]}"""
    val recs = KafkaSink.toRecords(
      Seq((1, "ann"), (2, "bob")).toDF("id", "username"),
      key = col("id").cast("string"),
      valueStruct = struct(col("id"), col("username")),
      valueSchemaJson = json, schemaId = 7, topic = "pg.public.users.out")
    println("=== published records ===")
    recs.select(col("topic"), hex(col("key")).as("key_hex"),
      hex(col("value")).as("value_hex")).show(5, false)
    println("=== consumer-side decode of published values ===")
    recs.select(AvroCodec.confluentSchemaId(col("value")).as("schema_id"),
      AvroCodec.fromConfluentAvro(col("value"), json).as("row")).show(5, false)
  }
}
