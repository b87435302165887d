package graft
import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.sql.Timestamp
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.EncoderFactory
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.sources.KafkaCdc
/** End-to-end CDC pipeline demo: synthesized Confluent-Avro Kafka records
  * → decode → materialize — the full reference topology minus the broker. */
object DemoCdc {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val vs = """{"type":"record","name":"users","fields":[{"name":"id","type":"int"},{"name":"username","type":"string"}]}"""
    def enc(id: Int, u: String) = {
      val sc = new Schema.Parser().parse(vs)
      val r: GenericRecord = new GenericData.Record(sc); r.put("id", id); r.put("username", u)
      val o = new ByteArrayOutputStream(); val e = EncoderFactory.get.binaryEncoder(o, null)
      new GenericDatumWriter[GenericRecord](sc).write(r, e); e.flush()
      ByteBuffer.allocate(5 + o.size()).put(0.toByte).putInt(1).put(o.toByteArray).array()
    }
    val t = "pg.public.users"
    val rows = Seq(
      Row("1".getBytes, enc(1, "ann"), t, 0, 0L, Timestamp.valueOf("2024-01-01 00:00:00")),
      Row("1".getBytes, enc(1, "ann2"), t, 0, 1L, Timestamp.valueOf("2024-01-01 00:00:01")),
      Row("2".getBytes, enc(2, "bob"), t, 0, 2L, Timestamp.valueOf("2024-01-01 00:00:02")),
      Row("2".getBytes, null, t, 0, 3L, Timestamp.valueOf("2024-01-01 00:00:03")))
    val records = spark.createDataFrame(spark.sparkContext.parallelize(rows), KafkaCdc.recordSchema)
    val decoded = KafkaCdc.decodeCdc(records, vs)
    println("=== decoded changelog ===")
    decoded.select("after", "is_tombstone", "offset").show(10, false)
    println("=== materialized state ===")
    KafkaCdc.materializeTable(decoded, col("key").cast("string")).show(10, false)
  }
}
