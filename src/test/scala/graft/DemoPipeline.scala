package graft
import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.sql.Timestamp
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.EncoderFactory
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.sources.{Compaction, KafkaCdc, ParquetSink}
/** Full reference topology, end-to-end minus the broker: CDC records →
  * decode → append-only changelog parquet → FINAL view → compaction →
  * analytical query over the materialized table. */
object DemoPipeline {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val vs = """{"type":"record","name":"users","fields":[{"name":"id","type":"int"},{"name":"username","type":"string"},{"name":"balance","type":"double"}]}"""
    def enc(id: Int, u: String, b: Double) = {
      val sc = new Schema.Parser().parse(vs)
      val r: GenericRecord = new GenericData.Record(sc)
      r.put("id", id); r.put("username", u); r.put("balance", b)
      val o = new ByteArrayOutputStream(); val e = EncoderFactory.get.binaryEncoder(o, null)
      new GenericDatumWriter[GenericRecord](sc).write(r, e); e.flush()
      ByteBuffer.allocate(5 + o.size()).put(0.toByte).putInt(1).put(o.toByteArray).array()
    }
    val t = "pg.public.users"
    def rec(key: String, v: Array[Byte], off: Long) =
      Row(key.getBytes, v, t, 0, off, Timestamp.valueOf("2024-01-01 00:00:00"))
    val records = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      rec("1", enc(1, "ann", 10.0), 0), rec("2", enc(2, "bob", 20.0), 1),
      rec("1", enc(1, "ann", 35.0), 2), rec("3", enc(3, "cat", 5.0), 3),
      rec("2", null, 4))), KafkaCdc.recordSchema)
    val dir = java.nio.file.Files.createTempDirectory("graft_pipe").toString + "/users"
    // 1. decode + append changelog
    val decoded = KafkaCdc.decodeCdc(records, vs)
      .select(col("key").cast("string").as("k"), col("after.*"),
        col("is_tombstone"), col("partition"), col("offset"))
    ParquetSink.writePartitioned(decoded, dir, Nil, mode = "append")
    println(s"=== changelog rows: ${spark.read.parquet(dir).count()}")
    // 2. FINAL view pre-compaction
    Compaction.stateView(spark.read.parquet(dir), Seq("k"),
      Seq(col("partition"), col("offset")), col("is_tombstone"))
      .select("id", "username", "balance").orderBy("id").show()
    // 3. compact, then query the materialized table analytically
    Compaction.compact(spark, dir, Seq("k"),
      Seq(col("partition"), col("offset")), col("is_tombstone"))
    val state = spark.read.parquet(dir)
    println(s"=== compacted rows: ${state.count()}")
    state.agg(sum(col("balance").cast("decimal(18,2)")).cast("double")
      .as("total_balance")).show()
  }
}
