package graft
import graft.sources.ParquetSink
import org.apache.spark.sql.functions._
object DebugSink {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    ParquetSink.writePartitioned(Tables.events(spark, TestSpark.tiny), "/tmp/graft_sink_demo", Seq("event_type"))
    ParquetSink.readTable(spark, "/tmp/graft_sink_demo")
      .filter(col("event_type") === "click").explain("formatted")
  }
}
