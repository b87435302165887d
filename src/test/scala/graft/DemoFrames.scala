package graft
import org.apache.spark.sql.functions._
import graft.operators.Multimodal
object DemoFrames {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val media = Multimodal.asMedia(Tables.documents(spark, TestSpark.tiny).limit(3))
    println("=== frames (16-byte, every 4th) ===")
    Multimodal.sampleFrames(media, frameBytes = 16, everyN = 4)
      .toDF().select(col("doc_id"), col("frame_idx"), octet_length(col("frame")).as("n_bytes"))
      .orderBy("doc_id", "frame_idx").show(8)
  }
}
