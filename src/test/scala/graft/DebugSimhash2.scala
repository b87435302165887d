package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DebugSimhash2 {
  def main(a: Array[String]): Unit = {
    val dir = a.headOption.getOrElse("/tmp/sf2")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).appName("dbg-sh2").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val docs = operators.Dedup.simhashDf(Tables.documents(s, dir)).localCheckpoint(true)
    // sampled brute force: every 50th doc against ALL docs
    val sample = docs.filter(col("doc_id") % 50 === 0)
    val joined = sample.as("a").join(docs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("h"),
        col("a.sh").as("sa"), col("b.sh").as("sb"))
      .filter(col("h") <= 14)
    val shareChunk = (0 until 10).map(k =>
      (shiftrightunsigned(col("sa"), 6 * k).bitwiseAND(lit(63L)) ===
       shiftrightunsigned(col("sb"), 6 * k).bitwiseAND(lit(63L))).cast("int"))
      .reduce(_ + _) > 0
    val agg = joined.select(col("h"), when(shareChunk, 1).otherwise(0).as("found"))
      .groupBy("h").agg(count(lit(1)).as("true_pairs"), sum("found").as("found_pairs"))
      .orderBy("h")
    agg.show(30)
    s.stop()
  }
}
