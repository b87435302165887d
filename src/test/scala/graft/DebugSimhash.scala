package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DebugSimhash {
  def main(a: Array[String]): Unit = {
    val dir = a.headOption.getOrElse("/tmp/sf2")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).appName("dbg-sh").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val out = operators.Dedup.simhashPairs.run(s, dir)
    out.groupBy((col("hamming")).as("h")).count().orderBy("h").show(40)
    val docs = operators.Dedup.simhashDf(Tables.documents(s, dir)).localCheckpoint(true)
    println(s"docs=${docs.count()}")
    val chunks = docs.select(col("doc_id"),
      posexplode(array((0 until 10).map(k =>
        shiftrightunsigned(col("sh"), 6 * k).bitwiseAND(lit(63L))): _*))
        .as(Seq("ci", "c")))
    val vol = chunks.groupBy("ci", "c").count()
      .select(sum(col("count") * (col("count") - 1) / 2)).first()
    println(s"cobucket pairs = $vol")
    s.stop()
  }
}
