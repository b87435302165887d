package graft
import org.apache.spark.sql.functions._
object DebugBm25 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq((4L, 15L, 398L, 500L, 27165.0/500)).toDF("tf","dl","df","n","avgdl")
    val idf = graft.functions.MathExpressions.lnLibm(
      ((col("n") - col("df") + 0.5) / (col("df") + 0.5)) + 1.0)
    val score = idf * ((col("tf") * 2.2) /
      (col("tf") + lit(1.2) * ((lit(1.0) - 0.75) +
        lit(0.75) * (col("dl") / col("avgdl")))))
    val parts = df.select(
      idf.as("idf"),
      (col("tf") * 2.2).as("num"),
      (col("tf") + lit(1.2) * ((lit(1.0) - 0.75) + lit(0.75) * (col("dl") / col("avgdl")))).as("den"),
      score.as("score"))
    val r = parts.collect()(0)
    println(s"spark idf=${r.getDouble(0)} num=${r.getDouble(1)} den=${r.getDouble(2)} score=${r.getDouble(3)}")
    val tf=4L; val dl=15L; val dff=398L; val n=500L; val avgdl=27165.0/500
    val sIdf = java.lang.Math.log(((n - dff + 0.5) / (dff + 0.5)) + 1.0)
    val sDen = tf + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / avgdl))
    val sScore = sIdf * ((tf * 2.2) / sDen)
    println(s"scala idf=$sIdf num=${tf*2.2} den=$sDen score=$sScore")
  }
}
