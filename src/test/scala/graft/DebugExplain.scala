package graft
object DebugExplain {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val d = "/root/testdata/sf0.01"
    for (name <- args) {
      println(s"##### $name")
      SparkEntry.queries(name)(spark, d).explain("formatted")
    }
  }
}
