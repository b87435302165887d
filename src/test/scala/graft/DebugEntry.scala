package graft
object DebugEntry {
  def main(args: Array[String]): Unit = {
    val df = SparkEntry.entry(TestSpark.spark)
    val n = df.count()
    println(s"=== entry() rows: $n (driver smoke-checks > 0)")
    df.show(5, false)
  }
}
