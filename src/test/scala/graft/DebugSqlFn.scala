package graft
object DebugSqlFn {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    GraftExtensions.register(spark)
    val df = spark.sql("""
      SELECT dot_product(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)),
                         array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d""")
    df.show()
    df.explain("codegen")
  }
}
