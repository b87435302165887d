package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus)
    // untimed warmup: JVM/codegen/parquet-reader init shouldn't be
    // attributed to whichever query happens to run first
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/region.parquet").count()
    } catch { case _: Throwable => () }
    val pattern = args.headOption.getOrElse(".*")
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1.matches(pattern))
      .map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[bench] $name%-28s $dt%8.2fs")
        // drop leftover cached/checkpointed blocks so iterative queries
        // don't tax their successors (storage + GC pressure)
        spark.sparkContext.getPersistentRDDs.valuesIterator
          .foreach(_.unpersist(blocking = false))
        spark.catalog.clearCache()
        name -> dt
      }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // stop Spark BEFORE printing so the metric JSON is the last stdout
    // line, then also drop a file copy (both machine-readable routes)
    spark.stop()
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_last.json"), line + "\n")
    catch { case _: Throwable => () }
    println(line)
    System.out.flush()
  }
}
