package graft.tools

/** Print the POST-EXECUTION adaptive plan of a registered query — what
  * AQE actually ran, not the initial static plan. Dev tool. */
object ExplainExec {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    for (name <- args.drop(1)) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      // drive the SAME queryExecution so the adaptive plan finalizes
      val t0 = System.nanoTime()
      val n = df.queryExecution.executedPlan.execute().count()
      System.err.println(
        f"[explain] $name rows=$n ${(System.nanoTime() - t0) / 1e9}%.2fs")
      println(s"##### $name (final adaptive plan)")
      println(df.queryExecution.executedPlan.toString.take(12000))
    }
  }
}
