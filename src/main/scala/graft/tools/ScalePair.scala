package graft.tools

/** Same-session two-SF scaling read for ONE registered query — the
  * adjudication procedure SURVEY §2.6 r12 used on `sim_topk_cosine` /
  * `q69_union_by_name`, as a reusable tool instead of an ad-hoc REPL
  * session: a single warm JVM times the query min-of-2 at each SF dir
  * back-to-back, so the printed ratio carries no cross-session box
  * drift (the failure mode that manufactures phantom >2× scalers in
  * chained sweeps).
  *
  * Usage: runMain graft.tools.ScalePair <queryName> <sfDirA> <sfDirB>
  */
object ScalePair {
  def main(args: Array[String]): Unit = {
    val Array(name, dirA, dirB) = args.take(3)
    val fn = graft.SparkEntry.queries(name)
    val spark = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def timeOne(d: String): Double = {
      val t0 = System.nanoTime()
      fn(spark, d).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
      dt
    }
    // one discarded warm-up at the smaller dir absorbs codegen/JIT
    timeOne(dirA)
    val a = math.min(timeOne(dirA), timeOne(dirA))
    val b = math.min(timeOne(dirB), timeOne(dirB))
    spark.stop()
    val line =
      f"""{"metric":"scale_pair","query":"$name","a":"$dirA","b":"$dirB","sec_a":$a%.3f,"sec_b":$b%.3f,"ratio":${b / a}%.3f}"""
    println(line)
    // r14 VERDICT task 4: adjudication readings must SURVIVE the round —
    // /tmp/r14_scalepair.json held only the last reading, so two closed
    // ratios reverted to prose. Append every reading to the committed
    // JSONL so the artifact trail is in-repo.
    append("records/scalepair.jsonl", line)
  }

  /** append one JSON line to a committed records file (created with
    * parents on first use; shared by [[TwsBench]]) */
  private[tools] def append(path: String, line: String): Unit =
    try {
      val p = java.nio.file.Paths.get(path)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, line + "\n",
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    } catch { case e: Throwable =>
      System.err.println(s"[scalepair] append to $path failed: ${e.getMessage}")
    }
}
