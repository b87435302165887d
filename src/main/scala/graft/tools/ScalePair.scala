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

  /** Resolve the repo root so a relative `records/<name>.jsonl` path lands in the
    * committed tree no matter where the JVM was launched (r15 ADVICE: a run
    * outside the repo root silently wrote the adjudication record elsewhere —
    * the exact loss mode the committed-records change was meant to fix).
    * Order: `-Dgraft.repo.root` / `GRAFT_REPO_ROOT`, else walk up from CWD to
    * the first directory holding `build.sbt`. No root found = loud failure,
    * because a lost adjudication reading is worse than a crashed tool run.
    */
  private[tools] def repoRoot(): java.nio.file.Path = {
    import java.nio.file.{Files, Paths}
    sys.props.get("graft.repo.root").orElse(sys.env.get("GRAFT_REPO_ROOT")) match {
      case Some(r) => Paths.get(r)
      case None =>
        var d = Paths.get("").toAbsolutePath
        while (d != null && !Files.exists(d.resolve("build.sbt"))) d = d.getParent
        if (d == null) throw new IllegalStateException(
          "[records] cannot locate repo root (no build.sbt above CWD); " +
            "set GRAFT_REPO_ROOT or -Dgraft.repo.root")
        d
    }
  }

  /** Round id stamped onto every appended record (r15 VERDICT task 6: rows
    * were indistinguishable across rounds). `Date.now` is unavailable by
    * design, so the id is passed in via `-Dgraft.round` / `GRAFT_ROUND`. */
  private[tools] def roundTag(): String =
    sys.props.get("graft.round").orElse(sys.env.get("GRAFT_ROUND")).getOrElse("unset")

  /** append one JSON line to a committed records file (created with parents
    * on first use; shared by [[TwsBench]], [[MediaDedupBench]],
    * [[SkewDocStudy]]). The line is stamped with a `round` field and the path
    * is anchored to the repo root; a failed append throws rather than
    * whispering to stderr. */
  private[tools] def append(path: String, line: String): Unit = {
    val stamped =
      if (line.endsWith("}")) line.dropRight(1) + s""","round":"${roundTag()}"}"""
      else line
    val p = repoRoot().resolve(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, stamped + "\n",
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
  }
}
