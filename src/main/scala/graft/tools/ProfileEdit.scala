package graft.tools

/** Stage timing for the edit-distance dedup pipeline — dev tool.
  * r09: times the REAL shared materializations (ranked postings, then
  * the verified `edit_pairs` build with the hash-key candidate join)
  * plus both registry consumers' scan-time, instead of mirroring the
  * candidate stages inline. */
object ProfileEdit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val docs = graft.Tables.documents(spark, sfDir)
    docs.count()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[profile] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    time("sharedRanked build")(
      graft.operators.Dedup.sharedRanked(spark, sfDir).count())
    val n = time("edit_pairs build (cand+verify+write)")(
      graft.operators.Dedup.sharedEditPairs(spark, sfDir).count())
    println(s"  pairs=$n")
    time("dedup_edit_distance consumer scan")(
      graft.operators.Dedup.editDistance.run(spark, sfDir).count())
    val k = time("dedup_edit_topk consumer scan")(
      graft.operators.Dedup.editTopk.run(spark, sfDir).count())
    println(s"  topk=$k")
    spark.stop()
  }
}
