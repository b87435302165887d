package graft

/** Dev driver: where does text_rouge_pairs spend its time at scale? */
object DebugRouge {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val d = args.headOption.getOrElse("/tmp/sf1")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"[t] $tag ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    val p = t("pairs-checkpoint") {
      operators.Dedup.jaccardPairs(Tables.documents(spark, d))
        .select("a_id", "b_id").localCheckpoint(true)
    }
    println("pairs rows " + t("pairs-count") { p.count() })
    println("full rows " + t("rouge-full") {
      operators.TextAnalysis6.rougePairs.run(spark, d).count()
    })
    println("full rows 2nd " + t("rouge-full-2") {
      operators.TextAnalysis6.rougePairs.run(spark, d).count()
    })
    println("jaccard alone 2nd " + t("pairs-2") {
      operators.Dedup.jaccardPairs(Tables.documents(spark, d)).count()
    })
  }
}
