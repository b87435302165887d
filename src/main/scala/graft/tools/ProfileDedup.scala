package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.Tables

/** Stage-by-stage timing of the near-dup candidate pipeline — dev tool
  * for targeting optimization, not part of the driver contract.
  *
  * Usage: runMain graft.tools.ProfileDedup <sfDir>
  */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val docs = Tables.documents(spark, sfDir)

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[profile] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    // warm the reader
    docs.count()

    // stages come from the SAME private[graft] helpers the production
    // query composes — thresholds/filters can't silently drift from
    // what jaccardPairs actually runs
    import graft.operators.Dedup
    val ranked = Dedup.rankedShingleRows(docs, Dedup.ShingleDfCap)

    time("shingleRows count")(Dedup.shingleRows(docs).count())
    time("rankedShingleRows count")(ranked.count())
    val prefix = Dedup.prefixRows(ranked, Dedup.jaccardOMin)
    time("prefix rows count")(prefix.count())
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id") &&
          Dedup.positionalFilter(Dedup.jaccardAlpha))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
    time("co-occurrence rows (pre-distinct)")(cand.count())
    val candD = cand.distinct()
    time("candidates (post-distinct)")(candD.count())
    time("candidates (jaccardCandidatePlan)")(
      Dedup.jaccardCandidatePlan(docs).count())
    time("full jaccardPairs")(Dedup.jaccardPairs(docs).count())

    // dissect the verify stage: signature build + pair joins, with and
    // without materializing the shared lineage
    val sh = ranked.select("doc_id", "shingle")
    val candM = time("cand localCheckpoint")(candD.localCheckpoint(true))
    val candDocs = candM.select(col("a_id").as("doc_id"))
      .union(candM.select(col("b_id").as("doc_id"))).distinct()
    val candSets = sh
      .join(broadcast(candDocs), "doc_id")
      .groupBy("doc_id")
      .agg(sort_array(collect_set(xxhash64(col("shingle")))).as("s"))
    val setsM = time("candSets build (from ranked lineage)")(
      candSets.localCheckpoint(true))
    def pairJoins(label: String): Unit =
      time(label) {
        candM
          .join(setsM.as("sa"), col("a_id") === col("sa.doc_id"))
          .join(setsM.as("sb"), col("b_id") === col("sb.doc_id"))
          .withColumn("inter",
            graft.functions.SortedIntersectCount(col("sa.s"), col("sb.s")))
          .withColumn("sim", col("inter").cast("double") /
            (size(col("sa.s")) + size(col("sb.s")) - col("inter")))
          .filter(col("sim") >= Dedup.JaccardThreshold)
          .count()
      }
    // NOTE: Sessions.local already sets the ADAPTIVE threshold to 64 MB;
    // this A/B isolates the STATIC threshold (checkpointed leaves carry
    // accurate stats, so static planning can pick the broadcast directly)
    pairJoins("pair joins + intersect (static 10MB threshold)")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
    pairJoins("pair joins + intersect (static 64MB threshold)")
    println("[profile] cand pairs = " + candM.count() +
      ", cand docs = " + setsM.count())
  }
}
