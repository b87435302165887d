package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Timing probe for the near-dup family at sf0.1. */
object DebugCc {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val d = "/root/testdata/sf0.1"
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs"); r
    }
    val docs = Tables.documents(spark, d)
    time("warmup")(docs.count())
    time("shingleRows")(println("  rows=" + Dedup.shingleRows(docs).count()))
    time("shingleRows again")(Dedup.shingleRows(docs).count())
    time("ngram_jaccard")(Dedup.ngramJaccard.run(spark, d).count())
    time("minhash_lsh")(Dedup.minhashLsh.run(spark, d).count())
    time("simhash")(Dedup.simhashPairs.run(spark, d).count())
    time("components")(Dedup.components.run(spark, d).count())
  }
}
