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

    import graft.operators.Dedup
    val m = Dedup.getClass.getDeclaredMethods
      .find(_.getName == "rankedShingleRows").get
    m.setAccessible(true)
    val ranked = m.invoke(Dedup, docs, Int.box(Dedup.ShingleDfCap))
      .asInstanceOf[org.apache.spark.sql.DataFrame]

    time("shingleRows count")(Dedup.shingleRows(docs).count())
    time("rankedShingleRows count")(ranked.count())
    val prefix = ranked.filter(col("rn") <=
      col("n") - floor((col("n") + lit(1)) / lit(2)).cast("long") + 1)
    time("prefix rows count")(prefix.count())
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id") &&
          (lit(1) + least(col("a.n") - col("a.rn"), col("b.n") - col("b.rn")) >=
            floor((col("a.n") + col("b.n") + lit(2)) / lit(3)).cast("long")))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
    time("co-occurrence rows (pre-distinct)")(cand.count())
    val candD = cand.distinct()
    time("candidates (post-distinct)")(candD.count())
    time("full jaccardPairs")(Dedup.jaccardPairs(docs).count())
  }
}
