package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Stage timing for the edit-distance dedup pipeline — dev tool. */
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
    // mirror editDistance's candidate stages
    val sh = graft.operators.Dedup.shingleRows(docs)
    val ranked = sh
      .withColumn("df", count(lit(1)).over(Window.partitionBy("shingle")))
      .filter(col("df") <= 10000)
      .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("df"), col("shingle"))))
    val edOMin = (n: org.apache.spark.sql.Column) =>
      greatest(lit(3L), floor((n + lit(4)) / lit(5)).cast("long"))
    val prefix = ranked.filter(col("rn") <= col("n") - edOMin(col("n")) + 3)
      .join(broadcast(docs.select(col("doc_id"),
        length(col("text")).as("len"))), "doc_id")
    time("prefix rows")(println("  rows=" + prefix.count()))
    val pCand = prefix.as("a").join(prefix.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id") &&
          (lit(3) + least(col("a.n") - col("a.rn"), col("b.n") - col("b.rn")) >=
            greatest(lit(3L), floor((greatest(col("a.n"), col("b.n")) + lit(4)) / lit(5)).cast("long"))) &&
          (lit(10) * abs(col("a.len") - col("b.len")) <=
            lit(3) * greatest(col("a.len"), col("b.len"))) &&
          (lit(5) * least(col("a.n"), col("b.n")) >=
            greatest(col("a.n"), col("b.n"))))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= 3)
      .select("a_id", "b_id")
    val pM = time("pCand + checkpoint")(pCand.localCheckpoint(true))
    println("  pairs=" + pM.count())
    val full = time("full editDistance query")(
      graft.operators.Dedup.editDistance.run(spark, sfDir).count())
    println("  out=" + full)
  }
}
