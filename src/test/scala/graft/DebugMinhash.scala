package graft
import org.apache.spark.sql.functions._
import graft.operators.Dedup
object DebugMinhash {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val d = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dbg] $label%-30s ${(System.nanoTime()-t0)/1e9}%8.2fs"); r
    }
    val docs = Tables.documents(spark, d)
    time("shingleRows count")(println("  rows=" + Dedup.shingleRows(docs).count()))
    val signed = Dedup.withMinhash(docs)
    time("withMinhash")(println("  docs=" + signed.count()))
    val bands = signed.select(col("doc_id"),
      posexplode(array((0 until 16).map(j =>
        xxhash64(lit(j), col(s"mh_${2*j}"), col(s"mh_${2*j+1}"))): _*)).as(Seq("band","sig")))
    val cand = bands.as("a").join(bands.as("b"),
      col("a.band")===col("b.band") && col("a.sig")===col("b.sig") && col("a.doc_id")<col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id")).distinct()
    time("candidates")(println("  cand=" + cand.count()))
    time("full query")(println("  out=" + Dedup.minhashLsh.run(spark, d).count()))
  }
}
