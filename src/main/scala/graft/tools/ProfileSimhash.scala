package graft.tools

import org.apache.spark.sql.functions._

/** Stage timing for the simhash pipeline — dev tool. */
object ProfileSimhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val docs = graft.Tables.documents(spark, sfDir)
    docs.count()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[profile] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    import graft.operators.Dedup
    val sig = time("simhashDf (signatures)")(
      Dedup.simhashDf(docs).localCheckpoint(true))
    println("[profile] docs with signature = " + sig.count())
    val chunks = sig.select(col("doc_id"), col("sh"),
      posexplode(array((0 until 10).map(k =>
        shiftrightunsigned(col("sh"), 6 * k)
          .bitwiseAND(lit((1L << 6) - 1))): _*))
        .as(Seq("chunk_idx", "chunk")))
    val joined = chunks.as("a")
      .join(chunks.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") &&
          col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).cast("bigint").as("hamming"))
    time("bucket join co-occurrence count")(println("  rows=" + joined.count()))
    time("filter-then-distinct")(
      joined.filter(col("hamming") <= 14).distinct().count())
    time("distinct-then-filter (current)")(
      joined.distinct().filter(col("hamming") <= 14).count())
  }
}
