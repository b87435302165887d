package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev driver: stage-level timing of the containment tiers at a given
  * SF dir. Usage: runMain graft.DebugContainment /tmp/sf1
  * Not part of the registry; measures candidate volume + verify cost for
  * (a) the exact prefix-filter tier, (b) the r=1 banded MinHash tier,
  * (c) a K-min-shingle probe tier (candidate design under evaluation). */
object DebugContainment {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[dbg] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  def main(argv: Array[String]): Unit = {
    val dir = argv.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .appName("dbg-containment").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(s, dir)

    val ranked = time("rankedShingleRows materialize") {
      val r = graft.operators.Dedup.rankedShingleRows(docs, graft.operators.Dedup.ShingleDfCap)
        .localCheckpoint(true)
      println(s"[dbg]   rows=${r.count()}")
      r
    }
    val sh = ranked.select("doc_id", "shingle")

    // (a) exact prefix-filter candidates
    val exCand = time("exact prefix candidates") {
      val c = graft.operators.Dedup2.containmentCandidatesFrom(ranked).localCheckpoint(true)
      println(s"[dbg]   cand=${c.count()}")
      c
    }
    time("exact verify") {
      println(s"[dbg]   pairs=${graft.operators.Dedup2.verifyContainment(sh, exCand).count()}")
    }

    // (b) singleton-band minhash candidates (current LSH tier)
    if (sys.env.contains("DBG_BAND")) {
    val lshCand = time("r=1 band candidates") {
      val signed = graft.operators.Dedup.withMinhashFrom(sh)
      val bands = signed.select(
        col("doc_id"),
        posexplode(array((0 until graft.operators.Dedup.NumHashes).map(i =>
          col(s"mh_$i")): _*)).as(Seq("band", "sig")))
      val capped = graft.operators.Dedup.capGroups(bands, graft.operators.Dedup.BandBucketCap, "band", "sig")
      val c = capped.as("a")
        .join(capped.as("b"),
          col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .distinct()
        .localCheckpoint(true)
      println(s"[dbg]   cand=${c.count()}")
      c
    }
    time("r=1 band verify") {
      println(s"[dbg]   pairs=${graft.operators.Dedup2.verifyContainment(sh, lshCand).count()}")
    }
    }

    // (d) 3-witness containment candidates: extend A's prefix and the
    // positional reach by w−1, then require ≥ w co-occurring shingles
    // per pair (w = min(3, ⌈0.8·n_a⌉) so tiny docs stay deterministic)
    import org.apache.spark.sql.Column
    val wCand = time("3-witness candidates") {
      val cOMin: Column => Column = n => floor((n * 4 + lit(4)) / lit(5)).cast("long")
      val wReq: Column => Column = n => least(lit(3L), cOMin(n))
      val prefix = ranked.filter(
        col("rn") <= col("n") - cOMin(col("n")) + wReq(col("n")))
      val joined = prefix.as("a").join(ranked.as("b"),
        col("a.shingle") === col("b.shingle") &&
          (col("a.n") < col("b.n") ||
            (col("a.n") === col("b.n") && col("a.doc_id") < col("b.doc_id"))) &&
          (wReq(col("a.n")) +
            least(col("a.n") - col("a.rn"), col("b.n") - col("b.rn")) >=
            cOMin(col("a.n"))))
      val c = joined
        .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .agg(count(lit(1)).as("wc"), min(wReq(col("a.n"))).as("wr"))
        .filter(col("wc") >= col("wr"))
        .select("a_id", "b_id")
        .localCheckpoint(true)
      println(s"[dbg]   cand=${c.count()}")
      c
    }
    time("3-witness verify") {
      println(s"[dbg]   pairs=${graft.operators.Dedup2.verifyContainment(sh, wCand).count()}")
    }

    // (c) K-min-shingle probes: K smallest xxhash64 shingles per doc,
    // joined against the full capped shingle relation
    for (k <- Seq[Int]()) {
      val kCand = time(s"k-min($k) candidates") {
        val hashed = sh.withColumn("h", xxhash64(col("shingle")))
        val mins = hashed
          .withColumn("rk", row_number().over(
            Window.partitionBy("doc_id").orderBy("h")))
          .filter(col("rk") <= k)
          .select(col("doc_id"), col("shingle"))
        val c = mins.as("a").join(sh.as("b"),
            col("a.shingle") === col("b.shingle") &&
              col("a.doc_id") =!= col("b.doc_id"))
          .select(least(col("a.doc_id"), col("b.doc_id")).as("a_id"),
            greatest(col("a.doc_id"), col("b.doc_id")).as("b_id"))
          .distinct()
          .localCheckpoint(true)
        println(s"[dbg]   cand=${c.count()}")
        c
      }
      time(s"k-min($k) verify") {
        println(s"[dbg]   pairs=${graft.operators.Dedup2.verifyContainment(sh, kCand).count()}")
      }
    }
    s.stop()
  }
}
