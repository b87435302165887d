package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement harness for the r09 `dedup_edit_distance` re-tier
  * (VERDICT r08 task 1: the registry's one remaining super-linear
  * scaler — 19.6 s / 2.72× sf2-over-sf1).
  *
  * Three candidate-generation schemes, all feeding the IDENTICAL
  * exact-shared verify + Myers edit-distance keep rule:
  *
  *   A  floor 1/5  — the r08 shipped rule (5·shared ≥ max(n)): prefix
  *                   length n − ⌈n/5⌉ + 3 ≈ 0.8n, the structural cause
  *                   of the blowup (nearly the whole postings list
  *                   self-joins).
  *   B  floor 3/5  — raised overlap floor (5·shared ≥ 3·max(n)):
  *                   prefix ≈ 0.4n + 3. B ⊆ A by construction; B ≡ A
  *                   exactly when every A-final pair shares ≥ 60% of
  *                   the larger set (r08 measured ≥ 80% at the test
  *                   SFs — this tool re-measures at sf1/sf2).
  *   C  LSH 16×2   — MinHash band shortlist (the dedup_minhash_lsh
  *                   kernel) feeding the same verify. W.h.p. recall
  *                   only: final pairs have J ≥ 2/3, so
  *                   P(miss) ≈ (5/9)^16 ≈ 8e-5 — measured here, not
  *                   assumed (the retired threshold-14 simhash lesson).
  *
  * Prints per-scheme candidate counts, stage times, final-pair counts,
  * A-final overlap-ratio minimum (the floor-safety measurement), and
  * A∖B / A∖C missed-pair counts. */
object DebugEditTier {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import graft.operators.Dedup
    val docs = graft.Tables.documents(spark, sfDir)
    docs.count()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(
        f"[edittier] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val ranked = time("ranked postings build")(
      Dedup.rankedShingleRows(docs, Dedup.ShingleDfCap).localCheckpoint(true))

    // candidate generation parameterized by the overlap floor num/5
    def candidates(floorNum: Int): DataFrame = {
      val oMin: Column => Column = n =>
        greatest(lit(3L),
          floor((n * lit(floorNum) + lit(4)) / lit(5)).cast("long"))
      val alpha: (Column, Column) => Column = (na, nb) => oMin(greatest(na, nb))
      val prefix = ranked
        .filter(col("rn") <= col("n") - oMin(col("n")) + 3)
        .join(broadcast(docs.select(col("doc_id"),
          length(col("text")).as("len"))), "doc_id")
      prefix.as("a").join(prefix.as("b"),
          col("a.shingle") === col("b.shingle") &&
            col("a.doc_id") < col("b.doc_id") &&
            (lit(3) + least(col("a.n") - col("a.rn"), col("b.n") - col("b.rn")) >=
              alpha(col("a.n"), col("b.n"))) &&
            (lit(10) * abs(col("a.len") - col("b.len")) <=
              lit(3) * greatest(col("a.len"), col("b.len"))) &&
            (lit(5) * least(col("a.n"), col("b.n")) >=
              lit(floorNum) * greatest(col("a.n"), col("b.n"))))
        .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .agg(count(lit(1)).as("w"))
        .filter(col("w") >= 3)
        .select("a_id", "b_id")
    }

    // exact-shared verify + Myers keep rule, annotated with the overlap
    // ratio so scheme A's output measures the floor headroom directly
    def verify(cand: DataFrame, floorNum: Int): DataFrame = {
      val candM = cand.localCheckpoint(true)
      System.err.println(s"[edittier]   candidates=${candM.count()}")
      val candDocs = candM.select(col("a_id").as("doc_id"))
        .union(candM.select(col("b_id").as("doc_id"))).distinct()
      val candSets = Dedup.sizeGatedBroadcast(ranked
        .join(broadcast(candDocs), "doc_id")
        .groupBy("doc_id")
        .agg(sort_array(collect_set(xxhash64(col("shingle")))).as("s")))
      candM
        .join(candSets.as("sa"), col("a_id") === col("sa.doc_id"))
        .join(candSets.as("sb"), col("b_id") === col("sb.doc_id"))
        .withColumn("shared",
          graft.functions.SortedIntersectCount(col("sa.s"), col("sb.s")))
        .filter(col("shared") >= 3 &&
          col("shared") * 5 >= lit(floorNum) *
            greatest(size(col("sa.s")), size(col("sb.s"))))
        .withColumn("maxn",
          greatest(size(col("sa.s")), size(col("sb.s"))).cast("long"))
        .select(col("a_id"), col("b_id"), col("shared"), col("maxn"))
        .join(docs.select(col("doc_id"), col("text").as("ta")),
          col("a_id") === col("doc_id")).drop("doc_id")
        .join(docs.select(col("doc_id"), col("text").as("tb")),
          col("b_id") === col("doc_id")).drop("doc_id")
        .filter(lit(10) * abs(length(col("ta")) - length(col("tb"))) <=
          lit(3) * greatest(length(col("ta")), length(col("tb"))))
        .withColumn("__ed",
          graft.functions.MyersLevenshtein(col("ta"), col("tb")))
        .filter(lit(10) * col("__ed") <=
          lit(3) * greatest(length(col("ta")), length(col("tb"))))
        .select(col("a_id"), col("b_id"), col("shared"), col("maxn"))
    }

    // ---- scheme A: shipped floor 1/5 ----
    val finalA = time("A (floor 1/5) end-to-end") {
      verify(candidates(1), 1).localCheckpoint(true)
    }
    val aCount = finalA.count()
    val ratioStats = finalA
      .agg(min(col("shared") * 5 / col("maxn")).as("min5r"),
        min(col("shared") * 100 / col("maxn")).as("minPct"))
      .collect()(0)
    System.err.println(s"[edittier] A final pairs=$aCount  " +
      s"min overlap = ${ratioStats.get(1)}% of max(n)")

    // ---- scheme B: floor 3/5 ----
    val finalB = time("B (floor 3/5) end-to-end") {
      verify(candidates(3), 3).localCheckpoint(true)
    }
    val bCount = finalB.count()
    val missedB = finalA.select("a_id", "b_id")
      .except(finalB.select("a_id", "b_id")).count()
    System.err.println(s"[edittier] B final pairs=$bCount  A-minus-B=$missedB")

    // ---- scheme C: 16-band MinHash shortlist ----
    val finalC = time("C (LSH 16x2 shortlist) end-to-end") {
      val sh = ranked.select("doc_id", "shingle")
      val signed = Dedup.withMinhashFrom(sh)
      val bands = signed.select(
        col("doc_id"),
        posexplode(array((0 until 16).map(j =>
          xxhash64(lit(j), col(s"mh_${2 * j}"), col(s"mh_${2 * j + 1}"))): _*))
          .as(Seq("band", "sig")))
      val cand = bands.as("a")
        .join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .distinct()
      verify(cand, 1).localCheckpoint(true)
    }
    val cCount = finalC.count()
    val missedC = finalA.select("a_id", "b_id")
      .except(finalC.select("a_id", "b_id")).count()
    System.err.println(s"[edittier] C final pairs=$cCount  A-minus-C=$missedC")
    spark.stop()
  }
}
