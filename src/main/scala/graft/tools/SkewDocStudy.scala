package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Cap-drop study for the hot-template DOCUMENT tier (r14 VERDICT
  * task 5): on a [[SkewUp]] corpus — 25% of docs rewritten onto one
  * template with a per-doc variant tail — measure what the two house
  * caps actually drop, and NAME the dropped pair class instead of
  * letting the cap truncate silently.
  *
  * By construction every cross-variant hot pair shares all template
  * shingles and differs in the tail word, so its uncapped Jaccard is
  * (S−k)/(S+k) ≥ [[Dedup.JaccardThreshold]] — the uncapped hot pair
  * relation is EXACTLY C(H,2). The production relation keeps a pair
  * only if its shingles survive [[Dedup.ShingleDfCap]]; above the cap
  * the template vocabulary drops on both engines (the oracle mirrors
  * the cap in QUALIFY) and only within-variant pairs (variant-local
  * shingles) remain. Reported per run:
  *
  *   - hot_docs / variants — cluster shape
  *   - cross_variant_pairs — the combinatorial uncapped hot pair count
  *     C(H,2) − Σ C(n_v,2) (what a capless engine would emit or melt on)
  *   - overcap_shingles / overcap_postings — vocabulary the df-cap drops
  *   - hot_pairs_kept — hot-cluster pairs the PRODUCTION relation keeps
  *   - dropped_pairs — cross_variant_pairs minus kept cross-variant
  *     pairs: the named loss (zero below the cap, the whole
  *     cross-variant class above it)
  *
  * Usage: runMain graft.tools.SkewDocStudy <skewDir>
  */
object SkewDocStudy {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    val docs = graft.Tables.documents(spark, dir)
    val hot = docs.filter(col("text").rlike(" pv[0-9]+$"))
      .select(col("doc_id"),
        regexp_extract(col("text"), " (pv[0-9]+)$", 1).as("variant"))
      .localCheckpoint(true)
    val h = hot.count()
    val variantSizes = hot.groupBy("variant").count()
      .collect().map(_.getLong(1))
    val withinVariant = variantSizes.map(n => n * (n - 1) / 2).sum
    val crossVariant = h * (h - 1) / 2 - withinVariant
    val df = Dedup.shingleRows(docs).groupBy("shingle")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > Dedup.ShingleDfCap)
      .agg(count(lit(1)).as("n"), coalesce(sum("df"), lit(0L)).as("p"))
      .collect()(0)
    val (overCapShingles, overCapPostings) = (df.getLong(0), df.getLong(1))
    // production pair relation, restricted to the hot cluster
    val pairs = Dedup.jaccardPairs(docs)
    val hotIds = hot.select(col("doc_id"))
    val hotPairs = pairs
      .join(hotIds.select(col("doc_id").as("a_id")), "a_id")
      .join(hotIds.select(col("doc_id").as("b_id")), "b_id")
      .join(hot.select(col("doc_id").as("a_id"), col("variant").as("va")), "a_id")
      .join(hot.select(col("doc_id").as("b_id"), col("variant").as("vb")), "b_id")
      .select(col("a_id"), col("b_id"), (col("va") === col("vb")).as("same"))
      .localCheckpoint(true)
    val kept = hotPairs.count()
    val keptCross = hotPairs.filter(!col("same")).count()
    val dropped = crossVariant - keptCross
    spark.stop()
    val line =
      s"""{"metric":"skewdoc_study","dir":"$dir","hot_docs":$h,"variants":${variantSizes.length},"cross_variant_pairs":$crossVariant,"within_variant_pairs":$withinVariant,"overcap_shingles":$overCapShingles,"overcap_postings":$overCapPostings,"hot_pairs_kept":$kept,"cross_pairs_kept":$keptCross,"dropped_pairs":$dropped,"dropped_class":"cross-variant template pairs (df-cap)"}"""
    println(line)
    ScalePair.append("records/skewdoc.jsonl", line)
  }
}
