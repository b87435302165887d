package graft.operators

import org.apache.spark.sql.functions._

import graft.Q
import graft.Tables._

/** Eighth text-analysis batch: winnowing document fingerprints — the
  * MOSS plagiarism-detection selection (Schleimer et al., SIGMOD 2003)
  * that guarantees any shared substring of length ≥ k+w−1 (= 15 here)
  * yields at least one shared fingerprint, at a bounded ≈ 2/(w+1)
  * sampling density. This is the standard contamination/overlap
  * primitive between a training corpus and a benchmark set, cheaper
  * than full shingling by the density factor.
  */
object TextAnalysis8 {

  private val K = 8 // gram width (code points)
  private val W = 8 // window width (grams)

  /** Per-document winnowing profile: fingerprint count, how many of the
    * document's fingerprints are shared with ANY other document (the
    * overlap signal), and the selection density over the document's
    * k-gram count (the paper guarantees ≈ 2/(w+1) on random input).
    *
    * The row-local selection runs in ONE codegen'd pass
    * ([[graft.functions.Winnowing]]); the DuckDB oracle reproduces it
    * declaratively — same base-31 gram hashes, the same
    * `h·2³¹+(2³¹−1−pos)` key encoding, and a plain windowed MIN for
    * the rightmost-min rule — so selection parity is integer-exact.
    *
    * 100 TB shape: one corpus scan emits the winnowed keys (density-
    * bounded explode — the ONLY corpus-sized relation), one hash agg
    * per fingerprint hash for the shared-count, one shuffle join back.
    * No pairwise work: cross-doc overlap is keyed by fingerprint hash
    * exactly like the [[Dedup]] postings pipelines. */
  val winnowing: Q = Q(
    "text_winnowing",
    s"""WITH d AS (
       |  SELECT doc_id, text, LENGTH(text) - ${K - 1} AS m
       |  FROM documents WHERE LENGTH(text) >= ${K + W - 1}),
       |ks AS (
       |  SELECT doc_id, m,
       |    LIST_TRANSFORM(RANGE(1, LENGTH(text) - ${K - 2}), i ->
       |      LIST_REDUCE(LIST_PREPEND(0::BIGINT,
       |        LIST_TRANSFORM(RANGE(0, $K), k -> ASCII(text[i + k])::BIGINT)),
       |        (acc, c) -> (acc * 31 + c) % 1000000007)
       |      * 2147483648 + (2147483647 - i)) AS keys
       |  FROM d),
       |p AS (
       |  SELECT doc_id, m, key, 2147483647 - (key % 2147483648) AS pos
       |  FROM (SELECT doc_id, m, UNNEST(keys) AS key FROM ks)),
       |wm AS (
       |  SELECT doc_id, m, pos,
       |    MIN(key) OVER (PARTITION BY doc_id ORDER BY pos
       |                   ROWS BETWEEN ${W - 1} PRECEDING AND CURRENT ROW)
       |      AS sel
       |  FROM p),
       |fp AS (
       |  SELECT DISTINCT doc_id, m, sel FROM wm WHERE pos >= $W),
       |fph AS (SELECT doc_id, m, sel // 2147483648 AS h FROM fp),
       |hc AS (SELECT h, COUNT(DISTINCT doc_id)::BIGINT AS nd
       |       FROM fph GROUP BY h),
       |agg AS (
       |  SELECT fph.doc_id, MAX(fph.m) AS m, COUNT(*)::BIGINT AS n_fp,
       |    SUM(CASE WHEN hc.nd >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_shared
       |  FROM fph JOIN hc ON hc.h = fph.h GROUP BY fph.doc_id)
       |SELECT doc_id, n_fp, n_shared,
       |  CAST(n_fp AS DOUBLE) / CAST(m AS DOUBLE) AS density
       |FROM agg ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = documents(s, d)
      .filter(length(col("text")) >= K + W - 1)
      .select(col("doc_id"), (length(col("text")) - (K - 1)).as("m"),
        explode(graft.functions.Winnowing.winnowKeysCol(col("text"), K, W))
          .as("key"))
    val fph = docs.select(col("doc_id"), col("m"),
      shiftright(col("key"), 31).as("h"))
    val hc = fph.groupBy("h").agg(countDistinct("doc_id").as("nd"))
    fph.join(hc, "h")
      .groupBy("doc_id")
      .agg(max("m").as("m"), count(lit(1)).as("n_fp"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_shared"))
      .select(col("doc_id"), col("n_fp"), col("n_shared"),
        (col("n_fp").cast("double") / col("m").cast("double")).as("density"))
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(winnowing)
}
