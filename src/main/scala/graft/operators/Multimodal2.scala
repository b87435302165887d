package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.Tables._

/** Multimodal × dedup bridge: perceptual-hash image near-duplication.
  * The corpus is BMPs built in-engine (the [[Multimodal]] convention:
  * seed-derived pixels, so the oracle restates everything from the
  * generating formula, independent of builder AND parser). Quartets of
  * consecutive doc_ids share geometry and differ only in the pixel seed
  * by ≤3 — mod-256 wraparound then perturbs a thin hyperbola of pixels,
  * the synthetic analogue of a small retouch — so planted near-dups
  * exist at every SF while cross-quartet images stay dissimilar. */
object Multimodal2 {

  /** 8×8 aHash → 4×16-bit bands → DIMENSION-BLOCKED LSH bucket join →
    * exact Hamming verify at threshold 3. Pigeonhole makes banding
    * EXACT within a block: ≤3 differing bits across 4 bands leave at
    * least one band identical, so (modulo the mirrored bucket cap) the
    * banded candidates contain every qualifying same-geometry pair —
    * the SimHash chunk argument with tighter numbers.
    *
    * The bucket key is (w, h, band, sig), not (band, sig): perceptual
    * dedup compares images within a dimension class (a retouch keeps
    * the canvas — which is also how the planted quartets are built),
    * and on a synthetic corpus the aHash bit patterns are structured
    * enough that geometry-blind banding degenerates — measured at the
    * sf1 sweep: 50k images collapse into 587 (band, sig) buckets ⇒
    * 169M candidate pairs (a recorded 168 s query), 99% of them
    * cross-geometry hash-collision noise rather than near-dups.
    * Blocking on geometry cuts that to 2.8M candidates (max bucket
    * 104) and makes the candidate count scale linearly with the
    * corpus.
    *
    * 100 TB shape: the signature is ONE codegen'd pass over 64 sampled
    * bytes per image ([[graft.functions.BmpPixels.bmpAHash]] — no
    * decode, no shuffle); candidates come from an equi-join on
    * dimension-blocked (w, h, band, sig) buckets with the house
    * [[Dedup.BandBucketCap]] guarding degenerate buckets (mirrored in
    * the oracle's QUALIFY, so both engines define the same computation
    * at every scale); the verify joins the 4-long signature row back
    * onto candidates only. Nothing is ever all-pairs. */
  val phashDedup: Q = Q(
    "mm_phash_dedup",
    s"""WITH g AS (
       |  SELECT doc_id, (doc_id // 4) % 29 + 8 AS w, (doc_id // 4) % 17 + 8 AS h
       |  FROM documents),
       |px AS (
       |  SELECT doc_id, yy * 8 + xx AS idx,
       |    (((xx * w) // 8) * ((yy * h) // 8) + doc_id) % 256 AS v
       |  FROM g CROSS JOIN UNNEST(RANGE(0, 8)) t1(xx)
       |         CROSS JOIN UNNEST(RANGE(0, 8)) t2(yy)),
       |tot AS (SELECT doc_id, CAST(SUM(v) AS BIGINT) AS s FROM px GROUP BY 1),
       |bits AS (
       |  SELECT px.doc_id, idx,
       |    CASE WHEN v * 64 > t.s THEN 1::BIGINT ELSE 0::BIGINT END AS bit
       |  FROM px JOIN tot t ON t.doc_id = px.doc_id),
       |bands AS (
       |  SELECT b.doc_id, g.w, g.h, idx // 16 AS band,
       |    CAST(SUM(bit * (1::BIGINT << (idx % 16))) AS BIGINT) AS sig
       |  FROM bits b JOIN g ON g.doc_id = b.doc_id
       |  GROUP BY 1, 2, 3, 4),
       |capped AS (
       |  SELECT doc_id, w, h, band, sig FROM bands
       |  QUALIFY COUNT(*) OVER (PARTITION BY w, h, band, sig) <= ${Dedup.BandBucketCap}),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM capped a JOIN capped b
       |    ON a.w = b.w AND a.h = b.h AND a.band = b.band AND a.sig = b.sig
       |    AND a.doc_id < b.doc_id),
       |bc AS (
       |  SELECT doc_id,
       |    MAX(CASE WHEN band = 0 THEN sig END) AS b0,
       |    MAX(CASE WHEN band = 1 THEN sig END) AS b1,
       |    MAX(CASE WHEN band = 2 THEN sig END) AS b2,
       |    MAX(CASE WHEN band = 3 THEN sig END) AS b3
       |  FROM bands GROUP BY doc_id),
       |ham AS (
       |  SELECT c.a_id, c.b_id,
       |    CAST(BIT_COUNT(XOR(x.b0, y.b0)) + BIT_COUNT(XOR(x.b1, y.b1))
       |       + BIT_COUNT(XOR(x.b2, y.b2)) + BIT_COUNT(XOR(x.b3, y.b3))
       |      AS BIGINT) AS hamming
       |  FROM cand c
       |  JOIN bc x ON x.doc_id = c.a_id
       |  JOIN bc y ON y.doc_id = c.b_id)
       |SELECT a_id, b_id, hamming FROM ham
       |WHERE hamming <= 3
       |ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
    import graft.functions.BmpPixels
    val quartet = expr("doc_id div 4")
    val media = BmpPixels.build(col("doc_id"),
      (quartet % 29 + 8).cast("int"), (quartet % 17 + 8).cast("int"))
    // one codegen'd walk per image; materialized once — signature rows
    // feed the band explode AND both sides of the Hamming verify
    val sigs = documents(s, d)
      .select(col("doc_id"),
        (quartet % 29 + 8).cast("int").as("w"),
        (quartet % 17 + 8).cast("int").as("h"),
        BmpPixels.aHash(media, 8, 8, 2).as("hash"))
      .select(col("doc_id") +: col("w") +: col("h") +:
        (0 until 4).map(k =>
          (shiftright(col("hash"), 16 * k) bitwiseAND 0xFFFFL).as(s"b$k")): _*)
      .localCheckpoint(true)
    val bands = sigs.select(col("doc_id"), col("w"), col("h"),
      posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
        .as(Seq("band", "sig")))
    val capped = bands.withColumn("__gn",
        count(lit(1)).over(Window.partitionBy("w", "h", "band", "sig")))
      .filter(col("__gn") <= Dedup.BandBucketCap)
      .drop("__gn")
    val cand = capped.as("a")
      .join(capped.as("b"),
        col("a.w") === col("b.w") && col("a.h") === col("b.h") &&
          col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
    cand
      .join(sigs.as("x"), col("a_id") === col("x.doc_id"))
      .join(sigs.as("y"), col("b_id") === col("y.doc_id"))
      .select(col("a_id"), col("b_id"),
        (bit_count(col("x.b0") bitwiseXOR col("y.b0")) +
          bit_count(col("x.b1") bitwiseXOR col("y.b1")) +
          bit_count(col("x.b2") bitwiseXOR col("y.b2")) +
          bit_count(col("x.b3") bitwiseXOR col("y.b3")))
          .cast("bigint").as("hamming"))
      .filter(col("hamming") <= 3)
      .orderBy("a_id", "b_id")
  }

  val all: Seq[Q] = Seq(phashDedup)
}
