package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.Tables._

/** Multimodal × dedup bridge: perceptual-hash image near-duplication —
  * the image-dedup stage an LLM multimodal pipeline runs, end-to-end:
  * signature (aHash) → banded candidate generation → exact Hamming
  * verify → connected components → canonical keep list, plus the
  * rescale-invariance property that makes a perceptual hash the right
  * key in the first place.
  *
  * The corpus is BMPs built in-engine (the [[Multimodal]] convention:
  * seed-derived pixels, so the oracle restates everything from the
  * generating formula, independent of builder AND parser). Quartets of
  * consecutive doc_ids share geometry and differ only in the pixel seed
  * by ≤3 — mod-256 wraparound then perturbs a thin hyperbola of pixels,
  * the synthetic analogue of a small retouch — so planted near-dups
  * exist at every SF while cross-quartet images stay dissimilar. */
object Multimodal2 {

  /** The verified near-dup pair relation (a_id, b_id, hamming ≤ 3), as
    * oracle SQL — shared by [[phashDedup]] (the pair dump) and
    * [[phashComponents]] (the cluster consumer), exactly like
    * [[Dedup.duckJaccardPairs]] backs the text CC family. */
  private[graft] val duckPhashPairs: String =
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
       |WHERE hamming <= 3""".stripMargin

  /** The verified pair relation, MATERIALIZED once per (session, corpus)
    * like [[Dedup.sharedPairs]] — the `image_neardup_pairs` lake table
    * both the pair dump and the component labeling scan, instead of
    * re-running the band/verify pipeline per consumer. */
  private[graft] def phashPairs(s: SparkSession, d: String): DataFrame =
    Dedup.sharedMat(s, d, "phash_pairs")(phashPairsBuild(s, d))

  /** Component labels over the pair graph, materialized like
    * [[Dedup.sharedLabels]]: the iterative CC loop (703k pairs at sf1)
    * is once-per-corpus lake work (`image_dedup_labels`), not per-query
    * cost — without this the labeling re-ran per query at 9.8 s sf1 /
    * 13.8 s sf2, the exact shape r13 task 8 flagged on
    * dedup_embedding_cosine. */
  private[graft] def phashLabels(s: SparkSession, d: String): DataFrame =
    Dedup.sharedMat(s, d, "phash_labels")(
      Dedup.connectedComponents(phashPairs(s, d)))

  /** The banded-Hamming candidate machinery, shared by the image
    * (aHash, [[phashPairs]]) and audio (sign-of-energy-delta
    * fingerprint, [[audioFingerprint]]) near-dup tiers: 64-bit
    * signature rows → 4×16-bit band explode → block-keyed LSH bucket
    * join under [[Dedup.BandBucketCap]] → exact Hamming verify against
    * the signature rows, candidates only. Pigeonhole makes banding
    * EXACT within a block for threshold ≤ 3: ≤3 differing bits across
    * 4 bands leave one band identical. `sigsIn` carries (doc_id,
    * blockCols…, hash); nothing here is ever all-pairs. */
  private def bandedHammingPairs(sigsIn: DataFrame, blockCols: Seq[String],
      threshold: Int): DataFrame = {
    // one codegen'd walk per row; materialized once — signature rows
    // feed the band explode AND both sides of the Hamming verify
    val sigs = sigsIn
      .select((col("doc_id") +: blockCols.map(col)) ++
        (0 until 4).map(k =>
          (shiftright(col("hash"), 16 * k) bitwiseAND 0xFFFFL).as(s"b$k")): _*)
      .localCheckpoint(true)
    val bands = sigs.select((col("doc_id") +: blockCols.map(col)) :+
      posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
        .as(Seq("band", "sig")): _*)
    val bucketKey = blockCols ++ Seq("band", "sig")
    val capped = bands.withColumn("__gn",
        count(lit(1)).over(Window.partitionBy(bucketKey.map(col): _*)))
      .filter(col("__gn") <= Dedup.BandBucketCap)
      .drop("__gn")
    val cand = capped.as("a")
      .join(capped.as("b"),
        bucketKey.map(k => col(s"a.$k") === col(s"b.$k")).reduce(_ && _) &&
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
      .filter(col("hamming") <= threshold)
  }

  private[graft] def phashPairsBuild(s: SparkSession, d: String): DataFrame = {
    import graft.functions.BmpPixels
    val quartet = expr("doc_id div 4")
    val media = BmpPixels.build(col("doc_id"),
      (quartet % 29 + 8).cast("int"), (quartet % 17 + 8).cast("int"))
    val sigs = documents(s, d)
      .select(col("doc_id"),
        (quartet % 29 + 8).cast("int").as("w"),
        (quartet % 17 + 8).cast("int").as("h"),
        BmpPixels.aHash(media, 8, 8, 2).as("hash"))
    bandedHammingPairs(sigs, Seq("w", "h"), 3)
  }

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
    * corpus. (Pure 64-bit-hash grouping degenerates the same way on
    * this corpus: seed shifts wrap only a thin hyperbola of samples,
    * so 50k images share 3.4k distinct hashes — 8M exact-hash pairs.)
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
    duckPhashPairs + "\nORDER BY a_id, b_id") { (s, d) =>
    phashPairs(s, d).orderBy("a_id", "b_id")
  }

  /** Image near-dup CLUSTERS: connected components over the verified
    * pair graph, one canonical representative (min doc_id) per cluster
    * — the keep-one-copy step a multimodal curation pipeline actually
    * executes after candidate verification, completing signature →
    * candidates → verify → clusters → keep for the MEDIA column the
    * way [[Dedup.components]]/[[Dedup.keepCanonical]] do for text.
    * `keep` marks the canonical member; `n_members` sizes the cluster
    * (the dedup-inflation statistic per image cluster).
    *
    * 100 TB shape: [[Dedup.connectedComponents]]'s alternating
    * hash-agg/join rounds with pointer compression (O(log diameter)
    * rounds) run ONCE per corpus snapshot into the materialized
    * [[phashLabels]] lake table; the registered query is a linear scan
    * plus one small window over clustered rows only. */
  val phashComponents: Q = Q(
    "mm_phash_components",
    s"""WITH RECURSIVE jp AS ($duckPhashPairs),
       |edges AS (
       |  SELECT a_id AS src, b_id AS dst FROM jp
       |  UNION SELECT b_id, a_id FROM jp),
       |reach(src, dst) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |labels AS (
       |  SELECT src AS id, LEAST(src, MIN(dst)) AS rep_id
       |  FROM reach GROUP BY src)
       |SELECT id, rep_id, id = rep_id AS keep,
       |  CAST(COUNT(*) OVER (PARTITION BY rep_id) AS BIGINT) AS n_members
       |FROM labels
       |ORDER BY id""".stripMargin) { (s, d) =>
    phashLabels(s, d)
      .select(col("id"), col("rep_id"),
        (col("id") === col("rep_id")).as("keep"),
        count(lit(1)).over(Window.partitionBy("rep_id"))
          .cast("bigint").as("n_members"))
      .orderBy("id")
  }

  /** Rescale invariance — WHY a perceptual hash is the dedup key: for
    * every document, three renditions of the same content are built
    * ([[graft.functions.BmpPixels.buildBmpResampled]] — base w×h, a 2×
    * nearest-neighbor upscale, a ½ NN downscale), hashed independently,
    * and compared. The 2× upscale provably hashes IDENTICALLY
    * (⌊⌊x·2w/8⌋/2⌋ = ⌊x·w/8⌋ — the sample grid lands on the same
    * source pixels), so ham_up ≡ 0: a resized duplicate is caught at
    * Hamming 0 even though byte-level dedup sees two unrelated blobs
    * and the geometry-blocked pair query cannot pair across canvases.
    * The ½ downscale loses information, so ham_down is small but
    * nonzero where the coarser grid snaps to different source pixels —
    * the measured degradation a threshold choice trades against.
    *
    * The oracle re-derives all three hashes from the generating
    * formulas by composing the two NN index maps in integer arithmetic
    * — fully independent of builder and walker, so a rounding slip in
    * either index map hash-mismatches. 100 TB shape: three codegen'd
    * 64-byte walks per image, zero shuffles beyond the final sort. */
  val phashRescale: Q = Q(
    "mm_phash_rescale",
    """WITH g AS (
      |  SELECT doc_id, (doc_id // 4) % 29 + 8 AS w, (doc_id // 4) % 17 + 8 AS h
      |  FROM documents),
      |px AS (
      |  SELECT doc_id, w, h,
      |    (((xx * w) // 8) * ((yy * h) // 8) + doc_id) % 256 AS vb,
      |    ((((xx * (2 * w)) // 8) * w // (2 * w))
      |      * (((yy * (2 * h)) // 8) * h // (2 * h)) + doc_id) % 256 AS vu,
      |    ((((xx * (w // 2)) // 8) * w // (w // 2))
      |      * (((yy * (h // 2)) // 8) * h // (h // 2)) + doc_id) % 256 AS vd
      |  FROM g CROSS JOIN UNNEST(RANGE(0, 8)) t1(xx)
      |         CROSS JOIN UNNEST(RANGE(0, 8)) t2(yy)),
      |tot AS (
      |  SELECT doc_id, SUM(vb) AS sb, SUM(vu) AS su, SUM(vd) AS sd
      |  FROM px GROUP BY 1),
      |bits AS (
      |  SELECT px.doc_id,
      |    CASE WHEN vb * 64 > t.sb THEN 1 ELSE 0 END AS ba,
      |    CASE WHEN vu * 64 > t.su THEN 1 ELSE 0 END AS bu,
      |    CASE WHEN vd * 64 > t.sd THEN 1 ELSE 0 END AS bd
      |  FROM px JOIN tot t ON t.doc_id = px.doc_id)
      |SELECT b.doc_id, CAST(g.w AS BIGINT) AS w, CAST(g.h AS BIGINT) AS h,
      |  CAST(SUM(CASE WHEN ba <> bu THEN 1 ELSE 0 END) AS BIGINT) AS ham_up,
      |  CAST(SUM(CASE WHEN ba <> bd THEN 1 ELSE 0 END) AS BIGINT) AS ham_down
      |FROM bits b JOIN g ON g.doc_id = b.doc_id
      |GROUP BY 1, 2, 3
      |ORDER BY 1""".stripMargin) { (s, d) =>
    import graft.functions.BmpPixels
    val quartet = expr("doc_id div 4")
    val w = (quartet % 29 + 8).cast("int")
    val h = (quartet % 17 + 8).cast("int")
    val hBase = BmpPixels.aHash(BmpPixels.build(col("doc_id"), w, h), 8, 8, 2)
    val hUp = BmpPixels.aHash(
      BmpPixels.buildResampled(col("doc_id"), w, h, 2, 1), 8, 8, 2)
    val hDown = BmpPixels.aHash(
      BmpPixels.buildResampled(col("doc_id"), w, h, 1, 2), 8, 8, 2)
    documents(s, d)
      .select(col("doc_id"), w.cast("bigint").as("w"), h.cast("bigint").as("h"),
        bit_count(hBase bitwiseXOR hUp).cast("bigint").as("ham_up"),
        bit_count(hBase bitwiseXOR hDown).cast("bigint").as("ham_down"))
      .orderBy("doc_id")
  }

  /** AUDIO near-dup — media dedup's third modality (image aHash ↑,
    * text shingles in [[Dedup]]): a sign-of-energy-delta fingerprint
    * (the Haitsma–Kalker shape reduced to one band) over real RIFF/WAVE
    * PCM bytes. Content pairs (doc_id div 2) share a sample stream;
    * the odd rendition is a simulated RE-ENCODE — truncating half gain
    * plus a deterministic ±200 dither (~2.5% full scale) — so planted
    * pairs land at Hamming 0–4 (gain invariance is the fingerprint's
    * point: uniform scaling preserves every energy-delta sign; only the
    * dither's near-tie flips cost bits, and pairs pushed past the
    * threshold are legitimately missed on BOTH engines). Samples mix
    * content and position through two XORed congruential streams
    * ([[graft.functions.PcmSamples.fpSample]]) — the linear-ramp
    * corpus' quasi-periodic energies collapse 20k fingerprints into
    * ~2.5k values (measured), the geometry-blind-aHash degeneracy in
    * audio form.
    *
    * Blocking key is (n, band, sig): duration class plays the role
    * image geometry does — a re-encode keeps the length, and
    * same-length blocking keeps buckets linear. Candidates ride the
    * shared [[bandedHammingPairs]] machinery (bucket join under
    * [[Dedup.BandBucketCap]], mirrored in the oracle's QUALIFY; exact
    * Hamming verify on candidates only — never all-pairs).
    *
    * 100 TB shape: ONE codegen'd chunk-walk per audio blob computes
    * the 64-bit fingerprint (no decode, no shuffle); everything after
    * is the banded equi-join. The oracle re-derives fingerprints from
    * the generating formulas per sample — frame membership uses the
    * identical integer closed form (65·i+64)//n on both engines. */
  val audioFingerprint: Q = Q(
    "mm_audio_fingerprint",
    s"""WITH p AS (
       |  SELECT doc_id, doc_id // 2 AS c,
       |    400 + ((doc_id // 2) % 13) * 40 AS n
       |  FROM documents),
       |s AS (SELECT doc_id, c, n, UNNEST(RANGE(0, n)) AS i FROM p),
       |v0 AS (
       |  SELECT doc_id, n, i,
       |    (XOR((c % 100003 + 1) * 2654435761 + (i + 1) * 40503,
       |         (c % 100003 + 7) * 1103515245
       |           + (i + 1) * (i + 1) * 2246822519)
       |      % 65536) - 32768 AS v
       |  FROM s),
       |v AS (
       |  SELECT doc_id, n, i,
       |    CASE WHEN doc_id % 2 = 1 THEN (v // 2) + ((i * 37) % 401) - 200
       |         ELSE v END AS v
       |  FROM v0),
       |e AS (
       |  SELECT doc_id, n, (65 * i + 64) // n AS f,
       |    CAST(SUM(v * v) AS BIGINT) AS e
       |  FROM v GROUP BY 1, 2, 3),
       |bits AS (
       |  SELECT a.doc_id, a.n, a.f AS idx,
       |    CASE WHEN b.e > a.e THEN 1::BIGINT ELSE 0::BIGINT END AS bit
       |  FROM e a JOIN e b ON b.doc_id = a.doc_id AND b.f = a.f + 1
       |  WHERE a.f < 64),
       |bands AS (
       |  SELECT doc_id, n, idx // 16 AS band,
       |    CAST(SUM(bit * (1::BIGINT << (idx % 16))) AS BIGINT) AS sig
       |  FROM bits GROUP BY 1, 2, 3),
       |capped AS (
       |  SELECT doc_id, n, band, sig FROM bands
       |  QUALIFY COUNT(*) OVER (PARTITION BY n, band, sig) <= ${Dedup.BandBucketCap}),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM capped a JOIN capped b
       |    ON a.n = b.n AND a.band = b.band AND a.sig = b.sig
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
    import graft.functions.PcmSamples
    val c = expr("doc_id div 2")
    val n = lit(400) + (c % 13) * 40
    val rate = lit(8000) + (c % 8) * 4000
    val media = when(col("doc_id") % 2 === 0,
        PcmSamples.buildFp(c, rate, n, 0))
      .otherwise(PcmSamples.buildFp(c, rate, n, 1))
    val sigs = documents(s, d)
      .select(col("doc_id"), n.cast("bigint").as("n"),
        PcmSamples.fingerprint(media, 64).as("hash"))
    bandedHammingPairs(sigs, Seq("n"), 3).orderBy("a_id", "b_id")
  }

  /** FRAME-SEQUENCE (video-shaped) near-dup — the modality matrix's
    * fourth row (text shingles, image aHash, audio energy-delta, now
    * temporal frame structure): the re-encoded-CLIP case a multimodal
    * training pipeline dedups. Content pairs (doc_id div 2) share a
    * frame sequence; the odd rendition is a simulated RE-ENCODE — every
    * payload byte changes (new entropy coding, so byte/exact-hash dedup
    * sees two unrelated blobs) and the frame timing re-quantizes by a
    * deterministic ±1-centisecond dither, the real-world
    * timestamp-rounding artifact. The fingerprint
    * ([[graft.functions.GifFrames.gifFingerprint]]) folds per-frame
    * stat = delay + w·h (the codec-free temporal/canvas scalars a
    * re-encode preserves — per-frame LUMA would require the LZW decode
    * a re-encode invalidates) into 65 integer-grid windows and signs
    * consecutive window deltas: the audio fingerprint's shape applied
    * to frames, so uniform time-scaling preserves every bit and only
    * the dither's near-tie flips cost Hamming distance (planted pairs
    * land at 0–4; pairs pushed past the threshold are legitimately
    * missed on BOTH engines).
    *
    * Blocking key is (n, band, sig): frame COUNT plays the role image
    * geometry and audio duration do — a re-encode keeps the frame
    * sequence, and same-count blocking keeps buckets linear. Candidates
    * ride the shared [[bandedHammingPairs]] machinery (bucket join
    * under [[Dedup.BandBucketCap]], mirrored in the oracle's QUALIFY;
    * exact Hamming verify on candidates only — never all-pairs).
    *
    * 100 TB shape: ONE codegen'd block-walk per container computes the
    * 64-bit fingerprint (no codec, no shuffle — same cost class as the
    * [[graft.functions.GifFrames.gifWalk]] inventory pass the r13
    * `mm_gif_frames` query proved); everything after is the banded
    * equi-join. The oracle re-derives fingerprints from the generating
    * formulas per frame — window membership uses the identical integer
    * closed form (65·i+64)//n on both engines. */
  val framehashDedup: Q = Q(
    "mm_framehash_dedup",
    s"""WITH p AS (
       |  SELECT doc_id, doc_id // 2 AS c,
       |    66 + ((doc_id // 2) % 13) * 13 AS n
       |  FROM documents),
       |s AS (SELECT doc_id, c, n, UNNEST(RANGE(0, n)) AS i FROM p),
       |d0 AS (
       |  SELECT doc_id, c, n, i,
       |    (XOR((c % 100003 + 3) * 2654435761 + (i + 1) * 48271,
       |         (c % 100003 + 11) * 1103515245
       |           + (i + 1) * (i + 1) * 2246822519)
       |      % 500) + 1 AS d
       |  FROM s),
       |st AS (
       |  SELECT doc_id, n, i,
       |    (CASE WHEN doc_id % 2 = 1 THEN d + (i * 41) % 3 - 1 ELSE d END)
       |      + (i % 3 + 1) * ((c + i) % 2 + 1) AS stat
       |  FROM d0),
       |e AS (
       |  SELECT doc_id, n, (65 * i + 64) // n AS f,
       |    CAST(SUM(stat) AS BIGINT) AS e
       |  FROM st GROUP BY 1, 2, 3),
       |bits AS (
       |  SELECT a.doc_id, a.n, a.f AS idx,
       |    CASE WHEN b.e > a.e THEN 1::BIGINT ELSE 0::BIGINT END AS bit
       |  FROM e a JOIN e b ON b.doc_id = a.doc_id AND b.f = a.f + 1
       |  WHERE a.f < 64),
       |bands AS (
       |  SELECT doc_id, n, idx // 16 AS band,
       |    CAST(SUM(bit * (1::BIGINT << (idx % 16))) AS BIGINT) AS sig
       |  FROM bits GROUP BY 1, 2, 3),
       |capped AS (
       |  SELECT doc_id, n, band, sig FROM bands
       |  QUALIFY COUNT(*) OVER (PARTITION BY n, band, sig) <= ${Dedup.BandBucketCap}),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM capped a JOIN capped b
       |    ON a.n = b.n AND a.band = b.band AND a.sig = b.sig
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
    import graft.functions.GifFrames
    val c = expr("doc_id div 2")
    val n = lit(66) + (c % 13) * 13
    val media = when(col("doc_id") % 2 === 0, GifFrames.buildFp(c, n, 0))
      .otherwise(GifFrames.buildFp(c, n, 1))
    val sigs = documents(s, d)
      .select(col("doc_id"), n.cast("bigint").as("n"),
        GifFrames.fingerprint(media, 64).as("hash"))
    bandedHammingPairs(sigs, Seq("n"), 3).orderBy("a_id", "b_id")
  }

  /** The frame-sequence temporal fingerprint over a SECOND container
    * grammar (r15 VERDICT task 8): [[framehashDedup]]'s 65-window
    * sign-of-delta fold applied to EBML (Matroska/WebM) CLUSTER
    * TIMESTAMPS instead of GIF frame delays — same corpus pairing
    * (doc pairs share c = doc_id div 2; the odd rendition re-encodes
    * with disjoint SimpleBlock payload bytes and a ±1 timestamp
    * re-quantization dither), same shared [[bandedHammingPairs]]
    * machinery, same cluster-COUNT blocking, and literally the same
    * fold code ([[graft.functions.GifFrames.gifFingerprintFromStats]])
    * — the proof the fingerprint is container-agnostic: only the
    * stats collector ([[graft.functions.EbmlTree.ebmlClusterStats]],
    * one validated VINT-tree walk) knows the grammar.
    *
    * 100 TB shape identical to [[framehashDedup]]: one codegen'd walk
    * per container, then the banded equi-join — no codec, no
    * all-pairs. Oracle re-derives the per-cluster deltas from the
    * generating formula ([[graft.functions.EbmlTree.fpClusterDelta]]). */
  val ebmlFramehash: Q = Q(
    "mm_ebml_framehash",
    s"""WITH p AS (
       |  SELECT doc_id, doc_id // 2 AS c,
       |    66 + ((doc_id // 2) % 13) * 13 AS n
       |  FROM documents),
       |s AS (SELECT doc_id, c, n, UNNEST(RANGE(0, n)) AS i FROM p),
       |d0 AS (
       |  SELECT doc_id, c, n, i,
       |    (XOR((c % 100003 + 5) * 2654435761 + (i + 1) * 48271,
       |         (c % 100003 + 13) * 1103515245
       |           + (i + 1) * (i + 1) * 2246822519)
       |      % 500) + 1 AS d
       |  FROM s),
       |st AS (
       |  SELECT doc_id, n, i,
       |    CASE WHEN doc_id % 2 = 1 THEN d + (i * 37) % 3 - 1 ELSE d END
       |      AS stat
       |  FROM d0),
       |e AS (
       |  SELECT doc_id, n, (65 * i + 64) // n AS f,
       |    CAST(SUM(stat) AS BIGINT) AS e
       |  FROM st GROUP BY 1, 2, 3),
       |bits AS (
       |  SELECT a.doc_id, a.n, a.f AS idx,
       |    CASE WHEN b.e > a.e THEN 1::BIGINT ELSE 0::BIGINT END AS bit
       |  FROM e a JOIN e b ON b.doc_id = a.doc_id AND b.f = a.f + 1
       |  WHERE a.f < 64),
       |bands AS (
       |  SELECT doc_id, n, idx // 16 AS band,
       |    CAST(SUM(bit * (1::BIGINT << (idx % 16))) AS BIGINT) AS sig
       |  FROM bits GROUP BY 1, 2, 3),
       |capped AS (
       |  SELECT doc_id, n, band, sig FROM bands
       |  QUALIFY COUNT(*) OVER (PARTITION BY n, band, sig) <= ${Dedup.BandBucketCap}),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM capped a JOIN capped b
       |    ON a.n = b.n AND a.band = b.band AND a.sig = b.sig
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
    import graft.functions.EbmlTree
    val c = expr("doc_id div 2")
    val n = lit(66) + (c % 13) * 13
    val media = when(col("doc_id") % 2 === 0, EbmlTree.buildFp(c, n, 0))
      .otherwise(EbmlTree.buildFp(c, n, 1))
    val sigs = documents(s, d)
      .select(col("doc_id"), n.cast("bigint").as("n"),
        EbmlTree.fingerprint(media, 64).as("hash"))
    bandedHammingPairs(sigs, Seq("n"), 3).orderBy("a_id", "b_id")
  }

  val all: Seq[Q] = Seq(phashDedup, phashComponents, phashRescale,
    audioFingerprint, framehashDedup, ebmlFramehash)
}
