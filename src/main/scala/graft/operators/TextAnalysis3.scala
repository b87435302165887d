package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.Tables._

/** Third text batch — the filtering/safety stages of a training-data
  * pipeline: PII redaction, repetition signals (the Gopher-style quality
  * rules), benchmark decontamination, and token-distribution entropy.
  *
  * All four are per-document map-side computations followed by at most one
  * hash aggregation/join on bounded-cardinality keys — at 100 TB each is a
  * single scan with no cross-doc shuffle except the decontamination
  * inverted-index join (whose build side is the holdout set, many orders
  * of magnitude smaller than the corpus).
  */
object TextAnalysis3 {

  /** Curation gate predicates + precedence, shared by the batch
    * [[keepList]] and the streaming incremental pipeline
    * (`Streams.curationIncrementalBatch`) so the rules can't drift
    * between the two. */
  private[graft] def isHoldout(docId: Column): Column = docId % 50 === 0

  /** Quality gate failure (word count outside [20, 80] or type/token
    * ratio < 0.3). NULL (empty text) coalesces to false — same reason
    * outcome as the when-chain skipping a null predicate. */
  private[graft] def qualityBad(text: Column): Column = {
    val ws = split(trim(text), " ")
    coalesce(!(size(ws).cast("bigint").between(20, 80) &&
      (size(array_distinct(ws)).cast("double") / size(ws)) >= 0.3),
      lit(false))
  }

  /** Keep/drop precedence over boolean flag columns
    * (holdout, quality_bad, exact_dup, near_dup, contaminated). */
  private[graft] def curationReason: Column =
    when(col("holdout"), "holdout")
      .when(col("quality_bad"), "quality")
      .when(col("exact_dup"), "exact_dup")
      .when(col("near_dup"), "near_dup")
      .when(col("contaminated"), "contaminated")
      .otherwise("kept")

  /** Email/phone patterns restricted to syntax Java regex and RE2 (DuckDB)
    * interpret identically: character classes, bounded repetition, \b. */
  private val EmailPat = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val PhonePat = "\\b555-[0-9]{4}\\b"

  /** PII redaction: count and mask emails/phone numbers. The corpus
    * contains no PII, so both engines first inject a deterministic
    * doc_id-derived email (docs with id % 3 != 0) and phone (id % 2 = 0)
    * — the detection/redaction logic is then exercised against varying
    * ground truth. Pure per-row regex work: zero shuffles at any scale. */
  val piiRedact: Q = Q(
    "text_pii_redact",
    s"""WITH aug AS (
       |  SELECT doc_id, text ||
       |    CASE WHEN doc_id % 3 <> 0
       |      THEN ' contact user' || doc_id || '@mail.example.com' ELSE '' END ||
       |    CASE WHEN doc_id % 2 = 0
       |      THEN ' call 555-' || LPAD(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       |      ELSE '' END AS t
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(LEN(REGEXP_EXTRACT_ALL(t, '$EmailPat')) AS BIGINT) AS n_emails,
       |  CAST(LEN(REGEXP_EXTRACT_ALL(t, '$PhonePat')) AS BIGINT) AS n_phones,
       |  REGEXP_REPLACE(REGEXP_REPLACE(t, '$EmailPat', '<EMAIL>', 'g'),
       |    '$PhonePat', '<PHONE>', 'g') AS redacted
       |FROM aug
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val aug = concat(
      col("text"),
      when(col("doc_id") % 3 =!= 0,
        concat(lit(" contact user"), col("doc_id").cast("string"),
          lit("@mail.example.com"))).otherwise(lit("")),
      when(col("doc_id") % 2 === 0,
        concat(lit(" call 555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")))
    documents(s, d)
      .withColumn("t", aug)
      .select(col("doc_id"),
        size(regexp_extract_all(col("t"), lit(EmailPat), lit(0)))
          .cast("bigint").as("n_emails"),
        size(regexp_extract_all(col("t"), lit(PhonePat), lit(0)))
          .cast("bigint").as("n_phones"),
        regexp_replace(regexp_replace(col("t"), EmailPat, "<EMAIL>"),
          PhonePat, "<PHONE>").as("redacted"))
      .orderBy("doc_id")
  }

  /** DuckDB n-gram shingles WITH duplicates (mirror of
    * [[graft.functions.WordShingles]] semantics for arbitrary n). */
  private[operators] def duckRawShingles(n: Int, w: String = "w"): String = {
    val cat = (0 until n).map(k => s"$w[i + $k]").mkString(" || ' ' || ")
    s"""CASE WHEN LEN($w) < $n THEN []::VARCHAR[]
       |  ELSE LIST_TRANSFORM(RANGE(1, LEN($w) - ${n - 2}), i -> $cat) END""".stripMargin
  }

  /** Repetition signals (Gopher-style quality rules): fraction of tokens
    * taken by the single most frequent word, and the duplicate-3-gram
    * fraction. High values of either flag boilerplate/spam for removal.
    * Both ratios are exact BIGINT divisions → identical doubles. */
  val repetition: Q = Q(
    "text_repetition",
    s"""WITH toks AS (
       |  SELECT doc_id, UNNEST(STRING_SPLIT(TRIM(text), ' ')) AS w
       |  FROM documents),
       |wc AS (SELECT doc_id, w, COUNT(*) AS c FROM toks GROUP BY 1, 2),
       |top AS (SELECT doc_id, MAX(c) AS maxc, CAST(SUM(c) AS BIGINT) AS n
       |        FROM wc GROUP BY 1),
       |g3 AS (SELECT doc_id, UNNEST(sh) AS s FROM (
       |  SELECT doc_id, ${duckRawShingles(3)} AS sh FROM (
       |    SELECT doc_id, STRING_SPLIT(TRIM(text), ' ') AS w FROM documents))),
       |g3a AS (SELECT doc_id, COUNT(*) AS t3, COUNT(DISTINCT s) AS d3
       |        FROM g3 GROUP BY 1)
       |SELECT top.doc_id, top.n AS n_tokens,
       |  CAST(top.maxc AS DOUBLE) / top.n AS top_word_frac,
       |  CASE WHEN g3a.t3 > 0
       |    THEN 1.0::DOUBLE - CAST(g3a.d3 AS DOUBLE) / g3a.t3
       |    ELSE 0.0::DOUBLE END AS dup_3gram_frac
       |FROM top JOIN g3a ON g3a.doc_id = top.doc_id
       |ORDER BY top.doc_id""".stripMargin) { (s, d) =>
    val docs = documents(s, d)
    val toks = docs.select(col("doc_id"),
      explode(split(trim(col("text")), " ")).as("w"))
    val wc = toks.groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
    val top = wc.groupBy("doc_id")
      .agg(max("c").as("maxc"), sum("c").as("n"))
    val g3 = docs.select(col("doc_id"), explode(Dedup.rawShingles(col("text"))).as("s"))
    val g3a = g3.groupBy("doc_id")
      .agg(count(lit(1)).as("t3"), countDistinct(col("s")).as("d3"))
    top.join(g3a, "doc_id")
      .select(col("doc_id"), col("n").as("n_tokens"),
        (col("maxc").cast("double") / col("n")).as("top_word_frac"),
        when(col("t3") > 0, lit(1.0) - col("d3").cast("double") / col("t3"))
          .otherwise(lit(0.0)).as("dup_3gram_frac"))
      .orderBy("doc_id")
  }

  /** Benchmark decontamination: flag training docs sharing any 5-gram
    * with the holdout set (doc_id % 50 = 0 stands in for the benchmark).
    * The inverted-index join keys on the shingle — the build side is the
    * HOLDOUT shingle set (tiny vs the corpus), so at 100 TB this is one
    * corpus scan + a broadcast-or-small-shuffle hash join, never
    * corpus × corpus. */
  val decontaminate: Q = Q(
    "text_decontaminate",
    s"""WITH ws AS (SELECT doc_id, STRING_SPLIT(TRIM(text), ' ') AS w
       |           FROM documents),
       |sh AS (SELECT DISTINCT doc_id, s FROM (
       |  SELECT doc_id, UNNEST(${duckRawShingles(5)}) AS s FROM ws)),
       |hold AS (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 0),
       |shared AS (
       |  SELECT sh.doc_id, COUNT(*) AS n_shared
       |  FROM sh JOIN hold USING (s)
       |  WHERE sh.doc_id % 50 <> 0
       |  GROUP BY 1)
       |SELECT d.doc_id, CAST(COALESCE(shared.n_shared, 0) AS BIGINT) AS n_shared,
       |  COALESCE(shared.n_shared, 0) > 0 AS contaminated
       |FROM documents d LEFT JOIN shared ON shared.doc_id = d.doc_id
       |WHERE d.doc_id % 50 <> 0
       |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    val docs = documents(s, d)
    val sh = docs.select(col("doc_id"),
        explode(Dedup.shingles(col("text"), 5)).as("s"))
    val hold = sh.filter(col("doc_id") % 50 === 0).select("s").distinct()
    val shared = sh.filter(col("doc_id") % 50 =!= 0)
      .join(hold, "s")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    docs.filter(col("doc_id") % 50 =!= 0).select("doc_id")
      .join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)) > 0).as("contaminated"))
      .orderBy("doc_id")
  }

  /** [[decontaminate]] with a BLOOM-FILTER prefilter on the corpus scan
    * — the shape for when the holdout's shingle set is too large to
    * broadcast as a hash relation but fits as bits (a 10⁸-shingle
    * holdout is ~6 GB of strings yet ~170 MB of bloom at 1% FP). The
    * corpus side is pruned BY THE SCAN's filter (`might_contain` over a
    * scalar-subquery bloom built with `bloom_filter_agg`) before any
    * join; the survivors (true matches + ~FP-rate noise) then pay the
    * exact inverted-index join, so false positives are eliminated and
    * the OUTPUT IS IDENTICAL to the exact query — the oracle is shared
    * verbatim. Same two-step as Spark's own injected runtime filters
    * (bloom prune + exact join), applied at the operator level. */
  val decontaminateBloom: Q = Q(
    "text_decontaminate_bloom", decontaminate.oracle.get) { (s, d) =>
    // bloom_filter_agg / might_contain are graft-registered SQL names
    // (idempotent; works on any caller's session, including the driver's)
    graft.GraftExtensions.register(s)
    val docs = documents(s, d)
    val sh = docs.select(col("doc_id"),
      explode(Dedup.shingles(col("text"), 5)).as("s"))
    // holdout materialized ONCE (localCheckpoint): the sizing count, the
    // bloom build, and the exact verify join all read the checkpointed
    // blocks instead of re-deriving shingles from the scan three times
    val hold = sh.filter(col("doc_id") % 50 === 0).select("s").distinct()
      .localCheckpoint()
    // size the bloom from the ACTUAL holdout cardinality (one count over
    // the checkpoint — holdout-sized, not corpus-sized): bits =
    // ⌈n·ln(0.01)/ln²2⌉ ≈ 9.6·n keeps FP ≈ 1% at any scale, where the
    // r05-review finding showed a hardcoded 1M/8Mbit filter saturating
    // (FP → 1, pruning nothing) exactly at the 10⁸-item scale this
    // operator exists for
    val nHold = math.max(1L, hold.count())
    val nBits = math.max(64L, (nHold * 9.6).toLong)
    // bloom_filter_agg silently CLAMPS its sizing args to session
    // ceilings (defaults: 4e6 items / 2^26 bits ≈ 8 MB) — at the
    // 10⁸-shingle holdout this operator targets, a clamped filter
    // saturates (FP → 1) and prunes nothing. The clamp is a per-instance
    // lazy val read from SQLConf at FIRST ACCESS, and Catalyst copies
    // expressions during optimization, so the raised ceilings must stay
    // in force until the aggregate has EXECUTED, not just until the plan
    // is built (the r06 advice finding). Hence the filter itself is
    // evaluated EAGERLY inside the try — a holdout-sized job (the
    // corpus-side scan stays lazy), yielding the serialized filter bytes
    // (nBits/8 ≈ 1.2 B/item; it must fit one executor to be probed
    // anyway, and ships once per stage via the broadcast task binary).
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val (oldItems, oldBits) = (s.conf.get(itemsKey), s.conf.get(bitsKey))
    val filterBytes =
      try {
        if (nHold > oldItems.toLong) s.conf.set(itemsKey, nHold)
        if (nBits > oldBits.toLong) s.conf.set(bitsKey, nBits)
        hold.agg(call_function("bloom_filter_agg", xxhash64(col("s")),
          lit(nHold), lit(nBits)).as("bf"))
          .head.getAs[Array[Byte]]("bf")
      } finally {
        s.conf.set(itemsKey, oldItems)
        s.conf.set(bitsKey, oldBits)
      }
    // lazy bloom prefilter over the train shingles: the sized filter is a
    // constant, so the corpus scan streams through might_contain with no
    // materialization of the candidate relation
    val cand = sh.filter(col("doc_id") % 50 =!= 0)
      .filter(call_function("might_contain", lit(filterBytes),
        xxhash64(col("s"))))
    val shared = cand.join(hold, "s")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    docs.filter(col("doc_id") % 50 =!= 0).select("doc_id")
      .join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)) > 0).as("contaminated"))
      .orderBy("doc_id")
  }

  /** 2^40 — fixed-point scale that makes the per-doc entropy sum exact:
    * each c·ln(c) term becomes floor(x·2^40 + 0.5) (identical IEEE ops on
    * both engines → identical BIGINT), and BIGINT sums are
    * order-independent, so the aggregation is deterministic without any
    * decimal-cast tie risk. */
  private[operators] val FixScale = 1099511627776.0

  /** Token-distribution Shannon entropy per document,
    * H = ln(n) − (Σ c·ln c)/n — a scalar quality/diversity signal (low
    * entropy ⇒ repetitive doc). Both lns go through
    * [[graft.functions.PortableLn]] over the DISTINCT count values (a
    * bounded-cardinality relation ≤ max doc length, broadcast back), so
    * every double is bit-identical cross-engine; the only cross-row sum
    * is over fixed-point BIGINTs. */
  val entropy: Q = Q(
    "text_entropy",
    s"""WITH toks AS (
       |  SELECT doc_id, UNNEST(STRING_SPLIT(TRIM(text), ' ')) AS w
       |  FROM documents),
       |cnt AS (SELECT doc_id, w, COUNT(*) AS c FROM toks GROUP BY 1, 2),
       |dl AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS n_distinct
       |       FROM cnt GROUP BY 1),
       |cvx AS (SELECT c, CAST(c AS DOUBLE) AS x FROM (SELECT DISTINCT c FROM cnt)),
       |lnc AS (${graft.functions.PortableLn.sqlStages("cvx", Seq("c"), "x", "lnc")}),
       |nvx AS (SELECT n, CAST(n AS DOUBLE) AS x FROM (SELECT DISTINCT n FROM dl)),
       |lnn AS (${graft.functions.PortableLn.sqlStages("nvx", Seq("n"), "x", "lnn")}),
       |terms AS (
       |  SELECT cnt.doc_id,
       |    CAST(FLOOR((cnt.c * lnc.lnc) * $FixScale::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS t
       |  FROM cnt JOIN lnc ON lnc.c = cnt.c),
       |sums AS (SELECT doc_id, CAST(SUM(t) AS BIGINT) AS st FROM terms GROUP BY 1)
       |SELECT dl.doc_id, dl.n AS n_tokens, dl.n_distinct,
       |  lnn.lnn - ((CAST(sums.st AS DOUBLE) / $FixScale::DOUBLE) / dl.n) AS entropy
       |FROM dl
       |JOIN sums ON sums.doc_id = dl.doc_id
       |JOIN lnn ON lnn.n = dl.n
       |ORDER BY dl.doc_id""".stripMargin) { (s, d) =>
    val toks = documents(s, d).select(col("doc_id"),
      explode(split(trim(col("text")), " ")).as("w"))
    val cnt = toks.groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
    val dl = cnt.groupBy("doc_id")
      .agg(sum("c").as("n"), count(lit(1)).as("n_distinct"))
    val lnc = graft.functions.PortableLn.withLn(
        cnt.select("c").distinct().withColumn("x", col("c").cast("double")),
        "x", "lnc")
      .select("c", "lnc")
    val lnn = graft.functions.PortableLn.withLn(
        dl.select("n").distinct().withColumn("x", col("n").cast("double")),
        "x", "lnn")
      .select("n", "lnn")
    // both ln relations are bounded by max-doc-length distinct values —
    // broadcast is safe at any corpus size
    val terms = cnt.join(broadcast(lnc), "c")
      .select(col("doc_id"),
        floor((col("c") * col("lnc")) * lit(FixScale) + lit(0.5))
          .cast("long").as("t"))
    val sums = terms.groupBy("doc_id").agg(sum("t").as("st"))
    dl.join(sums, "doc_id").join(broadcast(lnn), "n")
      .select(col("doc_id"), col("n").as("n_tokens"), col("n_distinct"),
        (col("lnn") - ((col("st").cast("double") / lit(FixScale)) / col("n")))
          .as("entropy"))
      .orderBy("doc_id")
  }

  /** The flagship end-to-end curation pipeline: one query that takes the
    * raw corpus to a final keep/drop decision with the first failing
    * stage as the reason — quality rules, exact dedup (keep min doc_id),
    * near-dup (drop the later doc of each ≥0.5-Jaccard pair),
    * benchmark decontamination — with precedence
    * holdout > quality > exact_dup > near_dup > contaminated > kept.
    *
    * Every stage is the at-scale shape used by its standalone query:
    * per-row quality, one hash agg for exact dedup, the inverted-index
    * shingle join for near-dups, the holdout-built hash join for
    * contamination. The oracle restates all stages independently. */
  val keepList: Q = Q(
    "text_keep_list",
    s"""WITH w AS (
       |  SELECT doc_id,
       |    LEN(STRING_SPLIT(TRIM(text), ' ')) AS n_words,
       |    CAST(LEN(LIST_DISTINCT(STRING_SPLIT(TRIM(text), ' '))) AS DOUBLE)
       |      / LEN(STRING_SPLIT(TRIM(text), ' ')) AS ttr
       |  FROM documents),
       |ex AS (SELECT LOWER(TRIM(text)) AS norm, MIN(doc_id) AS keep_id
       |       FROM documents GROUP BY 1),
       |exd AS (SELECT d.doc_id FROM documents d
       |        JOIN ex ON LOWER(TRIM(d.text)) = ex.norm
       |        WHERE d.doc_id <> ex.keep_id),
       |jp AS (${Dedup.duckJaccardPairs}),
       |nd AS (SELECT DISTINCT b_id AS doc_id FROM jp),
       |ws5 AS (SELECT doc_id, STRING_SPLIT(TRIM(text), ' ') AS w FROM documents),
       |sh5 AS (SELECT DISTINCT doc_id, s FROM (
       |  SELECT doc_id, UNNEST(${duckRawShingles(5)}) AS s FROM ws5)),
       |hold AS (SELECT DISTINCT s FROM sh5 WHERE doc_id % 50 = 0),
       |cont AS (SELECT DISTINCT sh5.doc_id FROM sh5 JOIN hold USING (s)
       |         WHERE sh5.doc_id % 50 <> 0)
       |SELECT w.doc_id,
       |  CASE WHEN w.doc_id % 50 = 0 THEN 'holdout'
       |       WHEN NOT (w.n_words BETWEEN 20 AND 80 AND w.ttr >= 0.3)
       |         THEN 'quality'
       |       WHEN w.doc_id IN (SELECT doc_id FROM exd) THEN 'exact_dup'
       |       WHEN w.doc_id IN (SELECT doc_id FROM nd) THEN 'near_dup'
       |       WHEN w.doc_id IN (SELECT doc_id FROM cont) THEN 'contaminated'
       |       ELSE 'kept' END AS reason,
       |  (CASE WHEN w.doc_id % 50 = 0 THEN 'holdout'
       |       WHEN NOT (w.n_words BETWEEN 20 AND 80 AND w.ttr >= 0.3)
       |         THEN 'quality'
       |       WHEN w.doc_id IN (SELECT doc_id FROM exd) THEN 'exact_dup'
       |       WHEN w.doc_id IN (SELECT doc_id FROM nd) THEN 'near_dup'
       |       WHEN w.doc_id IN (SELECT doc_id FROM cont) THEN 'contaminated'
       |       ELSE 'kept' END) = 'kept' AS kept
       |FROM w
       |ORDER BY w.doc_id""".stripMargin) { (s, d) =>
    curationFlags(s, d)
      .select(col("doc_id"), curationReason.as("reason"),
        (curationReason === "kept").as("kept"))
      .orderBy("doc_id")
  }

  /** The `curation_flags` lake table: ONE row per document carrying
    * every gate's boolean verdict (holdout, quality_bad, exact_dup,
    * near_dup, contaminated). Materialized once per (session, corpus)
    * via [[Dedup.sharedMat]] — the same snapshot-amortization as the
    * pair graph, because two of its inputs grow super-linearly in
    * corpus size (the near-dup pair relation and the 5-shingle
    * decontamination self-join) while its OUTPUT is strictly linear
    * (one row per doc). Both verdict consumers ([[keepList]],
    * [[verdicts]]) and any downstream epoch planner scan this relation
    * instead of re-running the gates — at 100 TB the flags are written
    * next to the corpus snapshot and every curation query is a linear
    * scan. (r12 VERDICT task 5: text_keep_list was the registry's
    * worst scaler at 2.13x sf2/sf1 precisely because it re-read the
    * pair dump and re-ran the contamination join per query.) */
  private[graft] def curationFlags(s: SparkSession, d: String): DataFrame =
    Dedup.sharedMat(s, d, "curation_flags")(curationFlagsBuild(s, d))

  private def curationFlagsBuild(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val exKeep = docs.groupBy(lower(trim(col("text"))).as("norm"))
      .agg(min("doc_id").as("keep_id"))
    val exd = docs.select(col("doc_id"), lower(trim(col("text"))).as("norm"))
      .join(exKeep, "norm").filter(col("doc_id") =!= col("keep_id"))
      .select("doc_id").withColumn("is_exdup", lit(true))
    // the materialized per-(session, corpus) pair graph — the same
    // dedup_labels lake-table the CC consumers read; recomputing the
    // pair pipeline inside every downstream curation query is exactly
    // what the shared materialization exists to avoid
    val nd = Dedup.sharedPairs(s, d)
      .select(col("b_id").as("doc_id")).distinct()
      .withColumn("is_neardup", lit(true))
    val sh5 = docs.select(col("doc_id"),
        explode(Dedup.shingles(col("text"), 5)).as("s"))
    val hold = sh5.filter(col("doc_id") % 50 === 0).select("s").distinct()
    val cont = sh5.filter(col("doc_id") % 50 =!= 0).join(hold, "s")
      .select("doc_id").distinct().withColumn("is_cont", lit(true))
    docs.select(col("doc_id"), col("text"))
      .join(exd, Seq("doc_id"), "left")
      .join(nd, Seq("doc_id"), "left")
      .join(cont, Seq("doc_id"), "left")
      .select(col("doc_id"),
        isHoldout(col("doc_id")).as("holdout"),
        qualityBad(col("text")).as("quality_bad"),
        coalesce(col("is_exdup"), lit(false)).as("exact_dup"),
        coalesce(col("is_neardup"), lit(false)).as("near_dup"),
        coalesce(col("is_cont"), lit(false)).as("contaminated"))
  }

  /** The production verdict view (r12 VERDICT task 5): per-document
    * keep/drop with the FULL flag vector, not just the first failing
    * stage — downstream consumers can re-derive a verdict under a
    * different precedence (e.g. keep holdout docs for eval sets, or
    * tolerate contamination for a code corpus) without re-running any
    * gate. Linear output, linear per-query work: one scan of the
    * materialized [[curationFlags]] relation + a projection; the
    * quadratic pair/contamination machinery stays inside the
    * once-per-corpus build, exactly the way `dedup_edit_topk`
    * linearizes `dedup_edit_distance`. The oracle restates every gate
    * independently from the raw tables. */
  val verdicts: Q = Q(
    "curation_verdicts",
    s"""WITH w AS (
       |  SELECT doc_id,
       |    LEN(STRING_SPLIT(TRIM(text), ' ')) AS n_words,
       |    CAST(LEN(LIST_DISTINCT(STRING_SPLIT(TRIM(text), ' '))) AS DOUBLE)
       |      / LEN(STRING_SPLIT(TRIM(text), ' ')) AS ttr
       |  FROM documents),
       |ex AS (SELECT LOWER(TRIM(text)) AS norm, MIN(doc_id) AS keep_id
       |       FROM documents GROUP BY 1),
       |exd AS (SELECT d.doc_id FROM documents d
       |        JOIN ex ON LOWER(TRIM(d.text)) = ex.norm
       |        WHERE d.doc_id <> ex.keep_id),
       |jp AS (${Dedup.duckJaccardPairs}),
       |nd AS (SELECT DISTINCT b_id AS doc_id FROM jp),
       |ws5 AS (SELECT doc_id, STRING_SPLIT(TRIM(text), ' ') AS w FROM documents),
       |sh5 AS (SELECT DISTINCT doc_id, s FROM (
       |  SELECT doc_id, UNNEST(${duckRawShingles(5)}) AS s FROM ws5)),
       |hold AS (SELECT DISTINCT s FROM sh5 WHERE doc_id % 50 = 0),
       |cont AS (SELECT DISTINCT sh5.doc_id FROM sh5 JOIN hold USING (s)
       |         WHERE sh5.doc_id % 50 <> 0),
       |fl AS (
       |  SELECT w.doc_id,
       |    w.doc_id % 50 = 0 AS holdout,
       |    COALESCE(NOT (w.n_words BETWEEN 20 AND 80 AND w.ttr >= 0.3),
       |             FALSE) AS quality_bad,
       |    w.doc_id IN (SELECT doc_id FROM exd) AS exact_dup,
       |    w.doc_id IN (SELECT doc_id FROM nd) AS near_dup,
       |    w.doc_id IN (SELECT doc_id FROM cont) AS contaminated
       |  FROM w)
       |SELECT doc_id, holdout, quality_bad, exact_dup, near_dup, contaminated,
       |  CASE WHEN holdout THEN 'holdout'
       |       WHEN quality_bad THEN 'quality'
       |       WHEN exact_dup THEN 'exact_dup'
       |       WHEN near_dup THEN 'near_dup'
       |       WHEN contaminated THEN 'contaminated'
       |       ELSE 'kept' END AS reason,
       |  NOT (holdout OR quality_bad OR exact_dup OR near_dup
       |       OR contaminated) AS kept
       |FROM fl
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    curationFlags(s, d)
      .select(col("doc_id"), col("holdout"), col("quality_bad"),
        col("exact_dup"), col("near_dup"), col("contaminated"),
        curationReason.as("reason"), (curationReason === "kept").as("kept"))
      .orderBy("doc_id")
  }

  /** Bigram language-model surprisal (the perplexity quality filter): a
    * corpus-trained add-one-smoothed bigram LM scores each document by
    * its average negative log-likelihood, nll = −(Σ ln p(wᵢ|wᵢ₋₁))/n —
    * high scores flag gibberish, low scores boilerplate.
    *
    * Determinism: each probability is ONE division of two exact BIGINTs
    * ((c_ab+1)/(c_a+V) — identical doubles on both engines), ln runs
    * through [[graft.functions.PortableLn]] over the DISTINCT-bigram
    * relation (vocab-bounded, not corpus-bounded), and the per-doc sum
    * uses the same fixed-point 2^40 BIGINT trick as [[entropy]], so no
    * cross-row double accumulation exists anywhere. At 100 TB: two
    * count aggregations (map-combined), one vocab-sized ln relation
    * joined back to the exploded corpus, one final hash agg. */
  val perplexity: Q = Q(
    "text_perplexity",
    s"""WITH ws AS (SELECT doc_id, STRING_SPLIT(TRIM(text), ' ') AS w FROM documents),
       |toks AS (SELECT doc_id, UNNEST(w) AS tok FROM ws),
       |uc AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
       |vocab AS (SELECT COUNT(*) AS v FROM uc),
       |dbg AS (SELECT doc_id, UNNEST(${duckRawShingles(2)}) AS bigram FROM ws),
       |bc AS (SELECT bigram, COUNT(*) AS c_ab FROM dbg GROUP BY bigram),
       |ratio AS (
       |  SELECT bc.bigram,
       |    CAST(bc.c_ab + 1 AS DOUBLE) / CAST(uc.c + vocab.v AS DOUBLE) AS x
       |  FROM bc
       |  JOIN uc ON uc.tok = SPLIT_PART(bc.bigram, ' ', 1)
       |  CROSS JOIN vocab),
       |lp AS (${graft.functions.PortableLn.sqlStages(
             "ratio", Seq("bigram"), "x", "lnp")}),
       |terms AS (
       |  SELECT dbg.doc_id,
       |    CAST(FLOOR(lp.lnp * $FixScale::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS t
       |  FROM dbg JOIN lp ON lp.bigram = dbg.bigram),
       |sums AS (SELECT doc_id, CAST(SUM(t) AS BIGINT) AS st, COUNT(*) AS n
       |         FROM terms GROUP BY doc_id)
       |SELECT doc_id, n AS n_bigrams,
       |  -((CAST(st AS DOUBLE) / $FixScale::DOUBLE) / n) AS nll
       |FROM sums
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    nllPerDoc(s, d).orderBy("doc_id")
  }

  /** The [[perplexity]] pipeline without the presentation sort —
    * (doc_id, n_bigrams, nll), shared with the CCNet-style bucket
    * consumer in [[TextAnalysis6]] — MATERIALIZED once per
    * (session, corpus) via the [[Dedup.sharedMat]] store (the
    * `doc_surprisal` lake table): both registry consumers scan the
    * snapshot instead of re-running the two-count LM build + ln ladder
    * (~4–6 s each at sf2). */
  private[graft] def nllPerDoc(s: SparkSession, d: String): DataFrame =
    Dedup.sharedMat(s, d, "nll")(nllPerDocBuild(s, d))

  private def nllPerDocBuild(s: SparkSession, d: String): DataFrame = {
    val ws = documents(s, d)
      .select(col("doc_id"), split(trim(col("text")), " ").as("w"))
    val toks = ws.select(col("doc_id"), explode(col("w")).as("tok"))
    val uc = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    val vocab = uc.agg(count(lit(1)).as("v"))
    val dbg = ws.select(col("doc_id"),
      explode(Dedup.shinglesFromWords(col("w"), 2)).as("bigram"))
    val bc = dbg.groupBy("bigram").agg(count(lit(1)).as("c_ab"))
    val ratio = bc
      .join(uc, uc("tok") === split_part(col("bigram"), lit(" "), lit(1)))
      .crossJoin(broadcast(vocab))
      .select(col("bigram"),
        ((col("c_ab") + 1).cast("double") / (col("c") + col("v")).cast("double"))
          .as("x"))
    val lp = graft.functions.PortableLn.withLn(ratio, "x", "lnp")
      .select("bigram", "lnp")
    // lp is vocab-bounded (distinct bigrams), corpus-independent growth —
    // leave the join strategy to AQE (broadcast at test SF)
    val terms = dbg.join(lp, "bigram")
      .select(col("doc_id"),
        floor(col("lnp") * lit(FixScale) + lit(0.5)).cast("long").as("t"))
    terms.groupBy("doc_id")
      .agg(sum("t").as("st"), count(lit(1)).as("n"))
      .select(col("doc_id"), col("n").as("n_bigrams"),
        (-((col("st").cast("double") / lit(FixScale)) / col("n"))).as("nll"))
  }

  val all: Seq[Q] = Seq(piiRedact, repetition, decontaminate,
    decontaminateBloom, entropy, keepList, verdicts, perplexity)
}
