package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.Tables._

/** Fourth text-curation batch: corpus-statistics operators a training-data
  * pipeline runs before/after filtering — length-outlier trimming,
  * vocabulary-growth (Heaps-law) curves, and deterministic top-k n-gram
  * tables. All token work reuses the shingle utilities in [[Dedup]]. */
object TextAnalysis4 {

  /** Length-outlier filter: drop documents outside the [p5, p95] length
    * band — the first knob every curation pipeline turns. The two
    * percentile scalars come from one aggregate over the (pushed-down)
    * length column and attach as a one-row broadcast — the documented
    * bounded scalar-attach shape, not a data-volume join. */
  val lengthFilter: Q = Q(
    "text_length_filter",
    """WITH bounds AS (
      |  SELECT QUANTILE_CONT(n_chars, 0.05) AS p_lo,
      |         QUANTILE_CONT(n_chars, 0.95) AS p_hi
      |  FROM documents)
      |SELECT d.doc_id, d.n_chars, b.p_lo, b.p_hi
      |FROM documents d, bounds b
      |WHERE d.n_chars >= b.p_lo AND d.n_chars <= b.p_hi
      |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    val docs = documents(s, d)
    val bounds = docs.agg(
      expr("percentile(n_chars, 0.05)").as("p_lo"),
      expr("percentile(n_chars, 0.95)").as("p_hi"))
    docs.join(broadcast(bounds),
        col("n_chars") >= col("p_lo") && col("n_chars") <= col("p_hi"))
      .select("doc_id", "n_chars", "p_lo", "p_hi")
      .orderBy("doc_id")
  }

  /** Vocabulary growth (Heaps' law curve): tokens are attributed to the
    * first document (by doc_id) that introduces them; the running sum
    * over per-doc counts is the corpus vocabulary size after each doc.
    * The distinct-token shuffle happens ONCE (hash agg on token); the
    * cumulative window runs over the per-doc aggregate — thousands of
    * rows, not the token stream. */
  val vocabGrowth: Q = Q(
    "text_vocab_growth",
    """WITH first_seen AS (
      |  SELECT w, MIN(doc_id) AS doc_id FROM (
      |    SELECT doc_id, UNNEST(STRING_SPLIT(TRIM(text), ' ')) AS w
      |    FROM documents) GROUP BY w),
      |per_doc AS (
      |  SELECT doc_id, COUNT(*) AS new_tokens FROM first_seen GROUP BY 1)
      |SELECT doc_id, new_tokens,
      |  CAST(SUM(new_tokens) OVER (ORDER BY doc_id) AS BIGINT) AS vocab_size
      |FROM per_doc
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val perDoc = documents(s, d)
      .select(col("doc_id"), explode(split(trim(col("text")), " ")).as("w"))
      .groupBy("w").agg(min("doc_id").as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("new_tokens"))
      // r17: the sampling pass otherwise re-runs the explode + two
      // shuffles feeding this per-doc relation
      .localCheckpoint(true)
    // global running sum via the two-pass range-partitioned shape —
    // the per-doc relation is corpus-sized (one row per document), so
    // the r04 `Window.orderBy` single-task sort was a scale killer
    ScalableWindows.globalRunningSum(perDoc, Seq(col("doc_id")),
        col("new_tokens"), "__rn", "vocab_size")
      .select(col("doc_id"), col("new_tokens"),
        col("vocab_size").cast("bigint").as("vocab_size"))
      .orderBy("doc_id")
  }

  /** Corpus top-k n-gram table (trigram counts with a fully deterministic
    * tie-break): count DESC, then gram ASC, LIMIT 50 — plans as
    * TakeOrderedAndProject over the hash aggregate, a k-row driver merge
    * with no global sort. */
  val ngramTopk: Q = Q(
    "text_ngram_topk",
    """SELECT gram, COUNT(*) AS n FROM (
      |  SELECT UNNEST(CASE WHEN LEN(w) < 3 THEN []::VARCHAR[]
      |    ELSE LIST_TRANSFORM(RANGE(1, LEN(w) - 1),
      |      i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]) END) AS gram
      |  FROM (SELECT STRING_SPLIT(TRIM(text), ' ') AS w FROM documents))
      |GROUP BY gram
      |ORDER BY n DESC, gram
      |LIMIT 50""".stripMargin) { (s, d) =>
    documents(s, d)
      .select(explode(
        Dedup.shinglesFromWords(split(trim(col("text")), " "), 3)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram"))
      .limit(50)
  }

  /** Budget-constrained corpus selection: fill a per-language token
    * budget greedily by priority (longest documents first, doc_id
    * tie-break) — the "assemble N tokens of training data per language"
    * step. A document is taken while the budget is not yet exhausted
    * BEFORE it (strictly-preceding cumulative sum), so the budget can
    * overshoot by at most one document — the standard greedy-fill
    * contract. One shuffle on lang; the running sum partitions by lang
    * too, so both land in the same exchange. */
  val budgetSample: Q = Q(
    "text_budget_sample",
    """SELECT doc_id, lang, n_tokens, taken_before FROM (
      |  SELECT doc_id, lang, n_tokens,
      |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang
      |      ORDER BY n_tokens DESC, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS taken_before
      |  FROM (SELECT doc_id, lang,
      |          CAST(LEN(STRING_SPLIT(TRIM(text), ' ')) AS BIGINT) AS n_tokens
      |        FROM documents))
      |WHERE taken_before < 2000
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("lang")
      .orderBy(col("n_tokens").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    documents(s, d)
      .select(col("doc_id"), col("lang"),
        size(split(trim(col("text")), " ")).cast("bigint").as("n_tokens"))
      .withColumn("taken_before",
        coalesce(sum("n_tokens").over(w), lit(0L)))
      .filter(col("taken_before") < 2000)
      .select("doc_id", "lang", "n_tokens", "taken_before")
      .orderBy("doc_id")
  }

  /** Data-mixture report: per (source, lang) document and token counts
    * plus each cell's share of the corpus token total — the table every
    * training run starts from when weighting sources. Counts stay exact
    * BIGINTs through the window total; the one share division is
    * mirrored verbatim. Window runs over the ~|sources|·|langs| cells,
    * never the corpus. */
  val mixtureReport: Q = Q(
    "text_mixture_report",
    """WITH cells AS (
      |  SELECT source, lang, COUNT(*) AS n_docs,
      |    CAST(SUM(LEN(STRING_SPLIT(TRIM(text), ' '))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY 1, 2)
      |SELECT source, lang, n_docs, n_tokens,
      |  CAST(n_tokens AS DOUBLE) /
      |    CAST(SUM(n_tokens) OVER () AS DOUBLE) AS token_share
      |FROM cells
      |ORDER BY source, lang""".stripMargin) { (s, d) =>
    val cells = documents(s, d)
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(trim(col("text")), " ")))
          .cast("bigint").as("n_tokens"))
    cells.select(col("source"), col("lang"), col("n_docs"), col("n_tokens"),
        (col("n_tokens").cast("double") /
          sum("n_tokens").over(Window.partitionBy()).cast("double"))
          .as("token_share"))
      .orderBy("source", "lang")
  }

  /** Sequence PACKING — the GPT-pretraining data-prep step: the token
    * stream (docs concatenated in doc_id order) is cut into fixed-size
    * context windows of [[PackLen]] tokens, and each document's token
    * span maps onto the bins it overlaps, SPLITTING documents that
    * straddle a boundary (the standard packed-pretraining layout; the
    * fragment's bin position is what an attention-mask builder consumes
    * downstream). One fragment row per (doc, bin) overlap:
    * bins `⌊before/L⌋ .. ⌊(before+n−1)/L⌋`, fragment length
    * `min((bin+1)·L, before+n) − max(bin·L, before)`.
    *
    * Scale shape: the exclusive prefix sum `before` comes from the
    * two-pass range-partitioned [[ScalableWindows.globalRunningSum]]
    * (NOT a single-partition global window), the bin span explodes
    * per-doc (≤ n/L + 1 rows), and everything else is per-row integer
    * arithmetic — exact on both engines, no floats anywhere. */
  val PackLen = 128L
  val packSequences: Q = Q(
    "text_pack_sequences",
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    CAST(LEN(STRING_SPLIT(TRIM(text), ' ')) AS BIGINT) AS n
       |  FROM documents),
       |ord AS (
       |  SELECT doc_id, n,
       |    CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS before
       |  FROM toks),
       |frag AS (
       |  SELECT doc_id, n, before, UNNEST(RANGE(before // $PackLen,
       |    (before + n - 1) // $PackLen + 1)) AS bin
       |  FROM ord)
       |SELECT doc_id, bin,
       |  CAST(GREATEST(bin * $PackLen, before) - bin * $PackLen AS BIGINT)
       |    AS pos_in_bin,
       |  CAST(LEAST((bin + 1) * $PackLen, before + n)
       |       - GREATEST(bin * $PackLen, before) AS BIGINT) AS n_tok,
       |  (before < bin * $PackLen
       |   OR before + n > (bin + 1) * $PackLen) AS is_split
       |FROM frag
       |ORDER BY doc_id, bin""".stripMargin) { (s, d) =>
    val L = lit(PackLen)
    val toks = documents(s, d).select(col("doc_id"),
      size(split(trim(col("text")), " ")).cast("long").as("n"))
      // r17: tokenize once — the two-pass sampling pass re-split every
      // doc's text before this checkpoint existed
      .localCheckpoint(true)
    val withCum = ScalableWindows.globalRunningSum(toks,
      Seq(col("doc_id")), col("n"), "__rn", "__cum")
    val spans = withCum
      .withColumn("before", col("__cum") - col("n"))
      .withColumn("bin", explode(sequence(
        expr(s"before div $PackLen"),
        expr(s"(before + n - 1) div $PackLen"))))
    spans.select(
        col("doc_id"), col("bin"),
        (greatest(col("bin") * L, col("before")) - col("bin") * L)
          .cast("bigint").as("pos_in_bin"),
        (least((col("bin") + 1) * L, col("before") + col("n"))
          - greatest(col("bin") * L, col("before")))
          .cast("bigint").as("n_tok"),
        (col("before") < col("bin") * L ||
          col("before") + col("n") > (col("bin") + 1) * L).as("is_split"))
      .orderBy("doc_id", "bin")
  }

  /** Temperature-based mixture SAMPLING — the multilingual-LM data-prep
    * step: sample half the corpus with per-language weights ∝ n_l^α at
    * α = 1/2, which upsamples low-resource languages relative to their
    * natural share. A document is kept iff
    *
    *   h(doc) · Σk · n_l  <  k_l · target · 2³²
    *
    * with h the portable 32-bit hash (q34/q49's overflow-safe Knuth
    * form, uniform on [0, 2³²)), k_l = ⌊√n_l·2²⁰ + ½⌋ the fixed-point
    * weight, and target = ⌊total/2⌋ — so P(keep) = k_l·target/(Σk·n_l),
    * the exact temperature rate, capped at 1 automatically (a rate > 1
    * makes the RHS exceed every possible LHS). All quantities on both
    * comparison sides are EXACT integers (√ of an integer-valued double
    * is correctly rounded identically in both engines; ·2²⁰ is an
    * exponent shift; products run in DECIMAL(38,0)/HUGEINT), so the
    * kept set is bit-deterministic at any scale — no float-sum order
    * hazard anywhere. Scale shape: one tiny lang aggregate broadcast
    * back; everything per-doc is map-side. */
  val mixtureSample: Q = Q(
    "text_mixture_sample",
    """WITH n AS (SELECT lang, COUNT(*) AS n_l FROM documents GROUP BY 1),
      |k AS (SELECT lang, n_l,
      |        CAST(FLOOR(SQRT(CAST(n_l AS DOUBLE)) * 1048576 + 0.5) AS BIGINT) AS k_l
      |      FROM n),
      |s AS (SELECT SUM(k_l) AS sumk, SUM(n_l) // 2 AS target FROM k)
      |SELECT d.doc_id, d.lang,
      |  (CAST(((d.doc_id % 67108864) * 2654435761) % 4294967296 AS HUGEINT)
      |     * k.sumk_ * k.n_l)
      |  < (CAST(k.k_l AS HUGEINT) * k.target_ * 4294967296) AS kept
      |FROM documents d
      |JOIN (SELECT lang, n_l, k_l, s.sumk AS sumk_, s.target AS target_
      |      FROM k, s) k ON k.lang = d.lang
      |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    val docs = documents(s, d)
    val n = docs.groupBy("lang").agg(count(lit(1)).as("n_l"))
    val k = n.withColumn("k_l",
      floor(sqrt(col("n_l").cast("double")) * 1048576 + 0.5).cast("long"))
    val sums = k.agg(sum("k_l").as("sumk"),
      expr("sum(n_l) div 2").as("target"))
    val rates = broadcast(k.crossJoin(broadcast(sums)))
    val dec = "decimal(38,0)"
    docs.select(col("doc_id"), col("lang"))
      .join(rates, "lang")
      .select(col("doc_id"), col("lang"),
        ((col("doc_id") % 67108864L * 2654435761L % 4294967296L).cast(dec)
          * col("sumk").cast(dec) * col("n_l").cast(dec)
          < col("k_l").cast(dec) * col("target").cast(dec)
            * lit(4294967296L).cast(dec)).as("kept"))
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(lengthFilter, vocabGrowth, ngramTopk, budgetSample,
    mixtureReport, packSequences, mixtureSample)
}
