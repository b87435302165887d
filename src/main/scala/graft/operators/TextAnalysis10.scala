package graft.operators

import org.apache.spark.sql.functions._

import graft.Q
import graft.Tables._
import graft.functions.MathExpressions.lnLibm

/** Tenth text-analysis batch — mixture-health operators for a
  * training-data pipeline: the pairwise Jensen–Shannon divergence
  * matrix between source unigram distributions (the symmetric,
  * bounded companion to text_kl_drift's one-sided KL), and the
  * token-budget epoch plan (how many repetitions of each source a
  * target token budget implies — the "4-epoch rule" planning table).
  * Reference scope: SURVEY.md §2.5 X3.
  *
  * Float discipline: probabilities are exact integer ratios c/n; each
  * per-token JSD contribution is one mirrored double tree quantized to
  * ×10¹² fixed point BEFORE summation, so the cross-vocabulary sum is
  * an exact integer in both engines (no order-dependent float
  * accumulation); lnLibm ≡ glibc ≡ DuckDB LN. */
object TextAnalysis10 {
  private val dec = org.apache.spark.sql.types.DecimalType(38, 0)

  /** Pairwise Jensen–Shannon divergence (nats) between source unigram
    * distributions: JSD(p,q) = ½Σp·ln(p/m) + ½Σq·ln(q/m), m = (p+q)/2.
    * Tokens present in only ONE source contribute p·ln2 exactly
    * (p/m = 2 there), and Σ_{only-in-p} p = 1 − Σ_{shared} p, so the
    * whole statistic needs ONLY the shared-vocabulary inner join:
    * JSD = (T + ln2·(2 − P₁ − P₂))/2 with T the quantized shared-token
    * sum and P₁/P₂ the exact shared probability masses. The join keys
    * on the token — vocabulary-bounded, never corpus × corpus; per
    * token the fan-out is the C(k,2) source-pair matrix, with k the
    * (tiny, fixed) source cardinality. */
  val jsDivergence: Q = Q(
    "text_js_divergence",
    """WITH toks AS (
      |  SELECT source AS src, UNNEST(STRING_SPLIT(TRIM(text), ' ')) AS w
      |  FROM documents),
      |tc AS (SELECT src, w, COUNT(*)::BIGINT AS c FROM toks GROUP BY 1, 2),
      |tot AS (SELECT src, SUM(c)::BIGINT AS n FROM tc GROUP BY 1),
      |j AS (
      |  SELECT a.src AS src_a, b.src AS src_b, a.c AS c1, b.c AS c2,
      |    ta.n AS n1, tb.n AS n2
      |  FROM tc a JOIN tc b ON b.w = a.w AND a.src < b.src
      |  JOIN tot ta ON ta.src = a.src
      |  JOIN tot tb ON tb.src = b.src),
      |g AS (
      |  SELECT src_a, src_b, COUNT(*)::BIGINT AS shared_vocab,
      |    MIN(n1) AS n1, MIN(n2) AS n2,
      |    SUM(c1)::BIGINT AS sb1, SUM(c2)::BIGINT AS sb2,
      |    SUM(CAST(FLOOR(
      |      ((CAST(c1 AS DOUBLE) / n1)
      |         * LN((CAST(c1 AS DOUBLE) / n1)
      |             / ((CAST(c1 AS DOUBLE) / n1 + CAST(c2 AS DOUBLE) / n2)
      |                / 2.0::DOUBLE))
      |       + (CAST(c2 AS DOUBLE) / n2)
      |         * LN((CAST(c2 AS DOUBLE) / n2)
      |             / ((CAST(c1 AS DOUBLE) / n1 + CAST(c2 AS DOUBLE) / n2)
      |                / 2.0::DOUBLE)))
      |      * 1000000000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT))::HUGEINT
      |      AS t12
      |  FROM j GROUP BY 1, 2)
      |SELECT src_a, src_b, shared_vocab,
      |  (CAST(t12 AS DOUBLE) / 1000000000000.0::DOUBLE
      |   + LN(2.0::DOUBLE) * (2.0::DOUBLE
      |       - CAST(sb1 AS DOUBLE) / n1 - CAST(sb2 AS DOUBLE) / n2))
      |  / 2.0::DOUBLE AS jsd
      |FROM g ORDER BY src_a, src_b""".stripMargin) { (s, d) =>
    val toks = documents(s, d).select(col("source").as("src"),
      explode(split(trim(col("text")), " ")).as("w"))
    val tc = toks.groupBy("src", "w").agg(count(lit(1)).as("c"))
    val tot = tc.groupBy("src").agg(sum("c").as("n"))
    val j = tc.as("a").join(tc.as("b"),
        col("b.w") === col("a.w") && col("a.src") < col("b.src"))
      .select(col("a.src").as("src_a"), col("b.src").as("src_b"),
        col("a.c").as("c1"), col("b.c").as("c2"))
      .join(broadcast(tot.select(col("src").as("src_a"), col("n").as("n1"))),
        "src_a")
      .join(broadcast(tot.select(col("src").as("src_b"), col("n").as("n2"))),
        "src_b")
    val p1 = col("c1").cast("double") / col("n1")
    val p2 = col("c2").cast("double") / col("n2")
    val m = (p1 + p2) / 2.0
    val term = floor((p1 * lnLibm(p1 / m) + p2 * lnLibm(p2 / m)) * 1.0e12
      + 0.5).cast("long")
    val g = j.groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("shared_vocab"),
        min("n1").as("n1"), min("n2").as("n2"),
        sum("c1").as("sb1"), sum("c2").as("sb2"),
        sum(term.cast(dec)).as("t12"))
    g.select(col("src_a"), col("src_b"), col("shared_vocab"),
        ((col("t12").cast("double") / 1.0e12 +
          lnLibm(lit(2.0)) * (lit(2.0) -
            col("sb1").cast("double") / col("n1") -
            col("sb2").cast("double") / col("n2"))) / 2.0).as("jsd"))
      .orderBy("src_a", "src_b")
  }

  /** Token-budget epoch plan: given a training budget of
    * BudgetMultiple × the corpus token count, split the budget equally
    * across sources (the balanced-mixture target) and report, per
    * source, the implied repetition factor (epochs), capped at the
    * standard 4-epoch repetition ceiling, and the deficit the cap
    * leaves unfilled — the planning table a 100 TB mixture re-balance
    * starts from. All quantities except the epoch ratio itself are
    * exact integers (planned = min(4·tokens, target), an integer min —
    * NOT epochs·tokens re-multiplied through floats). One corpus hash
    * agg + a broadcast 1-row total. */
  val epochPlan: Q = Q(
    "curation_epoch_plan",
    """WITH st AS (
      |  SELECT source,
      |    COUNT(*)::BIGINT AS n_docs,
      |    SUM(LEN(STRING_SPLIT(TRIM(text), ' ')))::BIGINT AS tokens
      |  FROM documents GROUP BY 1),
      |tot AS (SELECT COUNT(*)::BIGINT AS k, SUM(tokens)::BIGINT AS total
      |        FROM st)
      |SELECT st.source, st.n_docs, st.tokens,
      |  CAST(st.tokens AS DOUBLE) / tot.total AS share,
      |  (2 * tot.total) // tot.k AS target_tokens,
      |  CAST((2 * tot.total) // tot.k AS DOUBLE) / st.tokens AS epochs,
      |  LEAST(4 * st.tokens, (2 * tot.total) // tot.k) AS planned_tokens,
      |  (2 * tot.total) // tot.k
      |    - LEAST(4 * st.tokens, (2 * tot.total) // tot.k) AS deficit
      |FROM st CROSS JOIN tot
      |ORDER BY source""".stripMargin) { (s, d) =>
    val st = documents(s, d).groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(trim(col("text")), " ")).cast("long")).as("tokens"))
    val tot = st.agg(count(lit(1)).as("k"), sum("tokens").as("total"))
    st.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("tokens"),
        (col("tokens").cast("double") / col("total")).as("share"),
        expr("(2 * total) div k").as("target_tokens"),
        (expr("(2 * total) div k").cast("double") / col("tokens"))
          .as("epochs"),
        least(lit(4) * col("tokens"), expr("(2 * total) div k"))
          .as("planned_tokens"),
        (expr("(2 * total) div k") -
          least(lit(4) * col("tokens"), expr("(2 * total) div k")))
          .as("deficit"))
      .orderBy("source")
  }

  /** Top-K vocabulary coverage curve: the fraction of ALL corpus token
    * occurrences covered by the K most frequent types, K ∈ {10, 100,
    * 1000} — the tokenizer-budget readout (how much of the stream a
    * K-entry vocab/cache absorbs; the cumulative companion to
    * text_frequent_tokens' top-k list and text_zipf_fit's slope).
    *
    * 100 TB shape: one token hash agg, then TakeOrderedAndProject of
    * the top 1000 types (never a global rank window over the
    * vocabulary) — every downstream step runs on that ≤1000-row
    * relation plus a broadcast 1-row total. Rank ties pinned by
    * (count DESC, token). */
  val topkCoverage: Q = Q(
    "text_topk_coverage",
    """WITH toks AS (
      |  SELECT UNNEST(STRING_SPLIT(TRIM(text), ' ')) AS w FROM documents),
      |wc AS (SELECT w, COUNT(*)::BIGINT AS c FROM toks GROUP BY 1),
      |tot AS (SELECT SUM(c)::BIGINT AS total FROM wc),
      |top AS (
      |  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rnk
      |  FROM wc QUALIFY rnk <= 1000),
      |ks AS (SELECT UNNEST([10, 100, 1000])::BIGINT AS k)
      |SELECT ks.k, COUNT(top.c)::BIGINT AS n_types,
      |  COALESCE(SUM(top.c), 0)::BIGINT AS covered_tokens,
      |  CAST(COALESCE(SUM(top.c), 0) AS DOUBLE) / MIN(tot.total) AS coverage
      |FROM ks CROSS JOIN tot LEFT JOIN top ON top.rnk <= ks.k
      |GROUP BY ks.k
      |ORDER BY ks.k""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val toks = documents(s, d)
      .select(explode(split(trim(col("text")), " ")).as("w"))
    val wc = toks.groupBy("w").agg(count(lit(1)).as("c"))
    val tot = wc.agg(sum("c").as("total"))
    // top-1000 via orderBy+limit (TakeOrderedAndProject); the global
    // row_number window then runs on ≤1000 rows, not the vocabulary
    val top = wc.orderBy(col("c").desc, col("w")).limit(1000)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("c").desc, col("w"))).cast("long"))
    val ks = s.range(1).select(explode(array(lit(10L), lit(100L),
      lit(1000L))).as("k"))
    broadcast(ks).crossJoin(broadcast(tot))
      .join(top, col("rnk") <= col("k"), "left")
      .groupBy("k")
      .agg(count(col("c")).as("n_types"),
        coalesce(sum("c"), lit(0L)).as("covered_tokens"),
        (coalesce(sum("c"), lit(0L)).cast("double") / min("total"))
          .as("coverage"))
      .orderBy("k")
  }

  val all: Seq[Q] = Seq(jsDivergence, epochPlan, topkCoverage)
}
