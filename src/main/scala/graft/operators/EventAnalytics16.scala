package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.Q
import graft.Tables._

/** Sixteenth event-analytics batch — the variance-decomposition and
  * rank-association members of the classical-test surface, plus two
  * econometric audits: one-way ANOVA F, Kendall's τ-b between two
  * daily series, Cohen's d / Hedges' g effect sizes, the
  * Brown–Forsythe (median-centered Levene) variance-equality test,
  * the Herfindahl–Hirschman revenue-concentration index, and log-log
  * price elasticity of demand. Reference scope: the ClickHouse side of
  * `/root/reference/main.py:12-55` owns arbitrary OLAP SQL over the
  * replicated tables; these are the hypothesis-testing/market-structure
  * members of that surface.
  *
  * House discipline: ×10⁴ (or ×10⁶ for log points) fixed-point values,
  * exact integer accumulation in DECIMAL(38,0) ≡ HUGEINT, floating
  * point only in mirrored final expression trees. The ONE float
  * reduction that must cross groups (ANOVA's Σ s_g²/n_g) is an ordered
  * sequential fold over the ≤k-row group relation — both engines
  * reproduce it bit-for-bit (the Similarity2 orderedSum idiom). */
object EventAnalytics16 {
  private val dec = org.apache.spark.sql.types.DecimalType(38, 0)
  private def v4 = floor(col("value") * 10000.0 + 0.5).cast("long")

  /** Ordered sequential fold Σ field over array_sort(collect_list(
    * struct(ord, field))) — the order-pinned double sum both engines
    * reproduce exactly (plain SUM over doubles is order-unspecified;
    * the DuckDB mirror is LIST(x ORDER BY ord) + LIST_REDUCE). */
  private def orderedSum(ord: Column, value: Column, field: String): Column =
    aggregate(array_sort(collect_list(struct(ord, value.as(field)))),
      lit(0.0), (acc, x) => acc + x.getField(field))

  /** One-way ANOVA F across event types on events.value:
    * F = (SSB/(k−1)) / (SSW/(N−k)) from exact ×10⁴ per-group
    * (n, Σv, Σv²) moments. The algebra needs exactly one cross-group
    * float sum, A = Σ_g s_g²/n_g (SSB = A − S²/N, SSW = ΣΣv² − A), and
    * that sum runs as an ordered fold over the k-row group relation —
    * k is the event-type cardinality, corpus-independent, so the whole
    * statistic is two hash aggregations at any scale. */
  val q163AnovaF: Q = Q(
    "q163_anova_f",
    """WITH m AS (
      |  SELECT event_type AS t, COUNT(*)::BIGINT AS n,
      |    SUM(CAST(FLOOR(value * 10000.0 + 0.5) AS BIGINT))::HUGEINT AS s,
      |    SUM(CAST(CAST(FLOOR(value * 10000.0 + 0.5) AS BIGINT) AS HUGEINT)
      |        * CAST(FLOOR(value * 10000.0 + 0.5) AS BIGINT))::HUGEINT AS ss
      |  FROM events GROUP BY 1),
      |g AS (
      |  SELECT COUNT(*)::BIGINT AS k, SUM(n)::BIGINT AS nn,
      |    CAST(CAST(SUM(s) AS VARCHAR) AS DOUBLE) AS sd,
      |    CAST(CAST(SUM(ss) AS VARCHAR) AS DOUBLE) AS ssd,
      |    LIST_REDUCE(LIST_PREPEND(0.0::DOUBLE,
      |      LIST(CAST(CAST(s AS VARCHAR) AS DOUBLE)
      |           * CAST(CAST(s AS VARCHAR) AS DOUBLE) / n ORDER BY t)),
      |      (acc, x) -> acc + x) AS a
      |  FROM m)
      |SELECT k, nn AS n,
      |  (a - sd * sd / nn) / 100000000.0::DOUBLE AS ss_between,
      |  (ssd - a) / 100000000.0::DOUBLE AS ss_within,
      |  ((a - sd * sd / nn) / (k - 1)) / ((ssd - a) / (nn - k)) AS f_stat
      |FROM g""".stripMargin) { (s, d) =>
    val m = events(s, d).select(col("event_type").as("t"), v4.as("v4"))
      .groupBy("t")
      .agg(count(lit(1)).as("n"),
        sum(col("v4").cast(dec)).as("s"),
        sum(col("v4").cast(dec) * col("v4").cast(dec)).as("ss"))
    val g = m.agg(count(lit(1)).as("k"), sum("n").as("nn"),
      sum(col("s")).cast("double").as("sd"),
      sum(col("ss")).cast("double").as("ssd"),
      orderedSum(col("t"),
        col("s").cast("double") * col("s").cast("double") / col("n"), "v")
        .as("a"))
    g.select(col("k"), col("nn").as("n"),
      ((col("a") - col("sd") * col("sd") / col("nn")) / 100000000.0)
        .as("ss_between"),
      ((col("ssd") - col("a")) / 100000000.0).as("ss_within"),
      (((col("a") - col("sd") * col("sd") / col("nn")) / (col("k") - 1)) /
        ((col("ssd") - col("a")) / (col("nn") - col("k")))).as("f_stat"))
  }

  /** Kendall's τ-b rank association between the two DAILY series of
    * the event stream — revenue (Σ value) and event count per day:
    * τ_b = (C − D) / √((n₀−n₁)(n₀−n₂)) with tie corrections n₁/n₂.
    * Every count is an exact integer off the i<j day-pair relation;
    * the only float is the final ratio. The day spine is
    * calendar-bounded (≤31 rows at any corpus size — the q158/q159
    * precedent), so the pair join is a constant-size cross product
    * under the documented BNL exemption, NOT a corpus-scaling join;
    * raw rows are touched once, in the daily hash aggregation. The
    * fully-tied degenerate case (n0=n1 or n0=n2 ⇒ zero denominator) is
    * NULLIF-guarded identically in both engines, so τ_b is NULL — not
    * an engine-dependent Inf/NaN — on constant series. */
  val q164KendallTau: Q = Q(
    "q164_kendall_tau",
    """WITH e AS (
      |  SELECT EPOCH_US(ts) // 86400000000 AS dd,
      |    CAST(FLOOR(value * 10000.0 + 0.5) AS BIGINT) AS v4
      |  FROM events),
      |dm AS (SELECT dd, SUM(v4)::HUGEINT AS x, COUNT(*)::BIGINT AS y
      |       FROM e GROUP BY 1),
      |p AS (
      |  SELECT
      |    CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END AS cx,
      |    CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END AS cy
      |  FROM dm a JOIN dm b ON b.dd > a.dd),
      |g AS (
      |  SELECT COUNT(*)::BIGINT AS n0,
      |    SUM(CASE WHEN cx * cy > 0 THEN 1 ELSE 0 END)::BIGINT AS c,
      |    SUM(CASE WHEN cx * cy < 0 THEN 1 ELSE 0 END)::BIGINT AS d,
      |    SUM(CASE WHEN cx = 0 THEN 1 ELSE 0 END)::BIGINT AS n1,
      |    SUM(CASE WHEN cy = 0 THEN 1 ELSE 0 END)::BIGINT AS n2
      |  FROM p),
      |nd AS (SELECT COUNT(*)::BIGINT AS n_days FROM dm)
      |SELECT nd.n_days, g.n0 AS n_pairs, g.c AS concordant,
      |  g.d AS discordant, g.n1 AS ties_x, g.n2 AS ties_y,
      |  (g.c - g.d) / NULLIF(SQRT(CAST((g.n0 - g.n1) AS DOUBLE)
      |    * CAST((g.n0 - g.n2) AS DOUBLE)), 0.0::DOUBLE) AS tau_b
      |FROM g CROSS JOIN nd""".stripMargin) { (s, d) =>
    val e = events(s, d).select(
      expr("unix_micros(ts) div 86400000000").as("dd"), v4.as("v4"))
    val dm = e.groupBy("dd")
      .agg(sum(col("v4").cast(dec)).as("x"), count(lit(1)).as("y"))
      .localCheckpoint(true) // ≤31 rows; both pair-join sides
    val p = dm.as("a").join(dm.as("b"), col("b.dd") > col("a.dd"))
      .select(
        when(col("b.x") > col("a.x"), 1L)
          .when(col("b.x") < col("a.x"), -1L).otherwise(0L).as("cx"),
        when(col("b.y") > col("a.y"), 1L)
          .when(col("b.y") < col("a.y"), -1L).otherwise(0L).as("cy"))
    val g = p.agg(count(lit(1)).as("n0"),
      sum(when(col("cx") * col("cy") > 0, 1L).otherwise(0L)).as("c"),
      sum(when(col("cx") * col("cy") < 0, 1L).otherwise(0L)).as("d"),
      sum(when(col("cx") === 0, 1L).otherwise(0L)).as("n1"),
      sum(when(col("cy") === 0, 1L).otherwise(0L)).as("n2"))
    val nd = dm.agg(count(lit(1)).as("n_days"))
    g.crossJoin(broadcast(nd))
      .select(col("n_days"), col("n0").as("n_pairs"),
        col("c").as("concordant"), col("d").as("discordant"),
        col("n1").as("ties_x"), col("n2").as("ties_y"),
        ((col("c") - col("d")) /
          nullif(sqrt((col("n0") - col("n1")).cast("double") *
            (col("n0") - col("n2")).cast("double")), lit(0.0))).as("tau_b"))
  }

  /** Cohen's d and Hedges' g effect sizes of each event type vs the
    * 'view' baseline — the magnitude companion to the q128/q99 test
    * statistics (a t-stat says "significant", d says "big"):
    * d = (m₁−m₂)/s_p with s_p the pooled SD, g = d·(1 − 3/(4N−9)).
    * Same exact ×10⁴ (n, Σv, Σv²) moments as q128, one mirrored
    * double tree per statistic. */
  val q165CohensD: Q = Q(
    "q165_cohens_d",
    """WITH m AS (
      |  SELECT event_type AS t, COUNT(*)::BIGINT AS n,
      |    SUM(CAST(FLOOR(value * 10000.0 + 0.5) AS BIGINT))::HUGEINT AS s,
      |    SUM(CAST(CAST(FLOOR(value * 10000.0 + 0.5) AS BIGINT) AS HUGEINT)
      |        * CAST(FLOOR(value * 10000.0 + 0.5) AS BIGINT))::HUGEINT AS ss
      |  FROM events GROUP BY 1),
      |b AS (SELECT n AS n2, s AS s2, ss AS ss2 FROM m WHERE t = 'view')
      |SELECT m.t AS event_type, m.n AS n1, b.n2,
      |  ((CAST(CAST(m.s AS VARCHAR) AS DOUBLE) / m.n - CAST(CAST(b.s2 AS VARCHAR) AS DOUBLE) / b.n2)
      |     / 10000.0::DOUBLE)
      |   / SQRT(((CAST(CAST(m.ss AS VARCHAR) AS DOUBLE) - CAST(CAST(m.s AS VARCHAR) AS DOUBLE)
      |        * CAST(CAST(m.s AS VARCHAR) AS DOUBLE) / m.n)
      |      + (CAST(CAST(b.ss2 AS VARCHAR) AS DOUBLE) - CAST(CAST(b.s2 AS VARCHAR) AS DOUBLE)
      |         * CAST(CAST(b.s2 AS VARCHAR) AS DOUBLE) / b.n2))
      |     / (m.n + b.n2 - 2) / 100000000.0::DOUBLE) AS cohens_d,
      |  (((CAST(CAST(m.s AS VARCHAR) AS DOUBLE) / m.n - CAST(CAST(b.s2 AS VARCHAR) AS DOUBLE) / b.n2)
      |     / 10000.0::DOUBLE)
      |   / SQRT(((CAST(CAST(m.ss AS VARCHAR) AS DOUBLE) - CAST(CAST(m.s AS VARCHAR) AS DOUBLE)
      |        * CAST(CAST(m.s AS VARCHAR) AS DOUBLE) / m.n)
      |      + (CAST(CAST(b.ss2 AS VARCHAR) AS DOUBLE) - CAST(CAST(b.s2 AS VARCHAR) AS DOUBLE)
      |         * CAST(CAST(b.s2 AS VARCHAR) AS DOUBLE) / b.n2))
      |     / (m.n + b.n2 - 2) / 100000000.0::DOUBLE))
      |   * (1.0::DOUBLE - 3.0::DOUBLE / (4.0::DOUBLE * (m.n + b.n2)
      |      - 9.0::DOUBLE)) AS hedges_g
      |FROM m CROSS JOIN b WHERE m.t <> 'view'
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    val m = events(s, d)
      .select(col("event_type").as("t"), v4.as("v4"))
      .groupBy("t")
      .agg(count(lit(1)).as("n"),
        sum(col("v4").cast(dec)).as("s"),
        sum(col("v4").cast(dec) * col("v4").cast(dec)).as("ss"))
    val b = broadcast(m.filter(col("t") === "view")
      .select(col("n").as("n2"), col("s").as("s2"), col("ss").as("ss2")))
    val n1d = col("n").cast("double"); val n2d = col("n2").cast("double")
    val meanDiff = (col("s").cast("double") / n1d -
      col("s2").cast("double") / n2d) / 10000.0
    val css1 = col("ss").cast("double") -
      col("s").cast("double") * col("s").cast("double") / n1d
    val css2 = col("ss2").cast("double") -
      col("s2").cast("double") * col("s2").cast("double") / n2d
    val pooled = (css1 + css2) / (col("n") + col("n2") - 2) / 1e8
    val dEff = meanDiff / sqrt(pooled)
    m.filter(col("t") =!= "view").crossJoin(b)
      .select(col("t").as("event_type"), col("n").as("n1"), col("n2"),
        dEff.as("cohens_d"),
        (dEff * (lit(1.0) - lit(3.0) /
          (lit(4.0) * (col("n") + col("n2")) - lit(9.0)))).as("hedges_g"))
      .orderBy("event_type")
  }

  /** Brown–Forsythe variance-equality test across event types (the
    * median-centered Levene — robust to non-normality): the one-way
    * ANOVA F statistic computed on z = |v − median_g|. The per-group
    * median is the LOWER median read exactly off the value spine
    * (rank ⌈n/2⌉, the q137/q155 convention — an exact integer, no
    * averaging of middles), z stays a ×10⁴ integer, and the W
    * statistic reuses the q163 single-ordered-fold decomposition.
    * Two corpus passes (spine, then z-moments against the broadcast
    * k-row median table); both are hash aggregations. */
  val q166LeveneBf: Q = Q(
    "q166_levene_bf",
    """WITH e AS (
      |  SELECT event_type AS t,
      |    CAST(FLOOR(value * 10000.0 + 0.5) AS BIGINT) AS v4
      |  FROM events),
      |sp AS (SELECT t, v4, COUNT(*)::BIGINT AS c FROM e GROUP BY 1, 2),
      |cw AS (
      |  SELECT t, v4, c,
      |    SUM(c) OVER (PARTITION BY t ORDER BY v4) AS cum,
      |    SUM(c) OVER (PARTITION BY t) AS n
      |  FROM sp),
      |med AS (SELECT t, MIN(v4) AS med FROM cw
      |        WHERE cum >= (n + 1) // 2 GROUP BY t),
      |z AS (
      |  SELECT e.t, ABS(e.v4 - med.med) AS z4
      |  FROM e JOIN med ON med.t = e.t),
      |m AS (
      |  SELECT t, COUNT(*)::BIGINT AS n, SUM(z4)::HUGEINT AS s,
      |    SUM(CAST(z4 AS HUGEINT) * z4)::HUGEINT AS ss
      |  FROM z GROUP BY 1),
      |g AS (
      |  SELECT COUNT(*)::BIGINT AS k, SUM(n)::BIGINT AS nn,
      |    CAST(CAST(SUM(s) AS VARCHAR) AS DOUBLE) AS sd,
      |    CAST(CAST(SUM(ss) AS VARCHAR) AS DOUBLE) AS ssd,
      |    LIST_REDUCE(LIST_PREPEND(0.0::DOUBLE,
      |      LIST(CAST(CAST(s AS VARCHAR) AS DOUBLE)
      |           * CAST(CAST(s AS VARCHAR) AS DOUBLE) / n ORDER BY t)),
      |      (acc, x) -> acc + x) AS a
      |  FROM m)
      |SELECT k, nn AS n,
      |  (a - sd * sd / nn) / 100000000.0::DOUBLE AS ss_between_z,
      |  (ssd - a) / 100000000.0::DOUBLE AS ss_within_z,
      |  ((a - sd * sd / nn) / (k - 1)) / ((ssd - a) / (nn - k)) AS w_stat
      |FROM g""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val e = events(s, d).select(col("event_type").as("t"), v4.as("v4"))
    val sp = e.groupBy("t", "v4").agg(count(lit(1)).as("c"))
    val wOrd = Window.partitionBy("t").orderBy("v4")
    val wAll = Window.partitionBy("t")
    val med = sp
      .withColumn("cum", sum("c").over(wOrd))
      .withColumn("n", sum("c").over(wAll))
      .filter(col("cum") >= expr("(n + 1) div 2"))
      .groupBy("t").agg(min("v4").as("med"))
    val z = e.join(broadcast(med), "t")
      .select(col("t"), abs(col("v4") - col("med")).as("z4"))
    val m = z.groupBy("t")
      .agg(count(lit(1)).as("n"),
        sum(col("z4").cast(dec)).as("s"),
        sum(col("z4").cast(dec) * col("z4").cast(dec)).as("ss"))
    val g = m.agg(count(lit(1)).as("k"), sum("n").as("nn"),
      sum(col("s")).cast("double").as("sd"),
      sum(col("ss")).cast("double").as("ssd"),
      orderedSum(col("t"),
        col("s").cast("double") * col("s").cast("double") / col("n"), "v")
        .as("a"))
    g.select(col("k"), col("nn").as("n"),
      ((col("a") - col("sd") * col("sd") / col("nn")) / 100000000.0)
        .as("ss_between_z"),
      ((col("ssd") - col("a")) / 100000000.0).as("ss_within_z"),
      (((col("a") - col("sd") * col("sd") / col("nn")) / (col("k") - 1)) /
        ((col("ssd") - col("a")) / (col("nn") - col("k")))).as("w_stat"))
  }

  /** Herfindahl–Hirschman concentration index of customer revenue per
    * region — "is this market a monopoly?" on the q03 join chain.
    * HHI = 10000·Σ share² computed WITHOUT per-customer float shares:
    * 10000·Σrev²/(Σrev)² with Σrev and Σrev² exact integer-cents
    * accumulations, so no order-dependent float sum ever crosses the
    * (large) customer dimension. CR1 (top-share) rides the same
    * moments. Two hash aggs; nation/region broadcast. */
  val q168Hhi: Q = Q(
    "q168_hhi_concentration",
    """WITH rev AS (
      |  SELECT r.r_name, o.o_custkey,
      |    SUM(CAST(FLOOR(o.o_totalprice * 100.0 + 0.5) AS BIGINT))::HUGEINT
      |      AS cents
      |  FROM region r
      |  JOIN nation n ON n.n_regionkey = r.r_regionkey
      |  JOIN customer c ON c.c_nationkey = n.n_nationkey
      |  JOIN orders o ON o.o_custkey = c.c_custkey
      |  GROUP BY 1, 2),
      |g AS (
      |  SELECT r_name, COUNT(*)::BIGINT AS n_customers,
      |    SUM(cents)::HUGEINT AS tot,
      |    SUM(cents * cents)::HUGEINT AS sq,
      |    MAX(cents)::HUGEINT AS mx
      |  FROM rev GROUP BY 1)
      |SELECT r_name, n_customers,
      |  10000.0::DOUBLE * CAST(CAST(sq AS VARCHAR) AS DOUBLE)
      |    / (CAST(CAST(tot AS VARCHAR) AS DOUBLE)
      |       * CAST(CAST(tot AS VARCHAR) AS DOUBLE)) AS hhi,
      |  CAST(CAST(mx AS VARCHAR) AS DOUBLE)
      |    / CAST(CAST(tot AS VARCHAR) AS DOUBLE) AS cr1
      |FROM g ORDER BY r_name""".stripMargin) { (s, d) =>
    val cents = floor(col("o_totalprice") * 100.0 + 0.5).cast("long")
    val r = region(s, d); val n = nation(s, d); val c = customer(s, d)
    val o = orders(s, d)
    val rev = o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name", "o_custkey")
      .agg(sum(cents.cast(dec)).as("cents"))
    rev.groupBy("r_name")
      .agg(count(lit(1)).as("n_customers"),
        sum(col("cents")).as("tot"),
        sum(col("cents") * col("cents")).as("sq"),
        max(col("cents")).as("mx"))
      .select(col("r_name"), col("n_customers"),
        (lit(10000.0) * col("sq").cast("double") /
          (col("tot").cast("double") * col("tot").cast("double"))).as("hhi"),
        (col("mx").cast("double") / col("tot").cast("double")).as("cr1"))
      .orderBy("r_name")
  }

  /** Log-log price elasticity of demand per part brand: the OLS slope
    * of ln(quantity) on ln(unit price) over lineitems,
    * β = (nΣxy − ΣxΣy)/(nΣxx − (Σx)²), with R². Log points are
    * quantized to ×10⁶ integers (floor(ln·1e6 + 0.5) — lnLibm matches
    * glibc/DuckDB LN bit-for-bit, the repo's q-ln convention), so ALL
    * moment sums are exact DECIMAL(38,0) integers; the slope and R²
    * are mirrored double trees over those exact integers. One hash agg
    * per brand after the part join; no float ever accumulates. */
  val q169PriceElasticity: Q = Q(
    "q169_price_elasticity",
    """WITH x AS (
      |  SELECT p.p_brand,
      |    CAST(FLOOR(LN(CAST(l.l_extendedprice AS DOUBLE)
      |      / CAST(l.l_quantity AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
      |      AS lp6,
      |    CAST(FLOOR(LN(CAST(l.l_quantity AS DOUBLE)) * 1000000.0 + 0.5)
      |      AS BIGINT) AS lq6
      |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
      |m AS (
      |  SELECT p_brand, COUNT(*)::BIGINT AS n,
      |    SUM(lp6)::HUGEINT AS sx, SUM(lq6)::HUGEINT AS sy,
      |    SUM(CAST(lp6 AS HUGEINT) * lp6)::HUGEINT AS sxx,
      |    SUM(CAST(lp6 AS HUGEINT) * lq6)::HUGEINT AS sxy,
      |    SUM(CAST(lq6 AS HUGEINT) * lq6)::HUGEINT AS syy
      |  FROM x GROUP BY 1)
      |SELECT p_brand, n,
      |  CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
      |    / CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) AS elasticity,
      |  (CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
      |    * CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE))
      |    / (CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE)
      |       * CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE)) AS r2
      |FROM m ORDER BY p_brand""".stripMargin) { (s, d) =>
    import graft.functions.MathExpressions.lnLibm
    val l = lineitem(s, d); val p = part(s, d)
    val lp6 = floor(lnLibm(col("l_extendedprice").cast("double") /
      col("l_quantity").cast("double")) * 1000000.0 + 0.5).cast("long")
    val lq6 = floor(lnLibm(col("l_quantity").cast("double")) * 1000000.0
      + 0.5).cast("long")
    val m = l.join(p, p("p_partkey") === l("l_partkey"))
      .select(col("p_brand"), lp6.as("lp6"), lq6.as("lq6"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"),
        sum(col("lp6").cast(dec)).as("sx"),
        sum(col("lq6").cast(dec)).as("sy"),
        sum(col("lp6").cast(dec) * col("lp6").cast(dec)).as("sxx"),
        sum(col("lp6").cast(dec) * col("lq6").cast(dec)).as("sxy"),
        sum(col("lq6").cast(dec) * col("lq6").cast(dec)).as("syy"))
    val nD = col("n").cast(dec)
    val num = (nD * col("sxy") - col("sx") * col("sy")).cast("double")
    val denX = (nD * col("sxx") - col("sx") * col("sx")).cast("double")
    val denY = (nD * col("syy") - col("sy") * col("sy")).cast("double")
    m.select(col("p_brand"), col("n"),
        (num / denX).as("elasticity"),
        (num * num / (denX * denY)).as("r2"))
      .orderBy("p_brand")
  }

  /** Minimum sample size for a two-proportion conversion test — the
    * ClickHouse `minSampleSizeConversion` planning function: per event
    * type, the per-arm n needed to detect an absolute +1pp shift of
    * that type's traffic share at α = 0.05 (two-sided), power = 0.8:
    * n = (z_{0.975}·√(2·p̄·(1−p̄)) + z_{0.8}·√(p₁q₁ + p₂q₂))² / mde².
    * The z quantiles are fixed literals in BOTH engines (no erf/Φ⁻¹ at
    * runtime), p₁ is an exact count ratio, and the whole statistic is
    * one mirrored double tree over the k-row type relation. p₂ is
    * LEAST-clamped to 1.0 in both engines so a >99%-share type cannot
    * push sqrt's argument negative (engine-dependent NaN handling). */
  val q170MinSampleSize: Q = Q(
    "q170_min_sample_size",
    """WITH m AS (
      |  SELECT event_type AS t, COUNT(*)::BIGINT AS n FROM events
      |  GROUP BY 1),
      |g AS (SELECT SUM(n)::BIGINT AS total FROM m),
      |p AS (
      |  SELECT m.t, m.n, CAST(m.n AS DOUBLE) / g.total AS p1,
      |    LEAST(CAST(m.n AS DOUBLE) / g.total + 0.01::DOUBLE,
      |      1.0::DOUBLE) AS p2
      |  FROM m CROSS JOIN g)
      |SELECT t AS event_type, n AS n_events, p1,
      |  (1.9599639845400545::DOUBLE
      |     * SQRT(2.0::DOUBLE * ((p1 + p2) / 2.0::DOUBLE)
      |       * (1.0::DOUBLE - (p1 + p2) / 2.0::DOUBLE))
      |   + 0.8416212335729143::DOUBLE
      |     * SQRT(p1 * (1.0::DOUBLE - p1) + p2 * (1.0::DOUBLE - p2)))
      |  * (1.9599639845400545::DOUBLE
      |     * SQRT(2.0::DOUBLE * ((p1 + p2) / 2.0::DOUBLE)
      |       * (1.0::DOUBLE - (p1 + p2) / 2.0::DOUBLE))
      |   + 0.8416212335729143::DOUBLE
      |     * SQRT(p1 * (1.0::DOUBLE - p1) + p2 * (1.0::DOUBLE - p2)))
      |  / (0.01::DOUBLE * 0.01::DOUBLE) AS n_per_arm
      |FROM p ORDER BY event_type""".stripMargin) { (s, d) =>
    val m = events(s, d).groupBy(col("event_type").as("t"))
      .agg(count(lit(1)).as("n"))
    val g = broadcast(m.agg(sum("n").as("total")))
    val p1 = col("n").cast("double") / col("total")
    val p2 = least(p1 + 0.01, lit(1.0))
    val pBar = (p1 + p2) / 2.0
    val root = lit(1.9599639845400545) *
      sqrt(lit(2.0) * pBar * (lit(1.0) - pBar)) +
      lit(0.8416212335729143) *
        sqrt(p1 * (lit(1.0) - p1) + p2 * (lit(1.0) - p2))
    m.crossJoin(g)
      .select(col("t").as("event_type"), col("n").as("n_events"),
        p1.as("p1"), (root * root / (lit(0.01) * lit(0.01))).as("n_per_arm"))
      .orderBy("event_type")
  }

  val all: Seq[Q] = Seq(q163AnovaF, q164KendallTau, q165CohensD,
    q166LeveneBf, q168Hhi, q169PriceElasticity, q170MinSampleSize)
}
