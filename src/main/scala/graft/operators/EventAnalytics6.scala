package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Q
import graft.Tables._

/** Sixth batch of event-stream analytics — the rank-statistics and
  * series-downsampling corner of the ClickHouse function surface
  * (`mannWhitneyUTest`, `rankCorr`, `largestTriangleThreeBuckets`):
  * the nonparametric tests a monitoring deployment runs when the
  * metric distribution is too skewed to trust [[EventAnalytics5]]'s
  * t-test, plus the bounded-output series sketch a dashboard pulls
  * instead of the raw stream.
  *
  * Exactness contracts as everywhere in this battery: every rank is an
  * INTEGER (mid-ranks carried ×2 so .5 ties stay exact), every power
  * sum is BIGINT/DECIMAL(38,0) ≡ HUGEINT, and doubles appear only in
  * final expression trees that are op-for-op identical in the Spark
  * plan and the DuckDB oracle.
  */
object EventAnalytics6 {

  private val dec = DecimalType(38, 0)

  /** ClickHouse-`mannWhitneyUTest` analogue: Mann–Whitney U and the
    * tie-corrected normal z approximation for each event type's value
    * distribution against the 'view' baseline — the distribution-free
    * "did this metric shift" test for skewed metrics.
    *
    * No sample is ever duplicated or re-sorted per pair: ranks are
    * computed on the VALUE DOMAIN. Counts collapse to (type, v4) cells
    * (v4 = value ×10⁴ fixed-point, the q98 convention); the baseline's
    * cell relation is replicated once per compared type (|types|·|domain|
    * rows — value-cardinality-bounded, never event-bounded); a per-type
    * cumulative window over the merged domain yields the ×2 mid-rank
    * 2·cumBelow + ties + 1 as a BIGINT. The rank sum, U, and the tie
    * correction Σ(t³−t) are exact integer aggregates; z is one final
    * double tree.
    *
    * 100 TB shape: ONE corpus-sized hash agg (map-side combined) to the
    * (type, v4) cells; everything after runs on the value domain, whose
    * size is bounded by the ×10⁴ grid of the value range, not by the
    * event count. The per-type window partitions on type over that
    * bounded domain. */
  val q101MannWhitney: Q = Q(
    "q101_mann_whitney",
    """WITH cnt AS (
      |  SELECT event_type AS t,
      |    CAST(FLOOR(value * 10000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS v4,
      |    COUNT(*)::BIGINT AS c
      |  FROM events GROUP BY 1, 2),
      |base AS (SELECT v4, c AS cb FROM cnt WHERE t = 'view'),
      |tl AS (SELECT DISTINCT t FROM cnt WHERE t <> 'view'),
      |dom AS (
      |  SELECT t, v4, SUM(ct)::BIGINT AS ct, SUM(cb)::BIGINT AS cb FROM (
      |    SELECT t, v4, c AS ct, 0 AS cb FROM cnt WHERE t <> 'view'
      |    UNION ALL
      |    SELECT tl.t, base.v4, 0 AS ct, base.cb FROM base CROSS JOIN tl)
      |  GROUP BY 1, 2),
      |r AS (
      |  SELECT t, v4, ct, cb,
      |    2 * (SUM(ct + cb) OVER (PARTITION BY t ORDER BY v4
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |         - (ct + cb)) + ct + cb + 1 AS rank2
      |  FROM dom),
      |s AS (
      |  SELECT t, SUM(ct)::BIGINT AS n1, SUM(cb)::BIGINT AS n2,
      |    SUM(CAST(ct AS HUGEINT) * rank2) AS r2,
      |    SUM(CAST(ct + cb AS HUGEINT) * (ct + cb) * (ct + cb)
      |        - (ct + cb)) AS tt
      |  FROM r GROUP BY t)
      |SELECT t AS event_type, n1, n2,
      |  CAST(r2 - CAST(n1 AS HUGEINT) * (n1 + 1) AS DOUBLE) / 2.0::DOUBLE AS u_stat,
      |  (CAST(r2 - CAST(n1 AS HUGEINT) * (n1 + 1) AS DOUBLE) - CAST(n1 * n2 AS DOUBLE))
      |    / (2.0::DOUBLE * SQRT(
      |        (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0::DOUBLE)
      |        * ((CAST(n1 + n2 AS DOUBLE) + 1.0::DOUBLE)
      |           - CAST(tt AS DOUBLE)
      |             / (CAST(n1 + n2 AS DOUBLE)
      |                * (CAST(n1 + n2 AS DOUBLE) - 1.0::DOUBLE)))))
      |    AS z_stat
      |FROM s
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    val cnt = events(s, d)
      .select(col("event_type").as("t"),
        floor(col("value") * 10000.0 + 0.5).cast("long").as("v4"))
      .groupBy("t", "v4").agg(count(lit(1)).as("c"))
      // r16: the (t, v4) value spine feeds three consumers (base, tl,
      // dom) — materialize once instead of three corpus scans (q119 fix)
      .localCheckpoint(true)
    val base = cnt.filter(col("t") === "view").select(col("v4"), col("c").as("cb"))
    val tl = broadcast(cnt.filter(col("t") =!= "view").select("t").distinct())
    val dom = cnt.filter(col("t") =!= "view")
      .select(col("t"), col("v4"), col("c").as("ct"), lit(0L).as("cb"))
      .unionByName(base.crossJoin(tl)
        .select(col("t"), col("v4"), lit(0L).as("ct"), col("cb")))
      .groupBy("t", "v4")
      .agg(sum("ct").as("ct"), sum("cb").as("cb"))
    val wCum = Window.partitionBy("t").orderBy("v4")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val r = dom.withColumn("rank2",
      lit(2L) * (sum(col("ct") + col("cb")).over(wCum) - (col("ct") + col("cb")))
        + col("ct") + col("cb") + 1L)
    val st = r.groupBy("t").agg(
      sum("ct").as("n1"), sum("cb").as("n2"),
      // r2 ~ 2n² per type — DECIMAL(38,0) ≡ HUGEINT like tt, so neither
      // engine can wrap/raise past ~2e9 events per type (r07 ADVICE)
      sum(col("ct").cast(dec) * col("rank2")).as("r2"),
      sum(((col("ct") + col("cb")).cast(dec) * (col("ct") + col("cb"))
        * (col("ct") + col("cb"))) - (col("ct") + col("cb")).cast(dec)).as("tt"))
    val nd = (col("n1") + col("n2")).cast("double")
    val u2d = (col("r2") - col("n1").cast(dec) * (col("n1") + 1)).cast("double")
    st.select(col("t").as("event_type"), col("n1"), col("n2"),
      (u2d / 2.0).as("u_stat"),
      ((u2d - (col("n1") * col("n2")).cast("double")) /
        (lit(2.0) * sqrt(
          (col("n1").cast("double") * col("n2").cast("double") / 12.0) *
            ((nd + 1.0) - col("tt").cast("double") / (nd * (nd - 1.0))))))
        .as("z_stat"))
      .orderBy("event_type")
  }

  /** ClickHouse-`rankCorr` analogue: Spearman rank correlation between
    * the metric value and the payload integer props.k, per event type —
    * the monotone-association check that survives outliers where plain
    * Pearson does not.
    *
    * Mid-ranks with ties are computed per type on each variable's VALUE
    * DOMAIN (the q101 ×2-integer mid-rank convention), mapped back to
    * events by two domain joins, and correlated via exact integer power
    * sums (Σr, Σr², Σrᵥrₖ as DECIMAL(38,0) ≡ HUGEINT). ρ is one final
    * double tree: (n·Sxy − SxSy) / (√vx·√vy) with vx, vy cast from the
    * exact integers separately, so both engines round identically.
    *
    * 100 TB shape: two corpus-sized hash aggs (to each value domain),
    * two per-type windows over the bounded domains, two shuffle joins
    * keyed (type, value) to tag events with ranks, one final hash agg.
    * Nothing driver-side; no per-pair re-sorting. */
  val q102Spearman: Q = Q(
    "q102_spearman",
    """WITH ev AS (
      |  SELECT event_type AS t,
      |    CAST(FLOOR(value * 10000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS v4,
      |    CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k
      |  FROM events
      |  WHERE JSON_EXTRACT_STRING(props, '$.k') IS NOT NULL),
      |cv AS (SELECT t, v4, COUNT(*)::BIGINT AS c FROM ev GROUP BY 1, 2),
      |rv AS (
      |  SELECT t, v4,
      |    2 * (SUM(c) OVER (PARTITION BY t ORDER BY v4
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c)
      |      + c + 1 AS rv2
      |  FROM cv),
      |ck AS (SELECT t, k, COUNT(*)::BIGINT AS c FROM ev GROUP BY 1, 2),
      |rk AS (
      |  SELECT t, k,
      |    2 * (SUM(c) OVER (PARTITION BY t ORDER BY k
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c)
      |      + c + 1 AS rk2
      |  FROM ck),
      |j AS (
      |  SELECT ev.t, rv.rv2, rk.rk2
      |  FROM ev JOIN rv ON rv.t = ev.t AND rv.v4 = ev.v4
      |          JOIN rk ON rk.t = ev.t AND rk.k = ev.k),
      |s AS (
      |  SELECT t, COUNT(*)::BIGINT AS n,
      |    SUM(rv2)::HUGEINT AS sx, SUM(rk2)::HUGEINT AS sy,
      |    SUM(CAST(rv2 AS HUGEINT) * rv2) AS sxx,
      |    SUM(CAST(rk2 AS HUGEINT) * rk2) AS syy,
      |    SUM(CAST(rv2 AS HUGEINT) * rk2) AS sxy
      |  FROM j GROUP BY t)
      |SELECT t AS event_type, n,
      |  CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
      |    / (SQRT(CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE))
      |       * SQRT(CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE))) AS spearman_rho
      |FROM s
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    val ev = events(s, d)
      .select(col("event_type").as("t"),
        floor(col("value") * 10000.0 + 0.5).cast("long").as("v4"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k"))
      .filter(col("k").isNotNull)
    // r16: ONE corpus aggregation to the joint (t, v4, k) distribution;
    // both value-domain marginals derive from it (Σcnt grouped by each
    // key ≡ counting events directly), and the power sums weight each
    // joint cell by cnt — Σ_events f(rv2, rk2) ≡ Σ_cells cnt·f. The
    // previous shape aggregated the corpus three times and shuffle-joined
    // the full event stream twice; now the joins touch only the joint
    // relation (bounded by the distinct (v4, k) pairing, ≪ corpus).
    // Identical integers at every step. Guide §2.3/§2.4.
    val joint = ev.groupBy("t", "v4", "k").agg(count(lit(1)).as("cnt"))
    def ranks(c: String, out: String) = {
      val w = Window.partitionBy("t").orderBy(c)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      joint.groupBy("t", c).agg(sum(col("cnt")).as("c"))
        .withColumn(out,
          lit(2L) * (sum("c").over(w) - col("c")) + col("c") + 1L)
        .drop("c")
    }
    val j = joint
      .join(ranks("v4", "rv2"), Seq("t", "v4"))
      .join(ranks("k", "rk2"), Seq("t", "k"))
    val st = j.groupBy("t").agg(
      sum(col("cnt")).as("n"),
      sum(col("rv2") * col("cnt")).cast(dec).as("sx"),
      sum(col("rk2") * col("cnt")).cast(dec).as("sy"),
      sum(col("rv2").cast(dec) * col("rv2") * col("cnt")).as("sxx"),
      sum(col("rk2").cast(dec) * col("rk2") * col("cnt")).as("syy"),
      sum(col("rv2").cast(dec) * col("rk2") * col("cnt")).as("sxy"))
    st.select(col("t").as("event_type"), col("n"),
      ((col("n").cast(dec) * col("sxy") - col("sx") * col("sy")).cast("double") /
        (sqrt((col("n").cast(dec) * col("sxx") - col("sx") * col("sx")).cast("double")) *
          sqrt((col("n").cast(dec) * col("syy") - col("sy") * col("sy")).cast("double"))))
        .as("spearman_rho"))
      .orderBy("event_type")
  }

  /** Time buckets per series for [[q103Lttb]]. */
  private val LttbBuckets = 24

  /** ClickHouse-`largestTriangleThreeBuckets` analogue: downsample each
    * event type's (ts, value) series to ≤ [[LttbBuckets]] visually
    * representative points — the bounded-output sketch a dashboard
    * fetches instead of the raw stream.
    *
    * Parallel integer-centroid variant (the sequential reference
    * algorithm chains each pick to the previous one — unusable on a
    * cluster): per bucket, the retained point maximizes the triangle
    * area against the ADJACENT BUCKETS' truncated-integer centroids
    * (x̄ = Σx÷n, ȳ = Σy÷n in BIGINT — truncation toward zero on BOTH
    * engines: Spark `div` truncates natively and DuckDB's integer `//`
    * ALSO truncates toward zero (−7 // 2 = −3; it floors only for
    * DOUBLE operands — the q147_holt_linear engine-fact note). The
    * oracle's sign-split CASE around Σ÷n is therefore defensive
    * documentation only — a no-op that makes the
    * truncation-toward-zero contract explicit in the SQL itself),
    * and the global first/last points
    * anchor the series exactly as in the reference algorithm. Because
    * the area is translation-invariant, the centroid differences stay
    * span-bounded, so 2·area = |(x̄₋−x̄₊)(y−ȳ₋) − (x̄₋−x)(ȳ₊−ȳ₋)| is
    * exact in DECIMAL(38,0) ≡ HUGEINT at ANY row count — no n³ blowup,
    * the reason centroids are floored to integers first. Ties break on
    * (ts, event_id): fully deterministic, no doubles anywhere.
    *
    * 100 TB shape: one hash agg to (type, bucket) centroids (tiny), a
    * lag/lead window over the per-type bucket axis (≤ B rows per type),
    * one broadcast join of those neighbor centroids back onto the
    * stream, and a per-(type, bucket) top-1 window (WindowGroupLimit
    * prunes it to one row per partition before any sort spills). */
  val q103Lttb: Q = Q(
    "q103_lttb_downsample",
    s"""WITH e AS (
       |  SELECT event_type AS t, event_id, ts, value,
       |    EPOCH_US(ts) AS xs,
       |    CAST(FLOOR(value * 10000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS y
       |  FROM events),
       |bounds AS (SELECT t, MIN(xs) AS x0, MAX(xs) AS x1 FROM e GROUP BY t),
       |eb AS (
       |  SELECT e.t, e.event_id, e.ts, e.value, e.xs - bounds.x0 AS x, e.y,
       |    ((e.xs - bounds.x0) * $LttbBuckets) // (bounds.x1 - bounds.x0 + 1)
       |      AS b
       |  FROM e JOIN bounds ON bounds.t = e.t),
       |bk AS (
       |  SELECT t, b,
       |    CASE WHEN SUM(x) >= 0 THEN SUM(x) // COUNT(*)
       |         ELSE -((-SUM(x)) // COUNT(*)) END AS cx,
       |    CASE WHEN SUM(y) >= 0 THEN SUM(y) // COUNT(*)
       |         ELSE -((-SUM(y)) // COUNT(*)) END AS cy
       |  FROM eb GROUP BY 1, 2),
       |nb AS (
       |  SELECT t, b,
       |    LAG(cx)  OVER (PARTITION BY t ORDER BY b) AS cxp,
       |    LAG(cy)  OVER (PARTITION BY t ORDER BY b) AS cyp,
       |    LEAD(cx) OVER (PARTITION BY t ORDER BY b) AS cxn,
       |    LEAD(cy) OVER (PARTITION BY t ORDER BY b) AS cyn
       |  FROM bk),
       |mid AS (
       |  SELECT eb.t, eb.b, eb.event_id, eb.ts, eb.value,
       |    ABS(CAST(nb.cxp - nb.cxn AS HUGEINT) * (eb.y - nb.cyp)
       |        - CAST(nb.cxp - eb.x AS HUGEINT) * (nb.cyn - nb.cyp)) AS a2,
       |    ROW_NUMBER() OVER (PARTITION BY eb.t, eb.b ORDER BY
       |      ABS(CAST(nb.cxp - nb.cxn AS HUGEINT) * (eb.y - nb.cyp)
       |          - CAST(nb.cxp - eb.x AS HUGEINT) * (nb.cyn - nb.cyp)) DESC,
       |      eb.ts, eb.event_id) AS rn
       |  FROM eb JOIN nb ON nb.t = eb.t AND nb.b = eb.b
       |  WHERE eb.b > 0 AND eb.b < ${LttbBuckets - 1}),
       |anchors AS (
       |  SELECT t, b, event_id, ts, value FROM (
       |    SELECT t, b, event_id, ts, value,
       |      ROW_NUMBER() OVER (PARTITION BY t ORDER BY ts, event_id) AS rf,
       |      ROW_NUMBER() OVER (PARTITION BY t ORDER BY ts DESC, event_id DESC)
       |        AS rl
       |    FROM eb)
       |  WHERE rf = 1 OR rl = 1)
       |SELECT t AS event_type, CAST(b AS BIGINT) AS bucket, ts, value
       |FROM (
       |  SELECT t, b, event_id, ts, value FROM mid WHERE rn = 1
       |  UNION ALL
       |  SELECT t, b, event_id, ts, value FROM anchors)
       |ORDER BY event_type, ts, event_id""".stripMargin) { (s, d) =>
    val e = events(s, d).select(
      col("event_type").as("t"), col("event_id"), col("ts"), col("value"),
      unix_micros(col("ts")).as("xs"),
      floor(col("value") * 10000.0 + 0.5).cast("long").as("y"))
    val bounds = broadcast(
      e.groupBy("t").agg(min("xs").as("x0"), max("xs").as("x1")))
    // r17 (r16 verdict item 1): eb is CORPUS-sized — its former eager
    // localCheckpoint materialized the whole event stream into executor
    // storage (not fault-tolerant, cluster-storage-sized at 100 TB).
    // Only the ≤|t|·LttbBuckets bucket aggregate is checkpointed now;
    // the three eb consumers re-scan parquet but each collapses into a
    // map-combined hash agg (the two row_number windows below became
    // min/max-struct aggs), so NO corpus rows are ever shuffled or
    // sorted — cheaper than the checkpoint even at sf0.1.
    val eb = e.join(bounds, "t")
      .withColumn("x", col("xs") - col("x0"))
      .withColumn("b",
        expr(s"(x * $LttbBuckets) div (x1 - x0 + 1)"))
      .select("t", "event_id", "ts", "value", "x", "y", "b")
    val bk = eb.groupBy("t", "b")
      .agg(expr("sum(x) div count(*)").as("cx"),
        expr("sum(y) div count(*)").as("cy"))
      .localCheckpoint(true) // bounded: |t| × LttbBuckets rows
    val wB = Window.partitionBy("t").orderBy("b")
    val nb = broadcast(bk.select(col("t"), col("b"),
      lag("cx", 1).over(wB).as("cxp"), lag("cy", 1).over(wB).as("cyp"),
      lead("cx", 1).over(wB).as("cxn"), lead("cy", 1).over(wB).as("cyn")))
    val a2 = abs((col("cxp") - col("cxn")).cast(dec) * (col("y") - col("cyp"))
      - (col("cxp") - col("x")).cast(dec) * (col("cyn") - col("cyp")))
    // argmax per (t, b) by (a2 DESC, ts ASC, event_id ASC) as one
    // map-combined agg — within a type, ts order ≡ x order (x = xs−x0,
    // x0 constant per type) and event_id is unique, so the struct max
    // picks exactly the former row_number()=1 row with no (t, b)-keyed
    // corpus shuffle + sort
    val mid = eb.filter(col("b") > 0 && col("b") < LttbBuckets - 1)
      .join(nb, Seq("t", "b"))
      .withColumn("a2", a2)
      .groupBy("t", "b")
      .agg(max(struct(col("a2"), (-col("x")).as("nx"),
        (-col("event_id")).as("nid"),
        struct(col("event_id"), col("ts"), col("value")).as("p")))
        .as("m"))
      .select(col("t"), col("b"), col("m.p.event_id").as("event_id"),
        col("m.p.ts").as("ts"), col("m.p.value").as("value"))
    // first/last per type = min/max of the same unique (x, event_id)
    // order (the former pair of opposite-order row_number windows);
    // array_distinct collapses the single-event-type case to one row
    // exactly like rf=1 ∧ rl=1 did
    val anchorKey = struct(col("x"), col("event_id"), col("b"),
      col("ts"), col("value"))
    val anchors = eb.groupBy("t")
      .agg(min(anchorKey).as("mn"), max(anchorKey).as("mx"))
      .select(col("t"),
        explode(array_distinct(array(col("mn"), col("mx")))).as("p"))
      .select(col("t"), col("p.b").as("b"), col("p.event_id").as("event_id"),
        col("p.ts").as("ts"), col("p.value").as("value"))
    mid.unionByName(anchors)
      .select(col("t").as("event_type"), col("b").cast("long").as("bucket"),
        col("ts"), col("value"))
      .orderBy(col("event_type"), col("ts"))
  }

  /** ClickHouse-`exponentialTimeDecayedSum/Count/Avg` analogue: the
    * freshness-weighted metric total per event type, weight ½^age with
    * a one-day half-life anchored at each type's newest event.
    *
    * The weight is kept EXACT: age collapses to whole days k (BIGINT
    * µs arithmetic), the weight 2⁻ᵏ is carried ×2⁵⁰ as the integer
    * 1<<(50−k) (zero once k>50 — contributions below 2⁻⁵⁰ ≈ 8.9e−16
    * are dropped, documented), and the weighted sums accumulate in
    * DECIMAL(38,0) ≡ HUGEINT. The final rescale divides by the exact
    * power 2⁵⁰ (no rounding) and then once by 10⁴ — identical trees
    * both engines, so no float-sum order dependence anywhere.
    *
    * 100 TB shape: one agg for per-type max ts (broadcast back), one
    * corpus-sized map-side-combined hash agg. No windows, no sorts. */
  val q104TimeDecayedSum: Q = Q(
    "q104_time_decayed_sum",
    """WITH mx AS (
      |  SELECT event_type AS t, MAX(EPOCH_US(ts)) AS tmax
      |  FROM events GROUP BY 1),
      |e AS (
      |  SELECT events.event_type AS t,
      |    CAST(FLOOR(value * 10000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS v4,
      |    (mx.tmax - EPOCH_US(ts)) // 86400000000 AS k
      |  FROM events JOIN mx ON mx.t = events.event_type),
      |s AS (
      |  SELECT t, COUNT(*)::BIGINT AS n,
    |    SUM(CASE WHEN k <= 50
      |        THEN CAST(v4 AS HUGEINT)
      |             * (1::BIGINT << CAST(50 - LEAST(k, 50) AS INTEGER))
      |        ELSE 0::HUGEINT END) AS ws,
      |    SUM(CASE WHEN k <= 50
      |        THEN CAST(1::BIGINT << CAST(50 - LEAST(k, 50) AS INTEGER)
      |             AS HUGEINT)
      |        ELSE 0::HUGEINT END) AS wc
      |  FROM e GROUP BY t)
      |SELECT t AS event_type, n,
      |  CAST(ws AS DOUBLE) / 1125899906842624.0::DOUBLE / 10000.0::DOUBLE
      |    AS decayed_sum,
      |  CAST(wc AS DOUBLE) / 1125899906842624.0::DOUBLE AS decayed_count,
      |  (CAST(ws AS DOUBLE) / 1125899906842624.0::DOUBLE / 10000.0::DOUBLE)
      |    / (CAST(wc AS DOUBLE) / 1125899906842624.0::DOUBLE) AS decayed_avg
      |FROM s
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    val ev = events(s, d)
    val mx = broadcast(ev.groupBy(col("event_type").as("t"))
      .agg(max(unix_micros(col("ts"))).as("tmax")))
    val e = ev.join(mx, ev("event_type") === mx("t"))
      .select(col("t"),
        floor(col("value") * 10000.0 + 0.5).cast("long").as("v4"),
        expr("(tmax - unix_micros(ts)) div 86400000000").as("k"))
    val w = expr("shiftleft(1L, cast(50 - least(k, 50L) as int))")
    val st = e.groupBy("t").agg(
      count(lit(1)).as("n"),
      sum(when(col("k") <= 50, col("v4").cast(dec) * w)
        .otherwise(lit(0).cast(dec))).as("ws"),
      sum(when(col("k") <= 50, w.cast(dec))
        .otherwise(lit(0).cast(dec))).as("wc"))
    val p50 = lit(1125899906842624.0) // 2^50, exact double
    st.select(col("t").as("event_type"), col("n"),
      (col("ws").cast("double") / p50 / 10000.0).as("decayed_sum"),
      (col("wc").cast("double") / p50).as("decayed_count"),
      ((col("ws").cast("double") / p50 / 10000.0) /
        (col("wc").cast("double") / p50)).as("decayed_avg"))
      .orderBy("event_type")
  }

  /** ClickHouse-`sequenceNextNode` analogue: what does a user do right
    * after a view→click pair? For each user's (ts, event_id)-ordered
    * stream, take the FIRST click directly preceded by a view and
    * report the immediately following event type ('(end)' if the click
    * closes the stream); aggregate users by that next step.
    *
    * 100 TB shape: one per-user window pass (lag/lead/row_number in a
    * single Window over the same (user, ts, id) sort — one shuffle,
    * one sort), then a tiny hash agg over ≤|event types|+1 rows. */
  val q105SequenceNextNode: Q = Q(
    "q105_sequence_next_node",
    """WITH o AS (
      |  SELECT user_id, event_type,
      |    LAG(event_type)  OVER w AS prev,
      |    LEAD(event_type) OVER w AS nxt,
      |    ts, event_id
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |hits AS (
      |  SELECT user_id, COALESCE(nxt, '(end)') AS next_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS rn
      |  FROM o
      |  WHERE prev = 'view' AND event_type = 'click')
      |SELECT next_type, COUNT(*)::BIGINT AS n_users
      |FROM hits WHERE rn = 1
      |GROUP BY next_type
      |ORDER BY next_type""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val o = events(s, d).select(col("user_id"), col("event_type"),
      lag("event_type", 1).over(w).as("prev"),
      lead("event_type", 1).over(w).as("nxt"),
      col("ts"), col("event_id"))
    val hits = o.filter(col("prev") === "view" && col("event_type") === "click")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    hits.groupBy(coalesce(col("nxt"), lit("(end)")).as("next_type"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("next_type")
  }

  /** ClickHouse-`theilsU` analogue: the (asymmetric) uncertainty
    * coefficient U(type | payload bucket) on the same contingency
    * cells as [[EventAnalytics5.q100CramersV]] — how much knowing the
    * payload bucket reduces uncertainty about the event type.
    *
    * U = (H(T) − H(T|B)) / H(T) with H from exact cell counts and
    * [[graft.functions.PortableLn]] (bit-identical ln on both engines:
    * every stage IEEE-specified). Both entropy sums run as SEQUENTIAL
    * FOLDS over (t,b)-sorted bounded arrays — the q100 convention — so
    * float addition order cannot diverge. ln arguments are ≥1 by
    * construction (N/rt, ctot/o), inside PortableLn's domain.
    *
    * 100 TB shape: one corpus-sized hash agg to the |types|·10 cells;
    * everything after is arithmetic on that bounded relation. */
  val q106TheilsU: Q = Q(
    "q106_theils_u",
    s"""WITH cells AS (
       |  SELECT event_type AS ty,
       |    CAST(JSON_EXTRACT_STRING(props, '$$.k') AS BIGINT) % 10 AS b,
       |    COUNT(*)::BIGINT AS o
       |  FROM events GROUP BY 1, 2),
       |ct AS (SELECT b, SUM(o)::BIGINT AS ctot FROM cells GROUP BY b),
       |n AS (SELECT SUM(o)::BIGINT AS nn FROM cells),
       |clx AS (
       |  SELECT ty, b, lnx FROM (${graft.functions.PortableLn.sqlStages(
            "(SELECT cells.ty, cells.b, CAST(ct.ctot AS DOUBLE) / CAST(cells.o AS DOUBLE) AS x, cells.o FROM cells JOIN ct ON ct.b = cells.b)",
            Seq("ty", "b"), "x", "lnx")})),
       |cterm AS (
       |  SELECT cells.ty, cells.b,
       |    (CAST(cells.o AS DOUBLE) / CAST(nn AS DOUBLE)) * clx.lnx AS term
       |  FROM cells JOIN clx ON clx.ty = cells.ty AND clx.b = cells.b
       |  CROSS JOIN n),
       |hcond AS (
       |  SELECT LIST_REDUCE(LIST_PREPEND(0.0::DOUBLE,
       |    ARRAY_AGG(term ORDER BY ty, b)), (a, x) -> a + x) AS h_t_given_b
       |  FROM cterm),
       |rt AS (SELECT ty, SUM(o)::BIGINT AS rtot FROM cells GROUP BY ty),
       |rlx AS (
       |  SELECT ty, lnx FROM (${graft.functions.PortableLn.sqlStages(
            "(SELECT rt.ty, CAST(n.nn AS DOUBLE) / CAST(rt.rtot AS DOUBLE) AS x, rt.rtot FROM rt CROSS JOIN n)",
            Seq("ty"), "x", "lnx")})),
       |rterm AS (
       |  SELECT rt.ty,
       |    (CAST(rt.rtot AS DOUBLE) / CAST(nn AS DOUBLE)) * rlx.lnx AS term
       |  FROM rt JOIN rlx ON rlx.ty = rt.ty CROSS JOIN n),
       |ht AS (
       |  SELECT LIST_REDUCE(LIST_PREPEND(0.0::DOUBLE,
       |    ARRAY_AGG(term ORDER BY ty)), (a, x) -> a + x) AS h_t
       |  FROM rterm)
       |SELECT n.nn AS n, ht.h_t, hcond.h_t_given_b,
       |  (ht.h_t - hcond.h_t_given_b) / ht.h_t AS theils_u
       |FROM ht CROSS JOIN hcond CROSS JOIN n""".stripMargin) { (s, d) =>
    val cells = events(s, d)
      .select(col("event_type").as("t"),
        (get_json_object(col("props"), "$.k").cast("bigint") % 10).as("b"))
      .groupBy("t", "b").agg(count(lit(1)).as("o"))
      // r16: |types|×10 rows at ANY corpus size — materialize once so the
      // four consumers (ct, n, clx, rt) read 50 rows instead of carrying
      // four copies of the corpus scan + JSON extraction (the q100 fix)
      .localCheckpoint(true)
    val ct = cells.groupBy("b").agg(sum("o").as("ctot"))
    val n = broadcast(cells.agg(sum("o").as("nn")))
    val clx = graft.functions.PortableLn.withLn(
      cells.join(ct, "b")
        .select(col("t"), col("b"),
          (col("ctot").cast("double") / col("o").cast("double")).as("x"),
          col("o")),
      "x", "lnx")
    val cterm = clx.crossJoin(n)
      .select(col("t"), col("b"),
        ((col("o").cast("double") / col("nn").cast("double")) * col("lnx"))
          .as("term"))
    val hcond = cterm
      .agg(sort_array(collect_list(struct(col("t"), col("b"), col("term"))))
        .as("cells"))
      .select(aggregate(transform(col("cells"), e => e.getField("term")),
        lit(0.0), (a, x) => a + x).as("h_t_given_b"))
    val rt = cells.groupBy("t").agg(sum("o").as("rtot"))
    val rlx = graft.functions.PortableLn.withLn(
      rt.crossJoin(n)
        .select(col("t"),
          (col("nn").cast("double") / col("rtot").cast("double")).as("x"),
          col("rtot")),
      "x", "lnx")
    val rterm = rlx.crossJoin(n)
      .select(col("t"),
        ((col("rtot").cast("double") / col("nn").cast("double")) * col("lnx"))
          .as("term"))
    val ht = rterm
      .agg(sort_array(collect_list(struct(col("t"), col("term")))).as("cells"))
      .select(aggregate(transform(col("cells"), e => e.getField("term")),
        lit(0.0), (a, x) => a + x).as("h_t"))
    ht.crossJoin(hcond).crossJoin(n)
      .select(col("nn").as("n"), col("h_t"), col("h_t_given_b"),
        ((col("h_t") - col("h_t_given_b")) / col("h_t")).as("theils_u"))
  }

  val all: Seq[Q] = Seq(q101MannWhitney, q102Spearman, q103Lttb,
    q104TimeDecayedSum, q105SequenceNextNode, q106TheilsU)
}
