package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Q
import graft.Tables._

/** Eighth batch of event-stream analytics — distribution-shape checks
  * from the ClickHouse surface (`seriesOutliersDetectTukey`,
  * `kolmogorovSmirnovTest`, `arrayAUC`): the robust outlier fence, the
  * distribution-equality test, and the ranking-quality score, all
  * computed on the ×10⁴ fixed-point VALUE DOMAIN so every threshold
  * comparison and every supremum is exact integer arithmetic (the
  * [[EventAnalytics6]] convention — Tukey's 1.5·IQR fence is compared
  * ×2, the KS supremum ×(n1·n2), AUC ×(2·n1·n2)).
  *
  * 100 TB shape for all three: ONE corpus-sized hash agg to (type,
  * value) cells, then windows/joins over the value-cardinality-bounded
  * domain — never event-bounded, never driver-side. */
object EventAnalytics8 {

  private val dec = DecimalType(38, 0)

  /** Tukey-fence outlier profile per event type: exact lower-selection
    * quartiles (smallest v with 4·cum ≥ n / ≥ 3n — the q98 rule), and
    * the count of events outside [q1 − 1.5·IQR, q3 + 1.5·IQR]. The
    * fence test runs ×2 so 1.5·IQR stays integer:
    * 2·v < 2·q1 − 3·IQR or 2·v > 2·q3 + 3·IQR. */
  val q110TukeyOutliers: Q = Q(
    "q110_tukey_outliers",
    """WITH cnt AS (
      |  SELECT event_type AS t,
      |    CAST(FLOOR(value * 10000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS v4,
      |    COUNT(*)::BIGINT AS c
      |  FROM events GROUP BY 1, 2),
      |cum AS (
      |  SELECT t, v4, c,
      |    SUM(c) OVER (PARTITION BY t ORDER BY v4
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS cu,
      |    SUM(c) OVER (PARTITION BY t) AS n
      |  FROM cnt),
      |q AS (
      |  SELECT t, MAX(n)::BIGINT AS n,
      |    MIN(CASE WHEN 4 * cu >= n THEN v4 END) AS q1,
      |    MIN(CASE WHEN 4 * cu >= 3 * n THEN v4 END) AS q3
      |  FROM cum GROUP BY t),
      |o AS (
      |  SELECT cnt.t, q.n, q.q1, q.q3,
      |    SUM(CASE WHEN 2 * cnt.v4 < 2 * q.q1 - 3 * (q.q3 - q.q1)
      |              OR 2 * cnt.v4 > 2 * q.q3 + 3 * (q.q3 - q.q1)
      |        THEN cnt.c ELSE 0 END)::BIGINT AS n_out
      |  FROM cnt JOIN q ON q.t = cnt.t
      |  GROUP BY 1, 2, 3, 4)
      |SELECT t AS event_type, n,
      |  CAST(q1 AS DOUBLE) / 10000.0::DOUBLE AS q1,
      |  CAST(q3 AS DOUBLE) / 10000.0::DOUBLE AS q3,
      |  n_out AS n_outliers,
      |  CAST(n_out AS DOUBLE) / CAST(n AS DOUBLE) AS outlier_frac
      |FROM o
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    val cnt = events(s, d)
      .select(col("event_type").as("t"),
        floor(col("value") * 10000.0 + 0.5).cast("long").as("v4"))
      .groupBy("t", "v4").agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("t").orderBy("v4")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("t")
    val cum = cnt
      .withColumn("cu", sum("c").over(wCum))
      .withColumn("n", sum("c").over(wAll))
    val q = cum.groupBy("t").agg(
      max("n").as("n"),
      min(when(lit(4L) * col("cu") >= col("n"), col("v4"))).as("q1"),
      min(when(lit(4L) * col("cu") >= lit(3L) * col("n"), col("v4"))).as("q3"))
    val iqr = col("q3") - col("q1")
    val o = cnt.join(broadcast(q), "t")
      .groupBy("t", "n", "q1", "q3")
      .agg(sum(when(
        (lit(2L) * col("v4") < lit(2L) * col("q1") - lit(3L) * iqr) ||
          (lit(2L) * col("v4") > lit(2L) * col("q3") + lit(3L) * iqr),
        col("c")).otherwise(0L)).as("n_out"))
    o.select(col("t").as("event_type"), col("n"),
      (col("q1").cast("double") / 10000.0).as("q1"),
      (col("q3").cast("double") / 10000.0).as("q3"),
      col("n_out").as("n_outliers"),
      (col("n_out").cast("double") / col("n").cast("double"))
        .as("outlier_frac"))
      .orderBy("event_type")
  }

  /** ClickHouse-`kolmogorovSmirnovTest` analogue: two-sample KS
    * statistic of each event type's value distribution vs the 'view'
    * baseline. The supremum runs ×(n1·n2): D_num = max |cum1·n2 −
    * cum2·n1| over the merged value domain (exact DECIMAL(38,0) ≡
    * HUGEINT), its location is the smallest value attaining it, and
    * D and the asymptotic z = D·√(n1n2/(n1+n2)) are final double
    * trees. Domain merge exactly as [[EventAnalytics6.q101MannWhitney]]. */
  val q111KsTest: Q = Q(
    "q111_ks_test",
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
      |cum AS (
      |  SELECT t, v4,
      |    SUM(ct) OVER w AS cu1, SUM(cb) OVER w AS cu2,
      |    SUM(ct) OVER (PARTITION BY t) AS n1,
      |    SUM(cb) OVER (PARTITION BY t) AS n2
      |  FROM dom
      |  WINDOW w AS (PARTITION BY t ORDER BY v4
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |dev AS (
      |  SELECT t, v4, n1, n2,
      |    ABS(CAST(cu1 AS HUGEINT) * n2 - CAST(cu2 AS HUGEINT) * n1) AS dn,
      |    ROW_NUMBER() OVER (PARTITION BY t ORDER BY
      |      ABS(CAST(cu1 AS HUGEINT) * n2 - CAST(cu2 AS HUGEINT) * n1) DESC,
      |      v4) AS rn
      |  FROM cum)
      |SELECT t AS event_type, n1::BIGINT AS n1, n2::BIGINT AS n2,
      |  CAST(dn AS DOUBLE)
      |    / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS ks_d,
      |  CAST(v4 AS DOUBLE) / 10000.0::DOUBLE AS ks_at,
      |  (CAST(dn AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)))
      |    * SQRT(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
      |           / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))) AS ks_z
      |FROM dev WHERE rn = 1
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
    val wAll = Window.partitionBy("t")
    val cum = dom
      .withColumn("cu1", sum("ct").over(wCum))
      .withColumn("cu2", sum("cb").over(wCum))
      .withColumn("n1", sum("ct").over(wAll))
      .withColumn("n2", sum("cb").over(wAll))
    val dn = abs(col("cu1").cast(dec) * col("n2") -
      col("cu2").cast(dec) * col("n1"))
    val wPick = Window.partitionBy("t").orderBy(col("dn").desc, col("v4"))
    val n1d = col("n1").cast("double")
    val n2d = col("n2").cast("double")
    val ksd = col("dn").cast("double") / (n1d * n2d)
    cum.withColumn("dn", dn)
      .withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1)
      .select(col("t").as("event_type"), col("n1"), col("n2"),
        ksd.as("ks_d"),
        (col("v4").cast("double") / 10000.0).as("ks_at"),
        (ksd * sqrt(n1d * n2d / (n1d + n2d))).as("ks_z"))
      .orderBy("event_type")
  }

  /** ClickHouse-`arrayAUC` analogue: AUC of the metric value as a
    * classifier separating each event type from the 'view' baseline —
    * exactly U/(n1·n2) by the rank-sum identity, so it reuses the
    * [[EventAnalytics6.q101MannWhitney]] merged-domain machinery and
    * stays a ratio of exact integers: AUC = (R2 − n1(n1+1)) / (2·n1·n2),
    * ties counted half (the standard ROC convention). */
  val q112Auc: Q = Q(
    "q112_auc",
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
      |  SELECT t, ct, cb,
      |    2 * (SUM(ct + cb) OVER (PARTITION BY t ORDER BY v4
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |         - (ct + cb)) + ct + cb + 1 AS rank2
      |  FROM dom),
      |s AS (
      |  SELECT t, SUM(ct)::BIGINT AS n1, SUM(cb)::BIGINT AS n2,
      |    SUM(CAST(ct AS HUGEINT) * rank2) AS r2
      |  FROM r GROUP BY t)
      |SELECT t AS event_type, n1, n2,
      |  CAST(r2 - CAST(n1 AS HUGEINT) * (n1 + 1) AS DOUBLE)
      |    / (2.0::DOUBLE * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS auc
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
    r.groupBy("t").agg(
      sum("ct").as("n1"), sum("cb").as("n2"),
      // r2 ~ 2n² per type — DECIMAL(38,0) ≡ HUGEINT so neither engine
      // wraps/raises past ~2e9 events per type (r07 ADVICE, q101 fix)
      sum(col("ct").cast(dec) * col("rank2")).as("r2"))
      .select(col("t").as("event_type"), col("n1"), col("n2"),
        ((col("r2") - col("n1").cast(dec) * (col("n1") + 1)).cast("double") /
          (lit(2.0) * col("n1").cast("double") * col("n2").cast("double")))
          .as("auc"))
      .orderBy("event_type")
  }

  /** ClickHouse `ORDER BY … WITH FILL … INTERPOLATE` analogue: the daily
    * per-type event series with missing days materialized — counts
    * zero-filled, the daily mean linearly interpolated between the
    * nearest present days (IGNORE NULLS carry windows on both sides of
    * each gap). The spine spans each type's own [min, max] day so no
    * edge extrapolation occurs; daily sums stay exact ×10⁴ BIGINTs and
    * the mean/interpolation is one final double tree mirrored in the
    * oracle.
    *
    * 100 TB shape: the spine is |types|·|days| rows — calendar-bounded,
    * not event-bounded — and the gap windows run per type over that
    * bounded spine, so the only corpus-sized work is the first hash agg. */
  val q113WithFill: Q = Q(
    "q113_with_fill",
    """WITH d AS (
      |  SELECT event_type AS t, CAST(ts AS DATE) AS day,
      |    COUNT(*)::BIGINT AS cnt,
      |    SUM(CAST(FLOOR(value * 10000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT))::BIGINT AS s4
      |  FROM events GROUP BY 1, 2),
      |rng AS (SELECT t, MIN(day) AS lo, MAX(day) AS hi FROM d GROUP BY 1),
      |spine AS (
      |  SELECT t, CAST(UNNEST(generate_series(CAST(lo AS TIMESTAMP),
      |    CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM rng),
      |j AS (
      |  SELECT spine.t, spine.day, d.cnt, d.s4,
      |    CASE WHEN d.cnt IS NOT NULL THEN
      |      CAST(d.s4 AS DOUBLE) / CAST(d.cnt AS DOUBLE) / 10000.0::DOUBLE
      |    END AS avg_present
      |  FROM spine LEFT JOIN d ON d.t = spine.t AND d.day = spine.day),
      |w AS (
      |  SELECT t, day, cnt, avg_present,
      |    LAST_VALUE(avg_present IGNORE NULLS) OVER wp AS pv,
      |    LAST_VALUE(CASE WHEN avg_present IS NOT NULL THEN day END
      |               IGNORE NULLS) OVER wp AS pd,
      |    FIRST_VALUE(avg_present IGNORE NULLS) OVER wf AS nv,
      |    FIRST_VALUE(CASE WHEN avg_present IS NOT NULL THEN day END
      |                IGNORE NULLS) OVER wf AS nd
      |  FROM j
      |  WINDOW
      |    wp AS (PARTITION BY t ORDER BY day
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |    wf AS (PARTITION BY t ORDER BY day
      |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT t AS event_type, day, COALESCE(cnt, 0)::BIGINT AS n_events,
      |  cnt IS NULL AS filled,
      |  CASE WHEN avg_present IS NOT NULL THEN avg_present
      |    ELSE pv + (nv - pv)
      |      * (CAST(DATEDIFF('day', pd, day) AS DOUBLE)
      |         / CAST(DATEDIFF('day', pd, nd) AS DOUBLE))
      |  END AS avg_value
      |FROM w
      |ORDER BY event_type, day""".stripMargin) { (s, d) =>
    val daily = events(s, d)
      .select(col("event_type").as("t"), col("ts").cast("date").as("day"),
        floor(col("value") * 10000.0 + 0.5).cast("long").as("v4"))
      .groupBy("t", "day")
      .agg(count(lit(1)).as("cnt"), sum("v4").as("s4"))
    val spine = daily.groupBy("t").agg(min("day").as("lo"), max("day").as("hi"))
      .select(col("t"),
        explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 DAY")))
          .as("day"))
    val j = spine.join(daily, Seq("t", "day"), "left")
      .withColumn("avg_present",
        when(col("cnt").isNotNull,
          col("s4").cast("double") / col("cnt").cast("double") / 10000.0))
    val wp = Window.partitionBy("t").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy("t").orderBy("day")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val presentDay = when(col("avg_present").isNotNull, col("day"))
    j.withColumn("pv", last("avg_present", ignoreNulls = true).over(wp))
      .withColumn("pd", last(presentDay, ignoreNulls = true).over(wp))
      .withColumn("nv", first("avg_present", ignoreNulls = true).over(wf))
      .withColumn("nd", first(presentDay, ignoreNulls = true).over(wf))
      .select(col("t").as("event_type"), col("day"),
        coalesce(col("cnt"), lit(0L)).as("n_events"),
        col("cnt").isNull.as("filled"),
        when(col("avg_present").isNotNull, col("avg_present"))
          .otherwise(col("pv") + (col("nv") - col("pv")) *
            (datediff(col("day"), col("pd")).cast("double") /
              datediff(col("nd"), col("pd")).cast("double")))
          .as("avg_value"))
      .orderBy("event_type", "day")
  }

  val all: Seq[Q] =
    Seq(q110TukeyOutliers, q111KsTest, q112Auc, q113WithFill)
}
