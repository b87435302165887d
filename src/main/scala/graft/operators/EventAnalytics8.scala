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
      |    SUM(ct * rank2)::BIGINT AS r2
      |  FROM r GROUP BY t)
      |SELECT t AS event_type, n1, n2,
      |  CAST(r2 - n1 * (n1 + 1) AS DOUBLE)
      |    / (2.0::DOUBLE * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS auc
      |FROM s
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    val cnt = events(s, d)
      .select(col("event_type").as("t"),
        floor(col("value") * 10000.0 + 0.5).cast("long").as("v4"))
      .groupBy("t", "v4").agg(count(lit(1)).as("c"))
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
      sum(col("ct") * col("rank2")).as("r2"))
      .select(col("t").as("event_type"), col("n1"), col("n2"),
        ((col("r2") - col("n1") * (col("n1") + 1)).cast("double") /
          (lit(2.0) * col("n1").cast("double") * col("n2").cast("double")))
          .as("auc"))
      .orderBy("event_type")
  }

  val all: Seq[Q] = Seq(q110TukeyOutliers, q111KsTest, q112Auc)
}
