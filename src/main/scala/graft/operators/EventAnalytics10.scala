package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Q
import graft.Tables._

/** Tenth event-analytics batch — the product-analytics reporting trio:
  * cohort lifetime-value curves, the hour×weekday activity heatmap,
  * and DAU/WAU/MAU stickiness. All three are one corpus-sized hash agg
  * to a calendar- or (cohort, offset)-bounded grid; money/value sums
  * stay ×10⁴ BIGINTs until final mirrored double trees. */
object EventAnalytics10 {

  private val dec = DecimalType(38, 0)

  /** Cohort LTV: users cohorted by first-signup ISO week; per cohort
    * and week offset the purchase-value total and the cumulative
    * per-user LTV (cumulative sum over offsets of exact ×10⁴ sums,
    * divided once by cohort size). The running sum is over the
    * (cohort, offset) grid — calendar-bounded, so the window is NOT
    * corpus-sized. */
  val q123CohortLtv: Q = Q(
    "q123_cohort_ltv",
    """WITH s AS (
      |  SELECT user_id, MIN(ts) AS first_signup
      |  FROM events WHERE event_type = 'signup' GROUP BY 1),
      |base AS (
      |  SELECT user_id,
      |    CAST(DATE_TRUNC('week', CAST(first_signup AS DATE)) AS DATE)
      |      AS cohort_week
      |  FROM s),
      |cs AS (SELECT cohort_week, COUNT(*)::BIGINT AS cohort_size
      |       FROM base GROUP BY 1),
      |p AS (
      |  SELECT b.cohort_week,
      |    CAST(FLOOR(DATEDIFF('day', b.cohort_week, CAST(e.ts AS DATE))
      |      / 7.0) AS BIGINT) AS week_offset,
      |    SUM(CAST(FLOOR(e.value * 10000.0::DOUBLE + 0.5::DOUBLE)
      |      AS BIGINT))::BIGINT AS v4
      |  FROM events e JOIN base b ON b.user_id = e.user_id
      |  WHERE e.event_type = 'purchase'
      |    AND CAST(e.ts AS DATE) >= b.cohort_week
      |  GROUP BY 1, 2)
      |SELECT p.cohort_week, p.week_offset, cs.cohort_size,
      |  CAST(p.v4 AS DOUBLE) / 10000.0::DOUBLE AS period_value,
      |  CAST(SUM(p.v4) OVER (PARTITION BY p.cohort_week
      |      ORDER BY p.week_offset
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    / 10000.0::DOUBLE / CAST(cs.cohort_size AS DOUBLE)
      |    AS cum_ltv_per_user
      |FROM p JOIN cs ON cs.cohort_week = p.cohort_week
      |ORDER BY p.cohort_week, p.week_offset""".stripMargin) { (s, d) =>
    val ev = events(s, d)
    val base = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("first_signup"))
      .select(col("user_id"),
        date_trunc("week", col("first_signup").cast("date")).cast("date")
          .as("cohort_week"))
    val cs = base.groupBy("cohort_week")
      .agg(count(lit(1)).as("cohort_size"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(base, "user_id")
      .filter(col("ts").cast("date") >= col("cohort_week"))
      .groupBy(col("cohort_week"),
        floor(datediff(col("ts").cast("date"), col("cohort_week")) / 7.0)
          .cast("long").as("week_offset"))
      .agg(sum(floor(col("value") * 10000.0 + 0.5).cast("long")).as("v4"))
    val wCum = Window.partitionBy("cohort_week").orderBy("week_offset")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p.join(broadcast(cs), "cohort_week")
      .select(col("cohort_week"), col("week_offset"), col("cohort_size"),
        (col("v4").cast("double") / 10000.0).as("period_value"),
        (sum("v4").over(wCum).cast("double") / 10000.0 /
          col("cohort_size").cast("double")).as("cum_ltv_per_user"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Hour-of-day × ISO-weekday activity heatmap with per-cell share of
    * total — the 168-cell usage fingerprint. Weekday is ISO (1 = Mon)
    * on both engines via Spark's weekday()+1. */
  val q124ActivityHeatmap: Q = Q(
    "q124_activity_heatmap",
    """WITH g AS (
      |  SELECT ISODOW(CAST(ts AS DATE))::BIGINT AS dow,
      |    EXTRACT(HOUR FROM ts)::BIGINT AS hour,
      |    COUNT(*)::BIGINT AS n,
      |    COUNT(DISTINCT user_id)::BIGINT AS n_users
      |  FROM events GROUP BY 1, 2)
      |SELECT dow, hour, n, n_users,
      |  CAST(n AS DOUBLE)
      |    / CAST(SUM(n) OVER () AS DOUBLE) AS share
      |FROM g
      |ORDER BY dow, hour""".stripMargin) { (s, d) =>
    val g = events(s, d)
      .groupBy((weekday(col("ts").cast("date")) + 1).cast("long").as("dow"),
        hour(col("ts")).cast("long").as("hour"))
      .agg(count(lit(1)).as("n"), countDistinct("user_id").as("n_users"))
    g.withColumn("share",
        col("n").cast("double") /
          sum("n").over(Window.partitionBy()).cast("double"))
      .select("dow", "hour", "n", "n_users", "share")
      .orderBy("dow", "hour")
  }

  /** DAU/WAU/MAU stickiness: distinct actives per day, per trailing
    * 7-day window, and per trailing 28-day window, plus the DAU/WAU
    * and DAU/MAU ratios. The trailing windows come from the EXPLODE
    * pattern — each (day, user) activity contributes itself to the k
    * following target days, then one distinct count per target day —
    * all equi-keyed shuffles (a range-condition spine join would plan
    * a nested-loop over the corpus-sized activity grid); target days
    * are clipped to the observed day spine. */
  val q125Stickiness: Q = Q(
    "q125_stickiness",
    """WITH du AS (
      |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      |days AS (SELECT DISTINCT day FROM du),
      |dau AS (SELECT day, COUNT(*)::BIGINT AS dau FROM du GROUP BY 1),
      |wau AS (
      |  SELECT t.day, COUNT(DISTINCT t.user_id)::BIGINT AS wau FROM (
      |    SELECT DISTINCT u.day + k.k * INTERVAL 1 DAY AS day, u.user_id
      |    FROM du u, UNNEST(RANGE(0, 7)) k(k)) t
      |  JOIN days ON days.day = t.day
      |  GROUP BY 1),
      |mau AS (
      |  SELECT t.day, COUNT(DISTINCT t.user_id)::BIGINT AS mau FROM (
      |    SELECT DISTINCT u.day + k.k * INTERVAL 1 DAY AS day, u.user_id
      |    FROM du u, UNNEST(RANGE(0, 28)) k(k)) t
      |  JOIN days ON days.day = t.day
      |  GROUP BY 1)
      |SELECT dau.day, dau.dau, wau.wau, mau.mau,
      |  CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE) AS dau_wau,
      |  CAST(dau.dau AS DOUBLE) / CAST(mau.mau AS DOUBLE) AS dau_mau
      |FROM dau JOIN wau ON wau.day = dau.day
      |         JOIN mau ON mau.day = dau.day
      |ORDER BY dau.day""".stripMargin) { (s, d) =>
    val du = events(s, d)
      .select(col("ts").cast("date").as("day"), col("user_id"))
      .distinct()
      .localCheckpoint()
    val days = du.select("day").distinct()
    val dau = du.groupBy("day").agg(count(lit(1)).as("dau"))
    def trailing(n: Int, out: String) = du
      .select(explode(sequence(lit(0), lit(n - 1))).as("k"),
        col("day"), col("user_id"))
      .select(expr("date_add(day, k)").as("day"), col("user_id"))
      .distinct()
      .join(days, "day")
      .groupBy("day")
      .agg(countDistinct("user_id").as(out))
    dau
      .join(trailing(7, "wau"), "day")
      .join(trailing(28, "mau"), "day")
      .select(col("day"), col("dau"), col("wau"), col("mau"),
        (col("dau").cast("double") / col("wau").cast("double"))
          .as("dau_wau"),
        (col("dau").cast("double") / col("mau").cast("double"))
          .as("dau_mau"))
      .orderBy("day")
  }

  val all: Seq[Q] = Seq(q123CohortLtv, q124ActivityHeatmap, q125Stickiness)
}
