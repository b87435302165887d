package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.Tables._

/** Event-stream analytics (the ClickHouse-style product-analytics
  * surface): conversion funnels and retention cohorts over the events
  * table. Both are two hash aggregations plus one equi-join on user_id —
  * at 100 TB the events scan dominates and nothing is ever joined
  * all-pairs; timestamps stay exact µs BIGINTs until the final division. */
object EventAnalytics {

  /** Signup → purchase conversion funnel: per signed-up user, whether the
    * first purchase landed within 24 h of the first signup and how long
    * it took. Time math is exact µs integer subtraction; the single
    * double division at the end is mirrored in the oracle. */
  val q66Funnel: Q = Q(
    "q66_funnel",
    """WITH s AS (
      |  SELECT user_id, MIN(ts) AS signup_ts
      |  FROM events WHERE event_type = 'signup' GROUP BY 1),
      |p AS (
      |  SELECT s.user_id, MIN(e.ts) AS purchase_ts
      |  FROM s JOIN events e ON e.user_id = s.user_id
      |    AND e.event_type = 'purchase'
      |    AND e.ts >= s.signup_ts
      |    AND e.ts <= s.signup_ts + INTERVAL 24 HOUR
      |  GROUP BY 1)
      |SELECT s.user_id, s.signup_ts,
      |  p.purchase_ts IS NOT NULL AS converted,
      |  CAST(EPOCH_US(p.purchase_ts) - EPOCH_US(s.signup_ts) AS DOUBLE)
      |    / 3600000000.0 AS hours_to_purchase
      |FROM s LEFT JOIN p ON p.user_id = s.user_id
      |ORDER BY s.user_id""".stripMargin) { (s, d) =>
    val ev = events(s, d)
    val sg = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("signup_ts"))
    val pu = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"))
    val p = sg.join(pu, Seq("user_id"))
      .filter(col("pts") >= col("signup_ts") &&
        col("pts") <= col("signup_ts") + expr("INTERVAL 24 HOURS"))
      .groupBy("user_id").agg(min("pts").as("purchase_ts"))
    sg.join(p, Seq("user_id"), "left")
      .select(col("user_id"), col("signup_ts"),
        col("purchase_ts").isNotNull.as("converted"),
        ((unix_micros(col("purchase_ts")) - unix_micros(col("signup_ts")))
          .cast("double") / 3600000000.0).as("hours_to_purchase"))
      .orderBy("user_id")
  }

  /** Retention cohorts: users grouped by first-signup ISO week, counted
    * as active in each subsequent week offset. Offsets are exact integer
    * day arithmetic (both engines truncate weeks to ISO Monday). */
  val q67Retention: Q = Q(
    "q67_retention",
    """WITH s AS (
      |  SELECT user_id, MIN(ts) AS first_signup
      |  FROM events WHERE event_type = 'signup' GROUP BY 1),
      |base AS (
      |  SELECT user_id,
      |    CAST(DATE_TRUNC('week', CAST(first_signup AS DATE)) AS DATE) AS cohort_week
      |  FROM s),
      |act AS (
      |  SELECT DISTINCT e.user_id, b.cohort_week,
      |    CAST(FLOOR(DATEDIFF('day', b.cohort_week, CAST(e.ts AS DATE)) / 7.0) AS BIGINT) AS week_offset
      |  FROM events e JOIN base b ON b.user_id = e.user_id
      |  WHERE CAST(e.ts AS DATE) >= b.cohort_week)
      |SELECT cohort_week, week_offset, COUNT(DISTINCT user_id) AS n_active
      |FROM act GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val ev = events(s, d)
    val base = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("first_signup"))
      .select(col("user_id"),
        date_trunc("week", col("first_signup").cast("date")).cast("date")
          .as("cohort_week"))
    ev.select(col("user_id"), col("ts").cast("date").as("day"))
      .join(base, Seq("user_id"))
      .filter(col("day") >= col("cohort_week"))
      .select(col("user_id"), col("cohort_week"),
        floor(datediff(col("day"), col("cohort_week")) / 7.0)
          .cast("bigint").as("week_offset"))
      .distinct()
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct("user_id").as("n_active"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Event-type transition matrix (path analysis): per user, each event
    * paired with the next one in time via a window lead; transitions
    * counted corpus-wide. The tie-break on event_id makes the sequence
    * total, so both engines see identical successor pairs. One window
    * (partitioned by user — parallel) plus one hash aggregation. */
  val q71Transitions: Q = Q(
    "q71_transitions",
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |    LEAD(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS next_type
      |  FROM events)
      |SELECT event_type, next_type, COUNT(*) AS n
      |FROM seq
      |WHERE next_type IS NOT NULL
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events(s, d)
      .select(col("user_id"), col("event_type"),
        lead(col("event_type"), 1).over(w).as("next_type"))
      .filter(col("next_type").isNotNull)
      .groupBy("event_type", "next_type")
      .agg(count(lit(1)).as("n"))
      .orderBy("event_type", "next_type")
  }

  /** Time-weighted average (monitoring/finance shape): each reading is
    * weighted by how long it was current (ms until the user's next
    * event; the last reading carries no duration). All accumulation is
    * pure BIGINT fixed-point: values (≤4 decimals) become exact ×10⁴
    * integers via floor(x·10⁴+0.5), durations are integer-divided to ms,
    * and the weighted sum stays under 2^63 — the only floating steps are
    * two single BIGINT→double casts and two divisions at the very end.
    * (A DECIMAL formulation was 1 ulp off: DuckDB casts a >2^53-scaled
    * decimal to double via int128→double→÷10⁴ — two roundings — while
    * Spark converts the exact value once.) One window + one hash agg. */
  val q72TimeWeighted: Q = Q(
    "q72_time_weighted",
    """WITH seq AS (
      |  SELECT user_id, value, EPOCH_US(ts) AS t,
      |    LEAD(EPOCH_US(ts)) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS t_next
      |  FROM events),
      |w AS (
      |  SELECT user_id,
      |    CAST(FLOOR(value * 10000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS v4,
      |    (t_next - t) // 1000 AS dur_ms
      |  FROM seq WHERE t_next IS NOT NULL)
      |SELECT user_id,
      |  COUNT(*) AS n_intervals,
      |  CAST(SUM(dur_ms) AS BIGINT) AS total_ms,
      |  (CAST(CAST(SUM(v4 * dur_ms) AS BIGINT) AS DOUBLE) / 10000.0::DOUBLE)
      |    / CAST(CAST(SUM(dur_ms) AS BIGINT) AS DOUBLE) AS twa
      |FROM w
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val seq = events(s, d)
      .select(col("user_id"), col("value"), unix_micros(col("ts")).as("t"),
        lead(unix_micros(col("ts")), 1).over(win).as("t_next"))
      .filter(col("t_next").isNotNull)
      .select(col("user_id"),
        floor(col("value") * 10000.0 + 0.5).cast("long").as("v4"),
        expr("(t_next - t) div 1000").as("dur_ms"))
    seq.groupBy("user_id")
      .agg(count(lit(1)).as("n_intervals"),
        sum("dur_ms").as("total_ms"),
        ((sum(col("v4") * col("dur_ms")).cast("double") / 10000.0) /
          sum("dur_ms").cast("double")).as("twa"))
      .orderBy("user_id")
  }

  /** Hopping (sliding) time windows — the overlapping-window batch shape
    * of ST4: every event lands in 900s/300s = 3 windows, aggregated per
    * (window start, event type). Spark's `window()` generator aligns
    * starts to the epoch; the oracle derives the same 3 starts per event
    * with integer arithmetic. Value sums stay in the dsum-safe decimal
    * range. */
  val q73HoppingWindows: Q = Q(
    "q73_hopping_windows",
    """WITH e AS (
      |  SELECT event_type, value, EPOCH_US(ts) // 1000000 AS t_s
      |  FROM events),
      |x AS (
      |  SELECT event_type, value,
      |    ((t_s // 300) - UNNEST([0, 1, 2])) * 300 AS start_s
      |  FROM e)
      |SELECT MAKE_TIMESTAMP(start_s * 1000000) AS w_start, event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_val
      |FROM x
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin) { (s, d) =>
    events(s, d)
      .groupBy(window(col("ts"), "15 minutes", "5 minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(val4(col("value"))).as("sum_val"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_val"))
      .orderBy("w_start", "event_type")
  }

  val all: Seq[Q] = Seq(q66Funnel, q67Retention, q71Transitions,
    q72TimeWeighted, q73HoppingWindows)
}
