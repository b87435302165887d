package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.Tables._

/** Second batch of event-stream analytics: sessionization by inactivity
  * gap (the batch shape of ST4's session windows), percent-of-total
  * reporting, cumulative-distinct growth curves, and explicit-tie-break
  * per-group modes. Everything shuffles at most once on its natural key;
  * time arithmetic stays in exact µs BIGINTs. */
object EventAnalytics2 {

  /** Gaps-and-islands sessionization: a new session starts after >30 min
    * of inactivity. Both window passes (LAG to mark breaks, running SUM
    * to number sessions) partition by user_id — one shuffle feeds both,
    * Catalyst reuses the sort. The classic alternative (self-join on
    * time ranges) is quadratic per user; this is linear.
    */
  val q79GapsIslands: Q = Q(
    "q79_gaps_islands",
    """WITH marked AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN LAG(ts) OVER w IS NULL
      |           OR EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT user_id, ts,
      |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_no
      |  FROM marked)
      |SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
      |  MIN(ts) AS session_start, MAX(ts) AS session_end,
      |  COUNT(*) AS n_events
      |FROM sess
      |GROUP BY user_id, session_no
      |ORDER BY user_id, session_no""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapUs = 1800000000L // 30 min in µs
    events(s, d)
      .withColumn("__prev", lag(col("ts"), 1).over(w))
      .withColumn("brk",
        when(col("__prev").isNull ||
          unix_micros(col("ts")) - unix_micros(col("__prev")) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_no", sum("brk").over(w))
      .groupBy("user_id", "session_no")
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id", "session_no")
  }

  /** Percent-of-total (RATIO_TO_REPORT): each nation's share of global
    * revenue. Sums stay exact DECIMAL through the window total; the single
    * share division is the only float op, mirrored verbatim in the
    * oracle. The window total is over the 25-row aggregate, not the fact
    * table — the 100 TB scan collapses before any window runs. */
  val q80RatioToReport: Q = Q(
    "q80_ratio_to_report",
    """WITH per_nation AS (
      |  SELECT n.n_name AS nation,
      |    SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders o
      |  JOIN customer c ON c.c_custkey = o.o_custkey
      |  JOIN nation n ON n.n_nationkey = c.c_nationkey
      |  GROUP BY 1)
      |SELECT nation, CAST(rev AS DOUBLE) AS revenue,
      |  CAST(rev AS DOUBLE) / CAST(SUM(rev) OVER () AS DOUBLE) AS share
      |FROM per_nation
      |ORDER BY nation""".stripMargin) { (s, d) =>
    val perNation = orders(s, d)
      .join(customer(s, d), col("c_custkey") === col("o_custkey"))
      .join(broadcast(nation(s, d)), col("n_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(sum(money(col("o_totalprice"))).as("rev"))
    perNation.select(col("nation"),
        col("rev").cast("double").as("revenue"),
        (col("rev").cast("double") /
          sum("rev").over(Window.partitionBy()).cast("double")).as("share"))
      .orderBy("nation")
  }

  /** Cumulative-distinct growth: new users per day and the running
    * distinct-user count — the standard audience-growth curve. Running
    * COUNT(DISTINCT) rewritten as first-touch attribution (MIN date per
    * user, then a cumulative sum over ~30 day rows): the distinct shuffle
    * happens once on user_id; the window runs over days, not events. */
  val q81CumulativeDistinct: Q = Q(
    "q81_cumulative_distinct",
    """WITH first_day AS (
      |  SELECT user_id, MIN(CAST(ts AS DATE)) AS day FROM events GROUP BY 1),
      |per_day AS (
      |  SELECT day, COUNT(*) AS new_users FROM first_day GROUP BY 1)
      |SELECT day, new_users,
      |  CAST(SUM(new_users) OVER (ORDER BY day) AS BIGINT) AS cum_users
      |FROM per_day
      |ORDER BY day""".stripMargin) { (s, d) =>
    val perDay = events(s, d)
      .groupBy("user_id").agg(min(col("ts").cast("date")).as("day"))
      .groupBy("day").agg(count(lit(1)).as("new_users"))
    perDay.select(col("day"), col("new_users"),
        sum("new_users").over(Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("bigint").as("cum_users"))
      .orderBy("day")
  }

  /** Per-group exact mode with an EXPLICIT deterministic tie-break
    * (count DESC, then value ASC) — engines' built-in mode() leave ties
    * unspecified, so portable modes must spell the ordering out. Count +
    * one window over the (user, type) aggregate: the heavy table never
    * sees a window. */
  val q82ModePerGroup: Q = Q(
    "q82_mode_per_group",
    """SELECT user_id, event_type AS mode_type, n AS mode_n FROM (
      |  SELECT user_id, event_type, n,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n DESC, event_type) AS rn
      |  FROM (SELECT user_id, event_type, COUNT(*) AS n
      |        FROM events GROUP BY 1, 2))
      |WHERE rn = 1
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    val counts = events(s, d)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("n").desc, col("event_type"))
    counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("mode_type"),
        col("n").as("mode_n"))
      .orderBy("user_id")
  }

  val all: Seq[Q] = Seq(q79GapsIslands, q80RatioToReport,
    q81CumulativeDistinct, q82ModePerGroup)
}
