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

  /** ClickHouse-`sequenceMatch` analogue (the reference's provisioned
    * sink is ClickHouse — this is its signature behavioral-analytics
    * function): per user, does the event stream contain
    * view → click → purchase as a time-ordered subsequence? Existence
    * is decided by the greedy-earliest chain (t1 = first view,
    * t2 = first click after t1, t3 = first purchase after t2) — greedy
    * is complete for subsequence existence — and the span between t1
    * and t3 comes out alongside.
    *
    * 100 TB shape: three chained min-aggregations, each a hash agg on
    * user_id over a type-filtered scan plus a user-keyed join — the
    * q66 funnel skeleton generalized one step; no windows, no per-user
    * arrays, at most one shuffle per stage on the natural key. Time
    * math stays in exact µs BIGINTs; the only double is the span.
    */
  val q87SequenceMatch: Q = Q(
    "q87_sequence_match",
    """WITH v AS (
      |  SELECT user_id, MIN(ts) AS t1
      |  FROM events WHERE event_type = 'view' GROUP BY 1),
      |c AS (
      |  SELECT v.user_id, MIN(e.ts) AS t2
      |  FROM v JOIN events e ON e.user_id = v.user_id
      |    AND e.event_type = 'click' AND e.ts > v.t1
      |  GROUP BY 1),
      |p AS (
      |  SELECT c.user_id, MIN(e.ts) AS t3
      |  FROM c JOIN events e ON e.user_id = c.user_id
      |    AND e.event_type = 'purchase' AND e.ts > c.t2
      |  GROUP BY 1)
      |SELECT v.user_id, v.t1, c.t2, p.t3,
      |  p.t3 IS NOT NULL AS matched,
      |  CAST(EPOCH_US(p.t3) - EPOCH_US(v.t1) AS DOUBLE)
      |    / 3600000000.0 AS span_hours
      |FROM v LEFT JOIN c ON c.user_id = v.user_id
      |LEFT JOIN p ON p.user_id = v.user_id
      |ORDER BY v.user_id""".stripMargin) { (s, d) =>
    val ev = events(s, d)
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val c = v.join(ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts")), "user_id")
      .filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val p = c.join(ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts")), "user_id")
      .filter(col("ts") > col("t2"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    v.join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(col("user_id"), col("t1"), col("t2"), col("t3"),
        col("t3").isNotNull.as("matched"),
        ((unix_micros(col("t3")) - unix_micros(col("t1"))).cast("double")
          / 3600000000.0).as("span_hours"))
      .orderBy("user_id")
  }

  /** ClickHouse-`sequenceCount` analogue: the number of
    * NON-OVERLAPPING view → click → purchase occurrences per user,
    * counted by one greedy left-to-right scan of the time-ordered
    * stream (greedy maximizes the disjoint-occurrence count). The scan
    * state packs into ONE BIGINT — stage = st mod 4, completed count =
    * st div 4 — so the per-user fold is pure integer arithmetic that
    * both engines evaluate identically over the identically-ordered
    * array (ts, then event_id as the tie-break).
    *
    * 100 TB shape: one hash agg on user_id builds the per-user ordered
    * event array (bounded by per-user activity, the same boundedness
    * q34's fold relies on), then the fold is per-row map work. Users
    * with pathological event counts would route to the q79 session
    * splitter first; the fold itself is O(events-per-user).
    *
    * Oracle-engine note: DuckDB 1.0.0's LIST_REDUCE over GROUPED lists
    * returns a wrong fold for some groups (verified minimal repro: the
    * same list and the same lambda give st=25 when the query filters to
    * one user and st=23 inside the full GROUP BY — batch-boundary state
    * corruption; single-user, 20× repeated grouped runs, and a Python
    * replay of the extracted list all agree on 25). The oracle therefore
    * restates the scan as a recursive CTE over ROW_NUMBER-indexed
    * events — the same arithmetic with no lambdas anywhere.
    */
  val q88SequenceCount: Q = Q(
    "q88_sequence_count",
    """WITH RECURSIVE ev AS (
      |  SELECT user_id, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i
      |  FROM events),
      |n AS (SELECT user_id, COUNT(*)::BIGINT AS n_events FROM events GROUP BY 1),
      |scan AS (
      |  SELECT user_id, 0::BIGINT AS i, 0::BIGINT AS stage, 0::BIGINT AS cnt FROM n
      |  UNION ALL
      |  SELECT s.user_id, s.i + 1,
      |    CASE WHEN s.stage = 0 AND e.event_type = 'view' THEN 1::BIGINT
      |         WHEN s.stage = 1 AND e.event_type = 'click' THEN 2::BIGINT
      |         WHEN s.stage = 2 AND e.event_type = 'purchase' THEN 0::BIGINT
      |         ELSE s.stage END,
      |    s.cnt + CASE WHEN s.stage = 2 AND e.event_type = 'purchase'
      |                 THEN 1::BIGINT ELSE 0::BIGINT END
      |  FROM scan s JOIN ev e ON e.user_id = s.user_id AND e.i = s.i + 1)
      |SELECT n.user_id AS user_id, n.n_events, s.cnt AS seq_count
      |FROM n JOIN scan s ON s.user_id = n.user_id AND s.i = n.n_events
      |ORDER BY n.user_id""".stripMargin) { (s, d) =>
    val arr = events(s, d)
      .groupBy("user_id")
      .agg(array_sort(collect_list(
        struct(col("ts"), col("event_id"), col("event_type")))).as("ord"))
      .select(col("user_id"),
        transform(col("ord"), e => e.getField("event_type")).as("types"))
    arr.select(col("user_id"),
        size(col("types")).cast("bigint").as("n_events"),
        aggregate(col("types"), lit(0L), (st, t) =>
          when(st % 4 === 0 && t === "view", st + 1)
            .when(st % 4 === 1 && t === "click", st + 1)
            .when(st % 4 === 2 && t === "purchase", st + 2)
            .otherwise(st)).as("st"))
      .select(col("user_id"), col("n_events"),
        expr("st DIV 4").as("seq_count")) // integer div, exact both engines
      .orderBy("user_id")
  }

  val all: Seq[Q] = Seq(q79GapsIslands, q80RatioToReport,
    q81CumulativeDistinct, q82ModePerGroup, q87SequenceMatch,
    q88SequenceCount)
}
