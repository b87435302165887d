package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.Tables._

/** Third batch of event-stream analytics — the two remaining
  * ClickHouse-signature behavioral functions (the reference's provisioned
  * sink is ClickHouse): `windowFunnel` (max funnel stage reached inside a
  * sliding window anchored at the chain's FIRST event) and
  * `exponentialMovingAverage` (per-entity EWMA smoothing). Both stay on
  * the natural user_id partitioning — window passes share one shuffle +
  * sort, folds are per-user-bounded — and all state arithmetic is exact
  * BIGINT, so the DuckDB oracles are bit-identical restatements. */
object EventAnalytics3 {

  /** Funnel window: all stages must land within 48 h of the anchoring
    * view. µs like every other events-table time constant. */
  private val FunnelWindowUs = 48L * 3600 * 1000000

  /** ClickHouse-`windowFunnel(48h)(ts, view, click, purchase)` analogue:
    * the max stage k such that some view → click → purchase prefix of
    * length k exists with every stage inside 48 h of the anchoring view.
    *
    * The O(n)-per-user greedy is expressed entirely with window
    * functions — no per-user arrays, no recursion: over the (ts,
    * event_id)-ordered stream, `a1` carries the latest view strictly
    * before the current row; a click reachable from a view within the
    * window anchors `a2` = the max such view timestamp over all preceding
    * clicks; a purchase completes stage 3 iff `a2` is within the window.
    * Greedy-max anchors are complete: if ANY valid chain (v, c, p)
    * exists, the latest qualifying view before c anchors a chain too, and
    * maxing anchors over clicks only ever moves the anchor later — never
    * out of the window. Both passes share one partitioning + ordering
    * (user_id; ts, event_id), so Catalyst plans ONE exchange + sort; the
    * final per-user agg collapses on the same key. At 100 TB that is a
    * single shuffle of the events scan — the same shape ClickHouse's
    * native aggregate achieves, with no driver-side anything.
    */
  val q89WindowFunnel: Q = Q(
    "q89_window_funnel",
    s"""WITH e AS (
       |  SELECT user_id, event_type, event_id, EPOCH_US(ts) AS t
       |  FROM events),
       |m1 AS (
       |  SELECT user_id, event_type, event_id, t,
       |    MAX(CASE WHEN event_type = 'view' THEN t END) OVER
       |      (PARTITION BY user_id ORDER BY t, event_id
       |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS a1
       |  FROM e),
       |m2 AS (
       |  SELECT user_id, event_type, event_id, t,
       |    CASE WHEN event_type = 'click' AND a1 IS NOT NULL
       |              AND t - a1 <= $FunnelWindowUs THEN a1 END AS anchor2
       |  FROM m1),
       |m3 AS (
       |  SELECT user_id, event_type, t,
       |    MAX(anchor2) OVER
       |      (PARTITION BY user_id ORDER BY t, event_id
       |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS a2,
       |    anchor2
       |  FROM m2)
       |SELECT user_id,
       |  MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
       |    + MAX(CASE WHEN anchor2 IS NOT NULL THEN 1 ELSE 0 END)
       |    + MAX(CASE WHEN event_type = 'purchase' AND a2 IS NOT NULL
       |               AND t - a2 <= $FunnelWindowUs THEN 1 ELSE 0 END)
       |    AS funnel_level,
       |  COUNT(*) AS n_events
       |FROM m3
       |GROUP BY user_id
       |ORDER BY user_id""".stripMargin) { (s, d) =>
    val ord = Window.partitionBy("user_id").orderBy(col("t"), col("event_id"))
    val prevRows = ord.rowsBetween(Window.unboundedPreceding, -1)
    val e = events(s, d).select(col("user_id"), col("event_type"),
      col("event_id"), unix_micros(col("ts")).as("t"))
    val m2 = e
      .withColumn("a1",
        max(when(col("event_type") === "view", col("t"))).over(prevRows))
      .withColumn("anchor2",
        when(col("event_type") === "click" && col("a1").isNotNull &&
          col("t") - col("a1") <= FunnelWindowUs, col("a1")))
    val m3 = m2.withColumn("a2", max(col("anchor2")).over(prevRows))
    m3.groupBy("user_id")
      .agg(
        (max(when(col("event_type") === "view", 1).otherwise(0)) +
          max(when(col("anchor2").isNotNull, 1).otherwise(0)) +
          max(when(col("event_type") === "purchase" && col("a2").isNotNull &&
            col("t") - col("a2") <= FunnelWindowUs, 1).otherwise(0)))
          .as("funnel_level"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  /** ClickHouse-`exponentialMovingAverage` analogue with α = 1/2 over
    * each user's time-ordered readings, in EXACT integer arithmetic:
    * values become ×10⁴ fixed-point BIGINTs (the q72 convention) and the
    * recurrence s ← ⌊(s + v)/2⌋ is a floor halving — both engines fold
    * the identical integer sequence, so the oracle is bit-exact with no
    * cross-row double accumulation anywhere. The one double division
    * happens once per user at the very end.
    *
    * 100 TB shape: ONE hash agg on user_id builds the time-ordered
    * per-user value array (bounded by per-user activity — the same
    * boundedness q34/q88 rely on; hyperactive keys route through the q79
    * session splitter first), then the fold is per-row map work. The
    * oracle restates the scan as a recursive CTE over ROW_NUMBER-indexed
    * events — q88 established that DuckDB's grouped LIST_REDUCE
    * miscomputes folds, so no lambdas on the oracle side. */
  val q90Ewma: Q = Q(
    "q90_ewma",
    """WITH RECURSIVE ev AS (
      |  SELECT user_id,
      |    CAST(FLOOR(value * 10000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS v4,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i
      |  FROM events),
      |n AS (SELECT user_id, COUNT(*)::BIGINT AS n_events FROM events GROUP BY 1),
      |scan AS (
      |  SELECT user_id, 0::BIGINT AS i, 0::BIGINT AS st, TRUE AS empty FROM n
      |  UNION ALL
      |  SELECT s.user_id, s.i + 1,
      |    CASE WHEN s.empty THEN e.v4
      |         ELSE (s.st + e.v4) // 2 END,
      |    FALSE
      |  FROM scan s JOIN ev e ON e.user_id = s.user_id AND e.i = s.i + 1)
      |SELECT n.user_id, n.n_events,
      |  CAST(s.st AS DOUBLE) / 10000.0::DOUBLE AS ewma
      |FROM n JOIN scan s ON s.user_id = n.user_id AND s.i = n.n_events
      |ORDER BY n.user_id""".stripMargin) { (s, d) =>
    val arr = events(s, d)
      .select(col("user_id"),
        struct(col("ts"), col("event_id"),
          floor(col("value") * 10000.0 + 0.5).cast("long").as("v4")).as("r"))
      .groupBy("user_id")
      .agg(array_sort(collect_list(col("r"))).as("ord"))
      .select(col("user_id"),
        transform(col("ord"), r => r.getField("v4")).as("vs"))
    arr.select(col("user_id"),
        size(col("vs")).cast("bigint").as("n_events"),
        // Long.MinValue flags "no value folded yet" (first reading seeds
        // the state); v4 is non-negative at every test SF but the floor
        // halving (pmod-corrected div) matches DuckDB's // on any sign
        aggregate(col("vs"), lit(Long.MinValue), (st, v) =>
          when(st === Long.MinValue, v)
            .otherwise(floor((st + v).cast("double") / 2.0).cast("long")))
          .as("st"))
      .select(col("user_id"), col("n_events"),
        (col("st").cast("double") / 10000.0).as("ewma"))
      .orderBy("user_id")
  }

  val all: Seq[Q] = Seq(q89WindowFunnel, q90Ewma)
}
