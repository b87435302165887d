package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.Tables._

/** Fourth batch of event-stream analytics — ClickHouse-signature
  * aggregate combinators the provisioned sink exposes to its users
  * (`/root/reference/all.json:17-27` lands the CDC stream in ClickHouse;
  * these are the aggregations that sink's users run on it):
  * `uniqUpTo(N)`, `deltaSum`, `sumMap`, and `maxIntersections`.
  *
  * All four stay on bounded-state shapes: capped distincts collapse via
  * ordinary partial aggregation, the delta scan and the interval sweep
  * ride per-user windows (one shuffle + sort on the natural key), and
  * the map aggregation is two hash aggs. All state arithmetic is exact
  * BIGINT / DECIMAL, so every DuckDB oracle is a bit-exact restatement.
  */
object EventAnalytics4 {

  /** uniqUpTo caps: exact distinct counts saturate at N+1 — the
    * ClickHouse contract ("use when you only care whether the count
    * clears a threshold"; state is ≤ N+1 keys per group, so partial
    * aggregation stays bounded no matter the corpus). */
  private val UserCap = 50
  private val KCap    = 10

  /** ClickHouse-`uniqUpTo(N)(x)` analogue: per event type, the exact
    * distinct user count capped at N+1 and the distinct props.k count
    * capped at its own N+1. Declaratively this is
    * `LEAST(COUNT(DISTINCT x), N+1)` — Catalyst plans the standard
    * two-phase distinct aggregate (partial distinct on the map side, so
    * the shuffle carries ≤ |distinct| rows per group, and the cap is a
    * free scalar on top). The cap semantics — not the plan — are the
    * contract: a 1000-executor rollup can drop any distinct state past
    * N+1 keys and still answer exactly. */
  val q91UniqUpTo: Q = Q(
    "q91_uniq_up_to",
    s"""SELECT event_type,
       |  LEAST(COUNT(DISTINCT user_id), ${UserCap + 1})::BIGINT AS uniq_users_upto,
       |  LEAST(COUNT(DISTINCT CAST(JSON_EXTRACT_STRING(props, '$$.k') AS BIGINT)), ${KCap + 1})::BIGINT AS uniq_k_upto,
       |  COUNT(*) AS n_events
       |FROM events
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin) { (s, d) =>
    events(s, d)
      .select(col("event_type"), col("user_id"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k"))
      .groupBy("event_type")
      .agg(
        least(countDistinct(col("user_id")), lit(UserCap + 1L)).cast("bigint")
          .as("uniq_users_upto"),
        least(countDistinct(col("k")), lit(KCap + 1L)).cast("bigint")
          .as("uniq_k_upto"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type")
  }

  /** ClickHouse-`deltaSum` analogue: per user, the sum of POSITIVE
    * steps between consecutive readings in (ts, event_id) order — the
    * counter-reset-tolerant "total increase" aggregate (a monotone
    * counter that resets to 0 contributes each ramp once; dips are
    * ignored). Values fold as ×10⁴ fixed-point BIGINTs (the q72/q90
    * convention) so both engines sum identical integers; the one double
    * division happens per user at the end. One shuffle + sort on
    * user_id; lag and the final agg share it. */
  val q92DeltaSum: Q = Q(
    "q92_delta_sum",
    """WITH v AS (
      |  SELECT user_id,
      |    CAST(FLOOR(value * 10000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS v4,
      |    LAG(CAST(FLOOR(value * 10000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT))
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pv4
      |  FROM events)
      |SELECT user_id,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CASE WHEN pv4 IS NOT NULL AND v4 > pv4
      |                THEN v4 - pv4 ELSE 0 END) AS DOUBLE) / 10000.0::DOUBLE
      |    AS delta_sum
      |FROM v
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        floor(col("value") * 10000.0 + 0.5).cast("long").as("v4"))
      .withColumn("pv4", lag(col("v4"), 1).over(w))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        (sum(when(col("pv4").isNotNull && col("v4") > col("pv4"),
          col("v4") - col("pv4")).otherwise(0L)).cast("double") / 10000.0)
          .as("delta_sum"))
      .orderBy("user_id")
  }

  /** ClickHouse-`sumMap` analogue: per user, the event_type-keyed map
    * of (occurrence count, exact value sum), emitted as the
    * key-sorted parallel arrays ClickHouse returns — serialized to
    * canonical comma-joined strings (the q24_array_agg precedent: the
    * driver's pandas-based comparator cannot sort raw array columns).
    * Sums stay DECIMAL(28,4) through the string cast so both engines
    * print the identical fixed-scale form. Two hash aggs — the first
    * collapses to |users|·|types| rows with exact DECIMAL sums
    * (partial map-side combine does the heavy lifting), the second
    * packs each user's ≤ |types| entries into arrays. Per-user state
    * is bounded by the event-type vocabulary, never by event count. */
  val q93SumMap: Q = Q(
    "q93_sum_map",
    """WITH per AS (
      |  SELECT user_id, event_type,
      |    COUNT(*)::BIGINT AS cnt,
      |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS vs
      |  FROM events GROUP BY 1, 2)
      |SELECT user_id,
      |  ARRAY_TO_STRING(ARRAY_AGG(event_type ORDER BY event_type), ',') AS keys,
      |  ARRAY_TO_STRING(ARRAY_AGG(CAST(cnt AS VARCHAR) ORDER BY event_type), ',')
      |    AS counts,
      |  ARRAY_TO_STRING(ARRAY_AGG(CAST(vs AS VARCHAR) ORDER BY event_type), ',')
      |    AS sums
      |FROM per
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    val per = events(s, d)
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("cnt"),
        sum(val4(col("value"))).cast("decimal(28,4)").as("vs"))
    per
      .groupBy("user_id")
      .agg(sort_array(collect_list(
        struct(col("event_type"), col("cnt"), col("vs")))).as("es"))
      .select(col("user_id"),
        array_join(transform(col("es"), _.getField("event_type")), ",")
          .as("keys"),
        array_join(transform(col("es"), _.getField("cnt").cast("string")), ",")
          .as("counts"),
        array_join(transform(col("es"), _.getField("vs").cast("string")), ",")
          .as("sums"))
      .orderBy("user_id")
  }

  /** maxIntersections sweep: each event opens a half-open usage
    * interval [ts, ts + (1 + props.k mod 60) h) — a deterministic
    * duration from the payload (hour-scale so overlap actually occurs
    * at every SF's event cadence), so both engines derive identical
    * intervals. */
  private val DurBaseUs = 3600L * 1000000L

  /** ClickHouse-`maxIntersections(start, end)` analogue: per user, the
    * peak number of concurrently open intervals. The classic sweep —
    * +1 at each start, −1 at each end, peak running sum — expressed as
    * one generator + two aggregations + one per-user window:
    * endpoint deltas collapse by (user, pos, delta) first (the running
    * sum over the collapsed rows is order-deterministic because the
    * remaining sort key is unique per user), ends sort before starts at
    * equal positions (delta −1 < +1), which is exactly the half-open
    * [s, e) contract — touching intervals do not overlap. All passes
    * share the user_id shuffle; per-user state is activity-bounded, the
    * same boundedness q89/q90 rely on. */
  val q94MaxIntersections: Q = Q(
    "q94_max_intersections",
    s"""WITH iv AS (
       |  SELECT user_id, EPOCH_US(ts) AS st,
       |    EPOCH_US(ts) + $DurBaseUs *
       |      (1 + CAST(JSON_EXTRACT_STRING(props, '$$.k') AS BIGINT) % 60) AS en
       |  FROM events),
       |pts AS (
       |  SELECT user_id, st AS pos, 1::BIGINT AS delta FROM iv
       |  UNION ALL
       |  SELECT user_id, en AS pos, -1::BIGINT AS delta FROM iv),
       |g AS (
       |  SELECT user_id, pos, delta, SUM(delta) AS d
       |  FROM pts GROUP BY 1, 2, 3),
       |run AS (
       |  SELECT user_id, d,
       |    SUM(d) OVER (PARTITION BY user_id ORDER BY pos, delta
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r
       |  FROM g)
       |SELECT user_id,
       |  CAST(MAX(r) AS BIGINT) AS max_concurrent,
       |  CAST(SUM(CASE WHEN d > 0 THEN d ELSE 0 END) AS BIGINT) AS n_intervals
       |FROM run
       |GROUP BY user_id
       |ORDER BY user_id""".stripMargin) { (s, d) =>
    val iv = events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("st"),
        (unix_micros(col("ts")) + lit(DurBaseUs) *
          (lit(1L) + get_json_object(col("props"), "$.k").cast("bigint") % 60))
          .as("en"))
    val pts = iv.select(col("user_id"),
      explode(array(
        struct(col("st").as("pos"), lit(1L).as("delta")),
        struct(col("en").as("pos"), lit(-1L).as("delta")))).as("p"))
      .select(col("user_id"), col("p.pos"), col("p.delta"))
    val g = pts.groupBy("user_id", "pos", "delta")
      .agg(sum(col("delta")).as("d"))
    val w = Window.partitionBy("user_id").orderBy(col("pos"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    g.withColumn("r", sum(col("d")).over(w))
      .groupBy("user_id")
      .agg(
        max(col("r")).as("max_concurrent"),
        sum(when(col("d") > 0, col("d")).otherwise(0L)).cast("bigint")
          .as("n_intervals"))
      .orderBy("user_id")
  }

  /** ClickHouse-`boundingRatio` analogue: per user, the end-to-end rate
    * of change — (last value − first value) / (last ts − first ts) in
    * value-units per hour, endpoints taken in the engine's (ts,
    * event_id) total order. The rate is ONE double division of exact
    * BIGINTs: Δv4 · 360 000 / Δt_µs (= (Δv4/10⁴) / (Δt/3.6·10⁹)), so
    * both engines emit the identical double; single-reading users get
    * NULL. One hash agg on user_id — min_by/max_by keep the endpoint
    * state per user at two structs. */
  val q95BoundingRatio: Q = Q(
    "q95_bounding_ratio",
    """WITH v AS (
      |  SELECT user_id, EPOCH_US(ts) AS t, event_id,
      |    CAST(FLOOR(value * 10000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS v4,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY user_id) AS n
      |  FROM events),
      |f AS (SELECT user_id, t AS t0, v4 AS v0, n FROM v WHERE rn = 1),
      |l AS (SELECT user_id, t AS t1, v4 AS v1 FROM v WHERE rn = n)
      |SELECT f.user_id, CAST(f.n AS BIGINT) AS n_events,
      |  CASE WHEN l.t1 > f.t0 THEN
      |    CAST((l.v1 - f.v0) * 360000 AS DOUBLE) / CAST(l.t1 - f.t0 AS DOUBLE)
      |  END AS rate_per_hour
      |FROM f JOIN l ON l.user_id = f.user_id
      |ORDER BY f.user_id""".stripMargin) { (s, d) =>
    events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("t"), col("event_id"),
        floor(col("value") * 10000.0 + 0.5).cast("long").as("v4"))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        min_by(col("v4"), struct(col("t"), col("event_id"))).as("v0"),
        max_by(col("v4"), struct(col("t"), col("event_id"))).as("v1"),
        min(col("t")).as("t0"),
        max(col("t")).as("t1"))
      .select(col("user_id"), col("n_events"),
        when(col("t1") > col("t0"),
          ((col("v1") - col("v0")) * 360000L).cast("double") /
            (col("t1") - col("t0")).cast("double")).as("rate_per_hour"))
      .orderBy("user_id")
  }

  /** ClickHouse-`intervalLengthSum` analogue: per user, the length of
    * the UNION of the q94 usage intervals (overlaps counted once) —
    * computed from the same collapsed ±1 endpoint sweep: a segment
    * [pos, next_pos) is covered iff the running sum is positive at its
    * left edge, so covered time = Σ (next_pos − pos) over positive-count
    * segments. Shares q94's single user_id shuffle; all arithmetic is
    * exact µs BIGINTs. */
  val q96IntervalLengthSum: Q = Q(
    "q96_interval_length_sum",
    s"""WITH iv AS (
       |  SELECT user_id, EPOCH_US(ts) AS st,
       |    EPOCH_US(ts) + $DurBaseUs *
       |      (1 + CAST(JSON_EXTRACT_STRING(props, '$$.k') AS BIGINT) % 60) AS en
       |  FROM events),
       |pts AS (
       |  SELECT user_id, st AS pos, 1::BIGINT AS delta FROM iv
       |  UNION ALL
       |  SELECT user_id, en AS pos, -1::BIGINT AS delta FROM iv),
       |g AS (
       |  SELECT user_id, pos, SUM(delta) AS d,
       |    SUM(CASE WHEN delta > 0 THEN delta ELSE 0 END) AS starts
       |  FROM pts GROUP BY 1, 2),
       |run AS (
       |  SELECT user_id, pos, d, starts,
       |    SUM(d) OVER (PARTITION BY user_id ORDER BY pos
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r,
       |    LEAD(pos) OVER (PARTITION BY user_id ORDER BY pos) AS next_pos
       |  FROM g)
       |SELECT user_id,
       |  CAST(SUM(CASE WHEN r > 0 AND next_pos IS NOT NULL
       |                THEN next_pos - pos ELSE 0 END) AS BIGINT) AS covered_us,
       |  CAST(SUM(starts) AS BIGINT) AS n_intervals
       |FROM run
       |GROUP BY user_id
       |ORDER BY user_id""".stripMargin) { (s, d) =>
    val iv = events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("st"),
        (unix_micros(col("ts")) + lit(DurBaseUs) *
          (lit(1L) + get_json_object(col("props"), "$.k").cast("bigint") % 60))
          .as("en"))
    val pts = iv.select(col("user_id"),
      explode(array(
        struct(col("st").as("pos"), lit(1L).as("delta")),
        struct(col("en").as("pos"), lit(-1L).as("delta")))).as("p"))
      .select(col("user_id"), col("p.pos"), col("p.delta"))
    // collapse to one row per (user, pos): net delta for the sweep plus
    // raw start count (the interval census) — the remaining sort key is
    // unique per user, so the running sum is deterministic
    val g = pts.groupBy("user_id", "pos").agg(
      sum(col("delta")).as("d"),
      sum(when(col("delta") > 0, col("delta")).otherwise(0L)).as("starts"))
    val w = Window.partitionBy("user_id").orderBy(col("pos"))
    val frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    g.withColumn("r", sum(col("d")).over(frame))
      .withColumn("next_pos", lead(col("pos"), 1).over(w))
      .groupBy("user_id")
      .agg(
        sum(when(col("r") > 0 && col("next_pos").isNotNull,
          col("next_pos") - col("pos")).otherwise(0L)).cast("bigint")
          .as("covered_us"),
        sum(col("starts")).cast("bigint").as("n_intervals"))
      .orderBy("user_id")
  }

  /** Hour index anchor: 2024-01-01T00:00Z in hours-since-epoch, so the
    * regression x values stay small integers (|x| ≤ a few thousand on
    * any test window) and every power/cross sum is exactly
    * representable. */
  private val AnchorHours = 473352L

  /** ClickHouse-`simpleLinearRegression` (+ Pearson r) analogue: per
    * event type, the OLS fit of value against event time (value-units
    * per hour) with the correlation coefficient — trend detection over
    * the stream, the standard "is this metric drifting" query.
    *
    * Exactness: x = whole hours since a FIXED anchor (small integers),
    * y = ×10⁴ fixed-point BIGINT. The five power sums are exact
    * (BIGINT; Σy² as a 128-bit-class sum — Spark DECIMAL(38,0) ≡
    * DuckDB HUGEINT, both exact integer arithmetic), the normal-
    * equation terms n·Σxy − Σx·Σy and n·Σx² − (Σx)² are formed in the
    * same 128-bit-class arithmetic, and only then do doubles appear —
    * identical expression trees on both sides, so slope/intercept/r
    * are bit-identical. One hash agg; nothing shuffles twice. */
  val q97LinearRegression: Q = Q(
    "q97_linear_regression",
    s"""WITH v AS (
       |  SELECT event_type,
       |    EPOCH_US(ts) // 3600000000 - $AnchorHours AS x,
       |    CAST(FLOOR(value * 10000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS y
       |  FROM events),
       |s AS (
       |  SELECT event_type, COUNT(*)::BIGINT AS n,
       |    SUM(x)::HUGEINT AS sx, SUM(y)::HUGEINT AS sy,
       |    SUM(x * x)::HUGEINT AS sxx,
       |    SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
       |    SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy
       |  FROM v GROUP BY event_type),
       |t AS (
       |  SELECT event_type, n, sx, sy,
       |    n * sxy - sx * sy AS num,
       |    n * sxx - sx * sx AS denx,
       |    n * syy - sy * sy AS deny
       |  FROM s)
       |SELECT event_type, n,
       |  CAST(num AS DOUBLE) / CAST(denx AS DOUBLE) / 10000.0::DOUBLE
       |    AS slope_per_hour,
       |  (CAST(sy AS DOUBLE) / 10000.0::DOUBLE
       |    - (CAST(num AS DOUBLE) / CAST(denx AS DOUBLE) / 10000.0::DOUBLE)
       |      * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept,
       |  CAST(num AS DOUBLE) / SQRT(CAST(denx AS DOUBLE) * CAST(deny AS DOUBLE))
       |    AS corr
       |FROM t
       |ORDER BY event_type""".stripMargin) { (s, d) =>
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val v = events(s, d)
      .withColumn("x",
        expr("unix_micros(ts) div 3600000000") - AnchorHours)
      .select(col("event_type"), col("x"),
        floor(col("value") * 10000.0 + 0.5).cast("long").as("y"))
    val agg = v.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum(col("x")).cast(dec).as("sx"),
      sum(col("y")).cast(dec).as("sy"),
      sum(col("x") * col("x")).cast(dec).as("sxx"),
      // y-bearing squares/cross terms go 128-bit-class BEFORE the sum —
      // Σy² alone passes 2^63 within the tested scale range
      sum((col("x") * col("y")).cast(dec)).as("sxy"),
      sum((col("y") * col("y")).cast(dec)).as("syy"))
    val t = agg.select(col("event_type"), col("n"), col("sx"), col("sy"),
      (col("n").cast(dec) * col("sxy") - col("sx") * col("sy")).as("num"),
      (col("n").cast(dec) * col("sxx") - col("sx") * col("sx")).as("denx"),
      (col("n").cast(dec) * col("syy") - col("sy") * col("sy")).as("deny"))
    t.select(col("event_type"), col("n"),
        (col("num").cast("double") / col("denx").cast("double") / 10000.0)
          .as("slope_per_hour"),
        ((col("sy").cast("double") / 10000.0 -
          (col("num").cast("double") / col("denx").cast("double") / 10000.0) *
            col("sx").cast("double")) / col("n").cast("double"))
          .as("intercept"),
        (col("num").cast("double") /
          sqrt(col("denx").cast("double") * col("deny").cast("double")))
          .as("corr"))
      .orderBy("event_type")
  }

  val all: Seq[Q] = Seq(q91UniqUpTo, q92DeltaSum, q93SumMap,
    q94MaxIntersections, q95BoundingRatio, q96IntervalLengthSum,
    q97LinearRegression)
}
