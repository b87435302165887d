package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Q
import graft.Tables._

/** Twelfth event-analytics batch: ordered-sequence matching and
  * changepoint detection — the ClickHouse `sequenceCount` shape and a
  * CUSUM peak scan, both in exact arithmetic end-to-end.
  *
  * Reference surface: the ClickHouse sink side of the CDC pipeline
  * (`/root/reference/main.py:40-52` lands events into ClickHouse
  * tables whose published query surface includes the
  * sequence/changepoint family). */
object EventAnalytics12 {

  private val dec = DecimalType(38, 0)

  /** view→purchase adjacency counts per user — the `sequenceCount`
    * pattern over strictly consecutive events: order each user's
    * stream by (ts, event_id) and count positions whose event is
    * `view` and whose IMMEDIATE successor is `purchase`. The window is
    * user-partitioned (per-user streams stay session-sized at any
    * corpus scale), the count one hash agg. */
  val q132SequenceCount: Q = Q(
    "q132_sequence_count",
    """WITH o AS (
      |  SELECT user_id, event_type,
      |    LEAD(event_type) OVER (PARTITION BY user_id
      |                           ORDER BY ts, event_id) AS nxt
      |  FROM events)
      |SELECT user_id, COUNT(*)::BIGINT AS n_seq
      |FROM o WHERE event_type = 'view' AND nxt = 'purchase'
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events(s, d)
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .filter(col("event_type") === "view" && col("nxt") === "purchase")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_seq"))
      .orderBy("user_id")
  }

  /** CUSUM changepoint per event type: with v = value ×10⁴ (exact
    * BIGINT), the mean-free cumulative sum at position t is
    *   S'_t = n·Σ_{i≤t} v_i − t·Σ v_i
    * (the textbook S_t = Σ (v_i − mean) scaled by n — no division, so
    * every row is an EXACT integer in both engines). The reported
    * changepoint is the position of max |S'| (earliest on ties), with
    * the peak value and drift direction.
    *
    * 100 TB shape: the per-type prefix sums ride ONE
    * [[ScalableWindows.globalRunningSum]] pass over (event_type, ts,
    * event_id) — range-partitioned local windows plus a ≤`parts`-row
    * driver fold, never a corpus-sized single-partition window; the
    * per-type offsets are a 5-row broadcast. Sums accumulate in
    * DECIMAL(38,0) ≡ HUGEINT (n·prefix overflows BIGINT past ~10⁹
    * events per type); the OUTPUT peak is cast BIGINT, exact while
    * |S'| < 2⁶³ — at larger scales report in coarser units. */
  val q134CusumChangepoint: Q = Q(
    "q134_cusum_changepoint",
    """WITH v AS (
      |  SELECT event_type, ts, event_id,
      |    CAST(FLOOR(value * 10000.0 + 0.5) AS HUGEINT) AS v4
      |  FROM events),
      |tot AS (SELECT event_type, COUNT(*)::HUGEINT AS n, SUM(v4) AS sv
      |        FROM v GROUP BY 1),
      |pre AS (
      |  SELECT v.event_type, v.ts, v.event_id,
      |    ROW_NUMBER() OVER (PARTITION BY v.event_type
      |                       ORDER BY v.ts, v.event_id) AS t,
      |    SUM(v4) OVER (PARTITION BY v.event_type
      |                  ORDER BY v.ts, v.event_id
      |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS pv
      |  FROM v),
      |s AS (
      |  SELECT p.event_type, p.ts, p.t,
      |    tot.n * p.pv - CAST(p.t AS HUGEINT) * tot.sv AS sp
      |  FROM pre p JOIN tot ON tot.event_type = p.event_type),
      |r AS (
      |  SELECT event_type, ts AS change_ts, t AS pos,
      |    CAST(sp AS BIGINT) AS s_peak,
      |    CASE WHEN sp >= 0 THEN 1 ELSE -1 END AS direction,
      |    ROW_NUMBER() OVER (PARTITION BY event_type
      |                       ORDER BY ABS(sp) DESC, t ASC) AS rk
      |  FROM s)
      |SELECT event_type, change_ts, pos, s_peak, direction
      |FROM r WHERE rk = 1 ORDER BY event_type""".stripMargin) { (s, d) =>
    val v = events(s, d).select(
      col("event_type"), col("ts"), col("event_id"),
      floor(col("value") * 10000.0 + 0.5).cast(dec).as("v4"))
    val tot = v.groupBy("event_type")
      .agg(count(lit(1)).cast(dec).as("n"), sum(col("v4")).as("sv"))
    // one global two-pass running sum over (type, ts, id); within-type
    // prefixes recovered by subtracting the per-type exclusive offsets
    val g = ScalableWindows.globalRunningSum(
      v.withColumn("v4l", col("v4").cast("long")),
      Seq(col("event_type"), col("ts"), col("event_id")),
      col("v4l"), "grn", "gsum")
    val offW = org.apache.spark.sql.expressions.Window
      .orderBy("event_type")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    // ≤5-row relation: the unpartitioned window is bounded by the
    // event-type cardinality, not the corpus
    val offs = tot
      .withColumn("rnoff", coalesce(sum(col("n").cast("long")).over(offW), lit(0L)))
      .withColumn("sumoff", coalesce(sum(col("sv").cast("long")).over(offW), lit(0L)))
    val sp = g.join(broadcast(offs), "event_type")
      .withColumn("t", (col("grn") - col("rnoff")).cast(dec))
      .withColumn("pv", (col("gsum") - col("sumoff")).cast(dec))
      .withColumn("sp", col("n") * col("pv") - col("t") * col("sv"))
    sp.groupBy("event_type")
      .agg(max(struct(abs(col("sp")).as("a"),
        (-col("t")).as("negt"), col("sp").as("sp"),
        col("ts").as("ts"))).as("m"))
      .select(col("event_type"),
        col("m.ts").as("change_ts"),
        (-col("m.negt")).cast("long").as("pos"),
        col("m.sp").cast("long").as("s_peak"),
        when(col("m.sp") >= 0, 1).otherwise(-1).as("direction"))
      .orderBy("event_type")
  }

  val all: Seq[Q] = Seq(q132SequenceCount, q134CusumChangepoint)
}
