package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.Tables._

/** Fifteenth event-analytics batch: distributional-shape and
  * calendar-structure readouts — the Gini concentration of per-user
  * spend, a Benford first-digit audit of order totals, winsorized
  * means (the robust-mean sibling of the q137 quantile kernel), and
  * day-of-week seasonal indices. Reference scope: the ClickHouse side
  * of `/root/reference/main.py:12-55` owns arbitrary OLAP SQL over the
  * replicated tables; these are the inequality/audit/seasonality
  * members of that surface. House discipline throughout: ×10⁴
  * fixed-point values, exact integer accumulation (DECIMAL(38,0) ≡
  * HUGEINT where products need headroom), floating point only in the
  * final division of exact integers.
  */
object EventAnalytics15 {
  private val dec = org.apache.spark.sql.types.DecimalType(38, 0)
  private def v4 = floor(col("value") * 10000.0 + 0.5).cast("long")

  /** Gini coefficient of per-user spend, per event type — the standard
    * inequality readout ("do 1% of users drive 90% of purchase
    * value?"). Exact closed form over the SPEND VALUE SPINE rather than
    * a per-user rank: for users sorted by spend x ascending,
    * G = Σᵢ(2i − n − 1)xᵢ / (n·Σx); a run of c users tied at spend s
    * with f users strictly below contributes s·c·(2f + c − n) — ties
    * collapse, so the computation runs entirely on (type, spend) rows.
    *
    * 100 TB shape: one user-keyed hash agg, one hash agg to the spine,
    * two windows over the spine (per-type, value-bounded — the q152
    * pattern), products s·(c·(2f+c−n)) in DECIMAL(38,0) with the
    * inner factor bounded by n² in BIGINT. No subject-level global
    * sort; doubles only in the final num/(n·tot) division. */
  val q153Gini: Q = Q(
    "q153_gini",
    """WITH v AS (
      |  SELECT event_type AS t, user_id,
      |    CAST(FLOOR(value * 10000.0 + 0.5) AS BIGINT) AS v4
      |  FROM events),
      |u AS (SELECT t, user_id, SUM(v4) AS s4 FROM v GROUP BY 1, 2),
      |sp AS (SELECT t, s4, COUNT(*)::BIGINT AS c FROM u GROUP BY 1, 2),
      |cw AS (
      |  SELECT t, s4, c,
      |    SUM(c) OVER (PARTITION BY t ORDER BY s4) - c AS f,
      |    SUM(c) OVER (PARTITION BY t) AS n,
      |    SUM(s4::HUGEINT * c) OVER (PARTITION BY t) AS tot
      |  FROM sp),
      |g AS (
      |  SELECT t, MAX(n) AS n, MAX(tot) AS tot,
      |    SUM(s4::HUGEINT * (c * (2 * f + c - n))) AS num
      |  FROM cw GROUP BY t)
      |SELECT t AS event_type, CAST(n AS BIGINT) AS n_users,
      |  CAST(tot AS DOUBLE) / CAST(n AS DOUBLE) / 10000.0::DOUBLE
      |    AS mean_spend,
      |  CAST(num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(tot AS DOUBLE))
      |    AS gini
      |FROM g ORDER BY event_type""".stripMargin) { (s, d) =>
    val u = events(s, d)
      .groupBy(col("event_type").as("t"), col("user_id"))
      .agg(sum(v4).as("s4"))
    val sp = u.groupBy("t", "s4").agg(count(lit(1)).as("c"))
    val wv = Window.partitionBy("t").orderBy("s4")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wt = Window.partitionBy("t")
    val cw = sp
      .withColumn("f", sum("c").over(wv) - col("c"))
      .withColumn("n", sum("c").over(wt))
      .withColumn("tot", sum(col("s4").cast(dec) * col("c")).over(wt))
    cw.groupBy("t")
      .agg(max("n").as("n"), max("tot").as("tot"),
        sum(col("s4").cast(dec) *
          (col("c") * (lit(2) * col("f") + col("c") - col("n")))).as("num"))
      .select(col("t").as("event_type"), col("n").cast("long").as("n_users"),
        (col("tot").cast("double") / col("n").cast("double") / 10000.0)
          .as("mean_spend"),
        (col("num").cast("double") /
          (col("n").cast("double") * col("tot").cast("double"))).as("gini"))
      .orderBy("event_type")
  }

  /** Benford first-digit audit of order totals, per order priority —
    * the classic anomaly screen for transaction amounts. The first
    * significant digit is extracted EXACTLY (first character of the
    * integer cents' decimal print — both engines print integers
    * identically; no log10, whose float edge at powers of ten would
    * diverge between libm builds). Output: per (priority, digit)
    * count and its exact permille share. */
  val q154Benford: Q = Q(
    "q154_benford",
    """WITH c AS (
      |  SELECT o_orderpriority AS pri,
      |    SUBSTRING(CAST(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)
      |      AS VARCHAR), 1, 1) AS d
      |  FROM orders),
      |g AS (SELECT pri, d, COUNT(*)::BIGINT AS cnt FROM c GROUP BY 1, 2),
      |t AS (SELECT pri, SUM(cnt) AS n FROM g GROUP BY 1)
      |SELECT g.pri, g.d AS digit, g.cnt,
      |  CAST((1000 * g.cnt) // t.n AS BIGINT) AS permille
      |FROM g JOIN t USING (pri)
      |ORDER BY pri, digit""".stripMargin) { (s, d) =>
    val cents = floor(col("o_totalprice") * 100.0 + 0.5).cast("long")
    val c = orders(s, d).select(col("o_orderpriority").as("pri"),
      substring(cents.cast("string"), 1, 1).as("d"))
    val g = c.groupBy("pri", "d").agg(count(lit(1)).as("cnt"))
    val t = g.groupBy("pri").agg(sum("cnt").as("n"))
    g.join(broadcast(t), "pri")
      .select(col("pri"), col("d").as("digit"), col("cnt"),
        expr("(1000 * cnt) div n").as("permille"))
      .orderBy("pri", "digit")
  }

  /** Winsorized mean per event type: values clipped to the exact
    * [p05, p95] boundary values before averaging — the robust mean a
    * metrics pipeline reports beside the raw one. Boundary ranks use
    * the q137 convention k = ⌈q·n/100⌉ = (q·n + 99) div 100, boundary
    * values are exact spine lookups (min v4 with cum ≥ k), and the
    * clipped sum is one more pass over the (type, value) spine — raw
    * rows are touched exactly once, in the spine hash agg. */
  val q155WinsorizedMean: Q = Q(
    "q155_winsorized_mean",
    """WITH v AS (
      |  SELECT event_type AS t,
      |    CAST(FLOOR(value * 10000.0 + 0.5) AS BIGINT) AS v4
      |  FROM events),
      |vc AS (SELECT t, v4, COUNT(*)::BIGINT AS c FROM v GROUP BY 1, 2),
      |cum AS (
      |  SELECT t, v4, c,
      |    SUM(c) OVER (PARTITION BY t ORDER BY v4) AS cm,
      |    SUM(c) OVER (PARTITION BY t) AS n
      |  FROM vc),
      |ks AS (
      |  SELECT t, MAX(n) AS n,
      |    (5 * MAX(n) + 99) // 100 AS k05,
      |    (95 * MAX(n) + 99) // 100 AS k95
      |  FROM cum GROUP BY t),
      |lo AS (SELECT c.t, MIN(c.v4) AS lo4 FROM cum c
      |       JOIN ks ON ks.t = c.t AND c.cm >= ks.k05 GROUP BY 1),
      |hi AS (SELECT c.t, MIN(c.v4) AS hi4 FROM cum c
      |       JOIN ks ON ks.t = c.t AND c.cm >= ks.k95 GROUP BY 1),
      |w AS (
      |  SELECT vc.t,
      |    SUM(GREATEST(lo.lo4, LEAST(hi.hi4, vc.v4))::HUGEINT * vc.c) AS sw
      |  FROM vc JOIN lo ON lo.t = vc.t JOIN hi ON hi.t = vc.t
      |  GROUP BY 1)
      |SELECT w.t AS event_type, CAST(ks.n AS BIGINT) AS n,
      |  CAST(lo.lo4 AS DOUBLE) / 10000.0::DOUBLE AS lo_v,
      |  CAST(hi.hi4 AS DOUBLE) / 10000.0::DOUBLE AS hi_v,
      |  CAST(w.sw AS DOUBLE) / CAST(ks.n AS DOUBLE) / 10000.0::DOUBLE
      |    AS mean_w
      |FROM w JOIN ks ON ks.t = w.t
      |  JOIN lo ON lo.t = w.t JOIN hi ON hi.t = w.t
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    val vc = events(s, d).select(col("event_type").as("t"), v4.as("v4"))
      .groupBy("t", "v4").agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // value-bounded; feeds spine windows + clip
    val wv = Window.partitionBy("t").orderBy("v4")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wt = Window.partitionBy("t")
    val cum = vc.withColumn("cm", sum("c").over(wv))
      .withColumn("n", sum("c").over(wt))
    val ks = cum.groupBy("t").agg(max("n").as("n"))
      .withColumn("k05", expr("(5 * n + 99) div 100"))
      .withColumn("k95", expr("(95 * n + 99) div 100"))
    val lo = cum.as("c")
      .join(broadcast(ks).as("k"),
        col("c.t") === col("k.t") && col("c.cm") >= col("k.k05"))
      .groupBy(col("c.t").as("t")).agg(min(col("c.v4")).as("lo4"))
    val hi = cum.as("c")
      .join(broadcast(ks).as("k"),
        col("c.t") === col("k.t") && col("c.cm") >= col("k.k95"))
      .groupBy(col("c.t").as("t")).agg(min(col("c.v4")).as("hi4"))
    val w = vc.join(broadcast(lo), "t").join(broadcast(hi), "t")
      .groupBy("t")
      .agg(first(col("lo4")).as("lo4"), first(col("hi4")).as("hi4"),
        sum(greatest(col("lo4"), least(col("hi4"), col("v4"))).cast(dec) *
          col("c")).as("sw"))
    w.join(broadcast(ks.select(col("t"), col("n"))), "t")
      .select(col("t").as("event_type"), col("n").cast("long").as("n"),
        (col("lo4").cast("double") / 10000.0).as("lo_v"),
        (col("hi4").cast("double") / 10000.0).as("hi_v"),
        (col("sw").cast("double") / col("n").cast("double") / 10000.0)
          .as("mean_w"))
      .orderBy("event_type")
  }

  /** Day-of-week seasonal index per event type: mean value on each
    * weekday relative to the type's overall mean, as the EXACT
    * integer permille (1000·sv_dow·cnt_all) div (cnt_dow·sv_all) — the
    * cross-multiplied form needs no intermediate means, so no floats
    * anywhere. Weekday convention pinned to Sunday = 0 on both engines
    * (Spark `dayofweek` is 1-based, DuckDB's 0-based). One hash agg +
    * a 7-row-per-type broadcast join at any scale. */
  val q156SeasonalDow: Q = Q(
    "q156_seasonal_dow",
    """WITH e AS (
      |  SELECT event_type AS t, dayofweek(ts) AS dow,
      |    CAST(FLOOR(value * 10000.0 + 0.5) AS BIGINT) AS v4
      |  FROM events),
      |g AS (SELECT t, dow, COUNT(*)::BIGINT AS cnt, SUM(v4) AS sv
      |      FROM e GROUP BY 1, 2),
      |a AS (SELECT t, SUM(cnt) AS cnt_all, SUM(sv) AS sv_all
      |      FROM g GROUP BY 1)
      |SELECT g.t AS event_type, CAST(g.dow AS BIGINT) AS dow, g.cnt,
      |  CAST((1000::HUGEINT * g.sv * a.cnt_all) // (g.cnt * a.sv_all)
      |    AS BIGINT) AS idx_permille
      |FROM g JOIN a USING (t)
      |ORDER BY event_type, dow""".stripMargin) { (s, d) =>
    val e = events(s, d).select(col("event_type").as("t"),
      (dayofweek(col("ts")) - 1).cast("long").as("dow"), v4.as("v4"))
    val g = e.groupBy("t", "dow")
      .agg(count(lit(1)).as("cnt"), sum("v4").as("sv"))
    val a = g.groupBy("t")
      .agg(sum("cnt").as("cnt_all"), sum("sv").as("sv_all"))
    g.join(broadcast(a), "t")
      .select(col("t").as("event_type"), col("dow"), col("cnt"),
        expr("""(CAST(1000 AS DECIMAL(38,0)) * sv * cnt_all)
                div (CAST(cnt AS DECIMAL(38,0)) * sv_all)""")
          .cast("long").as("idx_permille"))
      .orderBy("event_type", "dow")
  }

  /** Mann–Kendall monotone-trend test per event type, over the DAILY
    * mean-value series: S = Σ_{i<j} sign(m_j − m_i) and Kendall's
    * τ = S / (n(n−1)/2), reported as the exact permille. The daily
    * means are truncating integer quotients (both engines' div/`//`
    * truncate toward zero — the q147 engine fact), so the pairwise
    * comparison is integer-exact; the day spine is calendar-bounded
    * (≤ 31 rows per type at any corpus size), so the i<j self-join is
    * a constant-size cross product per type, NOT a corpus-scaling
    * join — raw rows are touched once, in the daily hash agg. */
  val q158MannKendall: Q = Q(
    "q158_mann_kendall",
    """WITH e AS (
      |  SELECT event_type AS t, EPOCH_US(ts) // 86400000000 AS dd,
      |    CAST(FLOOR(value * 10000.0 + 0.5) AS BIGINT) AS v4
      |  FROM events),
      |dm AS (
      |  SELECT t, dd, SUM(v4) // COUNT(*) AS m
      |  FROM e GROUP BY 1, 2),
      |pairs AS (
      |  SELECT a.t,
      |    CASE WHEN b.m > a.m THEN 1
      |         WHEN b.m < a.m THEN -1 ELSE 0 END AS sg
      |  FROM dm a JOIN dm b ON b.t = a.t AND b.dd > a.dd),
      |g AS (
      |  SELECT t, COUNT(*)::BIGINT AS n_pairs, SUM(sg)::BIGINT AS s
      |  FROM pairs GROUP BY 1)
      |SELECT t AS event_type, n_pairs, s,
      |  (1000 * s) // n_pairs AS tau_permille
      |FROM g ORDER BY event_type""".stripMargin) { (s, d) =>
    val e = events(s, d).select(col("event_type").as("t"),
      expr("unix_micros(ts) div 86400000000").as("dd"), v4.as("v4"))
    val dm = e.groupBy("t", "dd")
      .agg(expr("sum(v4) div count(*)").as("m"))
      .localCheckpoint(true) // ≤31 rows/type; both self-join sides
    val pairs = dm.as("a").join(dm.as("b"),
        col("b.t") === col("a.t") && col("b.dd") > col("a.dd"))
      .select(col("a.t").as("t"),
        when(col("b.m") > col("a.m"), 1L)
          .when(col("b.m") < col("a.m"), -1L).otherwise(0L).as("sg"))
    pairs.groupBy("t")
      .agg(count(lit(1)).as("n_pairs"), sum("sg").as("s"))
      .select(col("t").as("event_type"), col("n_pairs"), col("s"),
        expr("(1000 * s) div n_pairs").as("tau_permille"))
      .orderBy("event_type")
  }

  /** Theil–Sen robust trend slope per event type — the median of all
    * pairwise daily-mean slopes (m_j − m_i)/(d_j − d_i), the
    * outlier-immune alternative to least squares. Each slope is ONE
    * division of exact integers (correctly rounded identically on
    * both engines), the median is the lower-median element by exact
    * rank over (slope, day pair) — fully deterministic, no averaging
    * of two middle doubles. Same calendar-bounded pair spine as
    * [[q158MannKendall]]: ≤ C(31,2) slopes per type at any scale. */
  val q159TheilSen: Q = Q(
    "q159_theil_sen",
    """WITH e AS (
      |  SELECT event_type AS t, EPOCH_US(ts) // 86400000000 AS dd,
      |    CAST(FLOOR(value * 10000.0 + 0.5) AS BIGINT) AS v4
      |  FROM events),
      |dm AS (
      |  SELECT t, dd, SUM(v4) // COUNT(*) AS m
      |  FROM e GROUP BY 1, 2),
      |sl AS (
      |  SELECT a.t,
      |    CAST(b.m - a.m AS DOUBLE) / CAST(b.dd - a.dd AS DOUBLE)
      |      AS slope,
      |    a.dd AS di, b.dd AS dj
      |  FROM dm a JOIN dm b ON b.t = a.t AND b.dd > a.dd),
      |rk AS (
      |  SELECT t, slope,
      |    ROW_NUMBER() OVER (PARTITION BY t
      |      ORDER BY slope, di, dj) AS rn,
      |    COUNT(*) OVER (PARTITION BY t) AS n
      |  FROM sl)
      |SELECT t AS event_type, CAST(n AS BIGINT) AS n_slopes,
      |  slope AS median_slope
      |FROM rk WHERE rn = (n + 1) // 2
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    val e = events(s, d).select(col("event_type").as("t"),
      expr("unix_micros(ts) div 86400000000").as("dd"), v4.as("v4"))
    val dm = e.groupBy("t", "dd")
      .agg(expr("sum(v4) div count(*)").as("m"))
      .localCheckpoint(true)
    val sl = dm.as("a").join(dm.as("b"),
        col("b.t") === col("a.t") && col("b.dd") > col("a.dd"))
      .select(col("a.t").as("t"),
        ((col("b.m") - col("a.m")).cast("double") /
          (col("b.dd") - col("a.dd")).cast("double")).as("slope"),
        col("a.dd").as("di"), col("b.dd").as("dj"))
    val w = Window.partitionBy("t").orderBy("slope", "di", "dj")
    val wt = Window.partitionBy("t")
    sl.withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wt))
      .filter(col("rn") === expr("(n + 1) div 2"))
      .select(col("t").as("event_type"), col("n").cast("long").as("n_slopes"),
        col("slope").as("median_slope"))
      .orderBy("event_type")
  }

  val all: Seq[Q] = Seq(q153Gini, q154Benford, q155WinsorizedMean,
    q156SeasonalDow, q158MannKendall, q159TheilSen)
}
