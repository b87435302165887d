package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Q
import graft.Tables._

/** Ninth event-analytics batch — time-series statistics over the
  * zero-filled daily series (ClickHouse `seriesPeriodDetectFFT` /
  * `seriesDecomposeSTL` / `seriesOutliersDetectTukey` neighborhood):
  * the autocorrelation function with dominant-period pick, robust
  * MAD-z outliers, and a moving-average seasonal decomposition.
  *
  * Shared 100 TB shape: ONE corpus-sized hash agg to (type, day) or
  * (type, value) cells; everything after runs on the calendar- or
  * value-cardinality-bounded domain. Sums of ×10⁴ fixed-point values
  * and their squares stay exact in DECIMAL(38,0); doubles appear only
  * in final mirrored trees. */
object EventAnalytics9 {

  private val dec = DecimalType(38, 0)

  /** Daily ×10⁴ totals per type with missing days zero-filled over each
    * type's own [min, max] span — the shared input of q118/q120. */
  private def dailySpine(s: org.apache.spark.sql.SparkSession, d: String) = {
    val daily = events(s, d)
      .select(col("event_type").as("t"), col("ts").cast("date").as("day"),
        floor(col("value") * 10000.0 + 0.5).cast("long").as("v4"))
      .groupBy("t", "day").agg(sum("v4").as("s4"))
    daily.groupBy("t").agg(min("day").as("lo"), max("day").as("hi"))
      .select(col("t"),
        explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 DAY")))
          .as("day"))
      .join(daily, Seq("t", "day"), "left")
      .select(col("t"), col("day"), coalesce(col("s4"), lit(0L)).as("s4"))
  }

  private val DailySpineSql =
    """d AS (
      |  SELECT event_type AS t, CAST(ts AS DATE) AS day,
      |    SUM(CAST(FLOOR(value * 10000.0::DOUBLE + 0.5::DOUBLE)
      |      AS BIGINT))::BIGINT AS s4
      |  FROM events GROUP BY 1, 2),
      |rng AS (SELECT t, MIN(day) AS lo, MAX(day) AS hi FROM d GROUP BY 1),
      |spine AS (
      |  SELECT rng.t, CAST(UNNEST(generate_series(CAST(lo AS TIMESTAMP),
      |    CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM rng),
      |z AS (
      |  SELECT spine.t, spine.day, COALESCE(d.s4, 0)::BIGINT AS s4
      |  FROM spine LEFT JOIN d ON d.t = spine.t AND d.day = spine.day)""".stripMargin

  /** Autocorrelation of the daily total at lags 1–14 per event type,
    * plus the dominant period (the smallest lag attaining the maximum
    * ACF — the `seriesPeriodDetectFFT` stand-in: the ACF peak IS the
    * period estimate, computed exactly instead of via FFT). Pearson r
    * at each lag from exact decimal sums over lag-joined day pairs;
    * one double formula at the end.
    *
    * Oracle-side conversion hazard (r10, found by the FIRST sf1 oracle
    * sweep): DuckDB's direct HUGEINT→DOUBLE cast is NOT correctly
    * rounded — it computes upper·2⁶⁴ + lower in floats, off by 1 ulp on
    * ~0.6% of integers beyond 2⁵³ (measured: 226390760955107000000 →
    * …0702e20 instead of …07e20), while Spark's DECIMAL(38,0)→double
    * (BigInteger.doubleValue) rounds correctly. This query's daily-sum
    * squares reach ~10²⁵ at sf1, so the oracle routes every big moment
    * through CAST(CAST(x AS VARCHAR) AS DOUBLE) — strtod IS correctly
    * rounded (verified over 3000 random 54–100-bit integers: 19/3000
    * direct-cast mismatches, 0 via varchar). Same values at the gate
    * SFs (< 2⁵³ there), so this only changes sf1+ behavior. */
  val q118Autocorr: Q = Q(
    "q118_autocorr",
    s"""WITH $DailySpineSql,
      |k(k) AS (SELECT UNNEST(generate_series(1, 14))),
      |p AS (
      |  SELECT a.t, k.k,
      |    COUNT(*)::BIGINT AS n,
      |    SUM(CAST(a.s4 AS HUGEINT))::HUGEINT AS sx,
      |    SUM(CAST(b.s4 AS HUGEINT))::HUGEINT AS sy,
      |    SUM(CAST(a.s4 AS HUGEINT) * CAST(a.s4 AS HUGEINT))::HUGEINT AS sxx,
      |    SUM(CAST(b.s4 AS HUGEINT) * CAST(b.s4 AS HUGEINT))::HUGEINT AS syy,
      |    SUM(CAST(a.s4 AS HUGEINT) * CAST(b.s4 AS HUGEINT))::HUGEINT AS sxy
      |  FROM z a CROSS JOIN k
      |  JOIN z b ON b.t = a.t AND b.day = a.day + k.k * INTERVAL 1 DAY
      |  GROUP BY 1, 2),
      |r AS (
      |  SELECT t, k, n,
      |    (CAST(n AS DOUBLE) * CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
      |      - CAST(CAST(sx AS VARCHAR) AS DOUBLE)
      |        * CAST(CAST(sy AS VARCHAR) AS DOUBLE))
      |    / (SQRT(CAST(n AS DOUBLE) * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
      |            - CAST(CAST(sx AS VARCHAR) AS DOUBLE)
      |              * CAST(CAST(sx AS VARCHAR) AS DOUBLE))
      |       * SQRT(CAST(n AS DOUBLE) * CAST(CAST(syy AS VARCHAR) AS DOUBLE)
      |              - CAST(CAST(sy AS VARCHAR) AS DOUBLE)
      |                * CAST(CAST(sy AS VARCHAR) AS DOUBLE))) AS acf
      |  FROM p WHERE n >= 3)
      |SELECT t AS event_type, k AS lag, n AS n_pairs, acf,
      |  k = MIN(CASE WHEN acf = mx THEN k END)
      |        OVER (PARTITION BY t) AS is_peak
      |FROM (SELECT *, MAX(acf) OVER (PARTITION BY t) AS mx FROM r)
      |ORDER BY event_type, lag""".stripMargin) { (s, d) =>
    import s.implicits._
    val z = dailySpine(s, d)
    val k = broadcast((1 to 14).toDF("k"))
    val b = z.select(col("t"), col("day").as("bday"), col("s4").as("bs4"))
    val p = z.crossJoin(k)
      .withColumn("bday", date_add(col("day"), col("k")))
      .join(b, Seq("t", "bday"))
      .groupBy("t", "k").agg(
        count(lit(1)).as("n"),
        sum(col("s4").cast(dec)).as("sx"),
        sum(col("bs4").cast(dec)).as("sy"),
        sum(col("s4").cast(dec) * col("s4").cast(dec)).as("sxx"),
        sum(col("bs4").cast(dec) * col("bs4").cast(dec)).as("syy"),
        sum(col("s4").cast(dec) * col("bs4").cast(dec)).as("sxy"))
      .filter(col("n") >= 3)
    val nD = col("n").cast("double")
    val acf = (nD * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")) /
      (sqrt(nD * col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double")) *
        sqrt(nD * col("syy").cast("double") -
          col("sy").cast("double") * col("sy").cast("double")))
    val wT = Window.partitionBy("t")
    p.withColumn("acf", acf)
      .withColumn("mx", max("acf").over(wT))
      .withColumn("peak_k",
        min(when(col("acf") === col("mx"), col("k"))).over(wT))
      .select(col("t").as("event_type"), col("k").cast("long").as("lag"),
        col("n").as("n_pairs"), col("acf"),
        (col("k") === col("peak_k")).as("is_peak"))
      .orderBy("event_type", "lag")
  }

  /** Robust outlier profile via the modified z-score (Iglewicz–Hoaglin):
    * per type, the lower-selection median and the median absolute
    * deviation on the ×10⁴ domain, and the count of events with
    * 0.6745·|x−med|/MAD > 3.5 — cross-multiplied to the exact integer
    * test 6745·|x−med| > 35000·MAD (scale cancels, no division, and
    * MAD = 0 degenerates gracefully to "any deviation is an outlier"). */
  val q119MadOutliers: Q = Q(
    "q119_mad_outliers",
    """WITH cnt AS (
      |  SELECT event_type AS t,
      |    CAST(FLOOR(value * 10000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS v4,
      |    COUNT(*)::BIGINT AS c
      |  FROM events GROUP BY 1, 2),
      |med AS (
      |  SELECT t, MIN(CASE WHEN 2 * cu >= n THEN v4 END) AS med, MAX(n) AS n
      |  FROM (
      |    SELECT t, v4, c,
      |      SUM(c) OVER (PARTITION BY t ORDER BY v4
      |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |        AS cu,
      |      SUM(c) OVER (PARTITION BY t) AS n
      |    FROM cnt)
      |  GROUP BY t),
      |dev AS (
      |  SELECT cnt.t, ABS(cnt.v4 - med.med) AS dv, SUM(cnt.c)::BIGINT AS c
      |  FROM cnt JOIN med ON med.t = cnt.t GROUP BY 1, 2),
      |mad AS (
      |  SELECT t, MIN(CASE WHEN 2 * cu >= n THEN dv END) AS mad
      |  FROM (
      |    SELECT t, dv, c,
      |      SUM(c) OVER (PARTITION BY t ORDER BY dv
      |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |        AS cu,
      |      SUM(c) OVER (PARTITION BY t) AS n
      |    FROM dev)
      |  GROUP BY t)
      |SELECT med.t AS event_type, med.n::BIGINT AS n,
      |  CAST(med.med AS DOUBLE) / 10000.0::DOUBLE AS median,
      |  CAST(mad.mad AS DOUBLE) / 10000.0::DOUBLE AS mad,
      |  SUM(CASE WHEN 6745 * ABS(cnt.v4 - med.med) > 35000 * mad.mad
      |      THEN cnt.c ELSE 0 END)::BIGINT AS n_outliers
      |FROM cnt JOIN med ON med.t = cnt.t JOIN mad ON mad.t = cnt.t
      |GROUP BY 1, 2, 3, 4
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    val cnt = events(s, d)
      .select(col("event_type").as("t"),
        floor(col("value") * 10000.0 + 0.5).cast("long").as("v4"))
      .groupBy("t", "v4").agg(count(lit(1)).as("c"))
      // r16: the (t, v4) value spine feeds THREE consumers (med, dev,
      // the final outlier count) — without materialization the static
      // plan carried 8 copies of the events scan; the spine is already
      // the relation the query's per-type windows assume is far smaller
      // than the corpus, so one checkpoint replaces 5 redundant scans
      .localCheckpoint(true)
    val wCum = Window.partitionBy("t").orderBy("v4")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("t")
    val med = cnt
      .withColumn("cu", sum("c").over(wCum))
      .withColumn("n", sum("c").over(wAll))
      .groupBy("t").agg(
        min(when(lit(2L) * col("cu") >= col("n"), col("v4"))).as("med"),
        max("n").as("n"))
    val dev = cnt.join(broadcast(med), "t")
      .groupBy(col("t"), abs(col("v4") - col("med")).as("dv"))
      .agg(sum("c").as("c"))
    val wDev = Window.partitionBy("t").orderBy("dv")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mad = dev
      .withColumn("cu", sum("c").over(wDev))
      .withColumn("n", sum("c").over(wAll))
      .groupBy("t").agg(
        min(when(lit(2L) * col("cu") >= col("n"), col("dv"))).as("mad"))
    cnt.join(broadcast(med), "t").join(broadcast(mad), "t")
      .groupBy("t", "n", "med", "mad")
      .agg(sum(when(
        lit(6745L) * abs(col("v4") - col("med")) >
          lit(35000L) * col("mad"), col("c")).otherwise(0L))
        .as("n_outliers"))
      .select(col("t").as("event_type"), col("n"),
        (col("med").cast("double") / 10000.0).as("median"),
        (col("mad").cast("double") / 10000.0).as("mad"),
        col("n_outliers"))
      .orderBy("event_type")
  }

  /** `seriesDecomposeSTL`-lite: the zero-filled daily total split into
    * trend (centered 7-day moving average, only where the full window
    * exists), day-of-week seasonal (mean over weeks of 7·detrended —
    * kept as exact integers scaled ×7 until the final division), and
    * residual = raw − trend − seasonal as one mirrored double tree. */
  val q120SeriesDecompose: Q = Q(
    "q120_series_decompose",
    s"""WITH $DailySpineSql,
      |ma AS (
      |  SELECT t, day, s4,
      |    SUM(s4) OVER w7 AS m7, COUNT(*) OVER w7 AS c7
      |  FROM z
      |  WINDOW w7 AS (PARTITION BY t ORDER BY day
      |                ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      |dt AS (
      |  SELECT t, day, s4,
      |    CASE WHEN c7 = 7 THEN m7 END AS m7,
      |    CASE WHEN c7 = 7 THEN 7 * s4 - m7 END AS d7,
      |    ISODOW(day) - 1 AS dow
      |  FROM ma),
      |se AS (
      |  SELECT t, dow, SUM(CAST(d7 AS HUGEINT))::HUGEINT AS sd7,
      |    COUNT(d7)::BIGINT AS cd
      |  FROM dt WHERE d7 IS NOT NULL GROUP BY 1, 2)
      |SELECT dt.t AS event_type, dt.day, dt.dow::BIGINT AS dow,
      |  CAST(dt.s4 AS DOUBLE) / 10000.0::DOUBLE AS raw,
      |  CAST(dt.m7 AS DOUBLE) / 7.0::DOUBLE / 10000.0::DOUBLE AS trend,
      |  CAST(se.sd7 AS DOUBLE)
      |    / (7.0::DOUBLE * CAST(se.cd AS DOUBLE)) / 10000.0::DOUBLE
      |    AS seasonal,
      |  CAST(dt.s4 AS DOUBLE) / 10000.0::DOUBLE
      |    - CAST(dt.m7 AS DOUBLE) / 7.0::DOUBLE / 10000.0::DOUBLE
      |    - CAST(se.sd7 AS DOUBLE)
      |      / (7.0::DOUBLE * CAST(se.cd AS DOUBLE)) / 10000.0::DOUBLE
      |    AS residual
      |FROM dt JOIN se ON se.t = dt.t AND se.dow = dt.dow
      |ORDER BY event_type, day""".stripMargin) { (s, d) =>
    val z = dailySpine(s, d)
    val w7 = Window.partitionBy("t").orderBy("day").rowsBetween(-3, 3)
    val dt = z
      .withColumn("m7a", sum("s4").over(w7))
      .withColumn("c7", count(lit(1)).over(w7))
      .select(col("t"), col("day"), col("s4"),
        when(col("c7") === 7, col("m7a")).as("m7"),
        when(col("c7") === 7, lit(7L) * col("s4") - col("m7a")).as("d7"),
        (weekday(col("day"))).as("dow"))
    val se = dt.filter(col("d7").isNotNull)
      .groupBy("t", "dow")
      .agg(sum(col("d7").cast(dec)).as("sd7"), count("d7").as("cd"))
    val raw = col("s4").cast("double") / 10000.0
    val trend = col("m7").cast("double") / 7.0 / 10000.0
    val seasonal = col("sd7").cast("double") /
      (lit(7.0) * col("cd").cast("double")) / 10000.0
    dt.join(broadcast(se), Seq("t", "dow"))
      .select(col("t").as("event_type"), col("day"),
        col("dow").cast("long").as("dow"),
        raw.as("raw"), trend.as("trend"), seasonal.as("seasonal"),
        (raw - trend - seasonal).as("residual"))
      .orderBy("event_type", "day")
  }

  val all: Seq[Q] = Seq(q118Autocorr, q119MadOutliers, q120SeriesDecompose)
}
