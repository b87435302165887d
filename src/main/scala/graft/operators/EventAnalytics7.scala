package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Q
import graft.Tables._

/** Seventh batch of event-stream analytics — the monitoring/AB-test
  * corner of the ClickHouse function surface (`proportionsZTest`,
  * `cramersVBiasCorrected`, and a CUSUM change-point scan): the checks
  * an operator runs on the landed CDC stream before trusting a dashboard
  * trend or a segmentation split.
  *
  * Exactness contracts as in [[EventAnalytics5]]/[[EventAnalytics6]]:
  * all accumulation is integer (BIGINT / DECIMAL(38,0) ≡ HUGEINT),
  * argmax ties break on explicit secondary keys, cross-cell float sums
  * run as sequential folds over sorted bounded arrays, and doubles
  * appear only in final expression trees mirrored op-for-op in the
  * DuckDB oracle. */
object EventAnalytics7 {

  private val dec = DecimalType(38, 0)

  /** CUSUM change-point scan: for each event type, the day where the
    * cumulative deviation of daily value totals from their mean peaks —
    * the classic "when did this metric's level shift" detector run
    * directly on the landed stream.
    *
    * With daily fixed-point sums s_j and S = Σs_j over D days, the
    * statistic C_i = Σ_{j≤i} (D·s_j − S) is EXACT integer arithmetic
    * (DECIMAL(38,0) ≡ HUGEINT; note Σ_j (D·s_j − S) = 0, so C is a
    * proper bridge). The reported peak is max |C_i| rescaled by 1/(D·10⁴)
    * back to value units; the change point is the earliest day attaining
    * it.
    *
    * 100 TB shape: ONE corpus-sized hash agg to (type, day) — everything
    * after runs on ≤ |types|·|days| rows (windows over per-type day
    * axes, top-1 via WindowGroupLimit). */
  val q107CusumChangepoint: Q = Q(
    "q107_cusum_changepoint",
    """WITH daily AS (
      |  SELECT event_type AS t, CAST(ts AS DATE) AS day,
      |    SUM(CAST(FLOOR(value * 10000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT))
      |      ::BIGINT AS s
      |  FROM events GROUP BY 1, 2),
      |tot AS (
      |  SELECT t, SUM(s)::BIGINT AS stot, COUNT(*)::BIGINT AS d
      |  FROM daily GROUP BY t),
      |c AS (
      |  SELECT daily.t, daily.day, tot.d,
      |    SUM(CAST(tot.d AS HUGEINT) * daily.s - tot.stot)
      |      OVER (PARTITION BY daily.t ORDER BY daily.day
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cu
      |  FROM daily JOIN tot ON tot.t = daily.t),
      |pick AS (
      |  SELECT t, day, d, cu,
      |    ROW_NUMBER() OVER (PARTITION BY t ORDER BY ABS(cu) DESC, day)
      |      AS rn
      |  FROM c)
      |SELECT t AS event_type, d AS n_days, day AS cp_day,
      |  CAST(ABS(cu) AS DOUBLE) / CAST(d AS DOUBLE) / 10000.0::DOUBLE
      |    AS cusum_peak
      |FROM pick WHERE rn = 1
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    val daily = events(s, d)
      .groupBy(col("event_type").as("t"), col("ts").cast("date").as("day"))
      .agg(sum(floor(col("value") * 10000.0 + 0.5).cast("long")).as("s"))
    val tot = daily.groupBy("t")
      .agg(sum("s").as("stot"), count(lit(1)).as("d"))
    val wCum = Window.partitionBy("t").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = daily.join(broadcast(tot), "t")
      .withColumn("cu",
        sum(col("d").cast(dec) * col("s") - col("stot")).over(wCum))
    val wPick = Window.partitionBy("t").orderBy(abs(col("cu")).desc, col("day"))
    c.withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1)
      .select(col("t").as("event_type"), col("d").as("n_days"),
        col("day").as("cp_day"),
        (abs(col("cu")).cast("double") / col("d").cast("double") / 10000.0)
          .as("cusum_peak"))
      .orderBy("event_type")
  }

  /** ClickHouse-`proportionsZTest` analogue: for each payload bucket
    * (props.k mod 10), the pooled two-proportion z-test of the bucket's
    * click-through rate (clicks / (clicks+views)) against all OTHER
    * buckets combined — the per-segment conversion check.
    *
    * Counts are one exact hash agg; the complement (x2, n2) comes from
    * broadcast totals by subtraction, so no second scan. z is one final
    * double tree: (p1−p2)/√(p̂(1−p̂)(1/n1+1/n2)).
    *
    * 100 TB shape: one corpus-sized filtered hash agg to ≤10 bucket
    * rows; the rest is arithmetic on that bounded relation. */
  val q108ProportionsZtest: Q = Q(
    "q108_proportions_ztest",
    """WITH b AS (
      |  SELECT CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) % 10
      |      AS bucket,
      |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT
      |      AS x1,
      |    SUM(CASE WHEN event_type IN ('click', 'view') THEN 1 ELSE 0 END)
      |      ::BIGINT AS n1
      |  FROM events GROUP BY 1),
      |tot AS (SELECT SUM(x1)::BIGINT AS xt, SUM(n1)::BIGINT AS nt FROM b)
      |SELECT bucket, x1, n1,
      |  (CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE)
      |   - CAST(xt - x1 AS DOUBLE) / CAST(nt - n1 AS DOUBLE))
      |  / SQRT((CAST(xt AS DOUBLE) / CAST(nt AS DOUBLE))
      |         * (1.0::DOUBLE - CAST(xt AS DOUBLE) / CAST(nt AS DOUBLE))
      |         * (1.0::DOUBLE / CAST(n1 AS DOUBLE)
      |            + 1.0::DOUBLE / CAST(nt - n1 AS DOUBLE))) AS z_stat
      |FROM b CROSS JOIN tot
      |ORDER BY bucket""".stripMargin) { (s, d) =>
    val b = events(s, d)
      .groupBy((get_json_object(col("props"), "$.k").cast("bigint") % 10)
        .as("bucket"))
      .agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x1"),
        sum(when(col("event_type").isin("click", "view"), 1L).otherwise(0L))
          .as("n1"))
    val tot = broadcast(b.agg(sum("x1").as("xt"), sum("n1").as("nt")))
    val p1 = col("x1").cast("double") / col("n1").cast("double")
    val p2 = (col("xt") - col("x1")).cast("double") /
      (col("nt") - col("n1")).cast("double")
    val pp = col("xt").cast("double") / col("nt").cast("double")
    b.crossJoin(tot)
      .select(col("bucket"), col("x1"), col("n1"),
        ((p1 - p2) / sqrt(pp * (lit(1.0) - pp) *
          (lit(1.0) / col("n1").cast("double") +
            lit(1.0) / (col("nt") - col("n1")).cast("double"))))
          .as("z_stat"))
      .orderBy("bucket")
  }

  /** ClickHouse-`cramersVBiasCorrected` analogue: the Bergsma
    * bias-corrected Cramér's V on the same type × payload-bucket
    * contingency as [[EventAnalytics5.q100CramersV]] — the version to
    * trust when cell counts are modest.
    *
    * χ² reuses q100's exact-integer per-cell terms and the same
    * order-deterministic sequential fold ((t,b)-sorted, zero-seeded).
    * The correction is one double tree: φ²⁺ = max(0, χ²/n − (r−1)(c−1)/
    * (n−1)), r⁺ = r − (r−1)²/(n−1), c⁺ analogous, V = √(φ²⁺/min(r⁺,c⁺−…
    * min(r⁺−1, c⁺−1)).
    *
    * 100 TB shape: identical to q100 — one corpus-sized hash agg to
    * ≤ |types|·10 cells, then bounded arithmetic. */
  val q109CramersVCorrected: Q = Q(
    "q109_cramers_v_corrected",
    """WITH cells AS (
      |  SELECT event_type AS ty,
      |    CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) % 10 AS b,
      |    COUNT(*)::BIGINT AS o
      |  FROM events GROUP BY 1, 2),
      |rt AS (SELECT ty, SUM(o)::BIGINT AS rtot FROM cells GROUP BY ty),
      |ct AS (SELECT b, SUM(o)::BIGINT AS ctot FROM cells GROUP BY b),
      |n AS (SELECT SUM(o)::BIGINT AS nn, COUNT(DISTINCT ty)::BIGINT AS r,
      |             COUNT(DISTINCT b)::BIGINT AS c FROM cells),
      |terms AS (
      |  SELECT cells.ty, cells.b,
      |    CAST((CAST(cells.o AS HUGEINT) * nn - CAST(rtot AS HUGEINT) * ctot)
      |         * (CAST(cells.o AS HUGEINT) * nn - CAST(rtot AS HUGEINT) * ctot)
      |      AS DOUBLE)
      |      / CAST(nn * rtot * ctot AS DOUBLE) AS term
      |  FROM cells JOIN rt ON rt.ty = cells.ty JOIN ct ON ct.b = cells.b
      |  CROSS JOIN n),
      |chi AS (
      |  SELECT LIST_REDUCE(LIST_PREPEND(0.0::DOUBLE,
      |    ARRAY_AGG(term ORDER BY ty, b)), (a, x) -> a + x) AS chi2
      |  FROM terms),
      |k AS (
      |  SELECT n.nn, n.r, n.c, chi.chi2,
      |    GREATEST(0.0::DOUBLE,
      |      chi.chi2 / CAST(n.nn AS DOUBLE)
      |      - CAST((n.r - 1) * (n.c - 1) AS DOUBLE)
      |        / CAST(n.nn - 1 AS DOUBLE)) AS phi2p,
      |    CAST(n.r AS DOUBLE) - CAST((n.r - 1) * (n.r - 1) AS DOUBLE)
      |      / CAST(n.nn - 1 AS DOUBLE) AS rp,
      |    CAST(n.c AS DOUBLE) - CAST((n.c - 1) * (n.c - 1) AS DOUBLE)
      |      / CAST(n.nn - 1 AS DOUBLE) AS cp
      |  FROM chi CROSS JOIN n)
      |SELECT nn AS n, chi2,
      |  SQRT(phi2p / LEAST(rp - 1.0::DOUBLE, cp - 1.0::DOUBLE))
      |    AS cramers_v_corrected
      |FROM k""".stripMargin) { (s, d) =>
    val cells = events(s, d)
      .select(col("event_type").as("ty"),
        (get_json_object(col("props"), "$.k").cast("bigint") % 10).as("b"))
      .groupBy("ty", "b").agg(count(lit(1)).as("o"))
      // r16: |types|×10 rows at ANY corpus size — materialized once for
      // the four consumers (rt, ct, n, terms); the q100 fix
      .localCheckpoint(true)
    val rt = cells.groupBy("ty").agg(sum(col("o")).as("rtot"))
    val ct = cells.groupBy("b").agg(sum(col("o")).as("ctot"))
    val n = broadcast(cells.agg(sum(col("o")).as("nn"),
      countDistinct(col("ty")).as("r"), countDistinct(col("b")).as("c")))
    val dev = col("o").cast(dec) * col("nn").cast(dec) -
      col("rtot").cast(dec) * col("ctot").cast(dec)
    val terms = cells.join(rt, "ty").join(ct, "b").crossJoin(n)
      .select(col("ty"), col("b"), col("nn"), col("r"), col("c"),
        ((dev * dev).cast("double") /
          (col("nn") * col("rtot") * col("ctot")).cast("double")).as("term"))
    val chi = terms
      .groupBy("nn", "r", "c")
      .agg(sort_array(collect_list(struct(col("ty"), col("b"),
        col("term")))).as("cells"))
      .select(col("nn"), col("r"), col("c"),
        aggregate(transform(col("cells"), e => e.getField("term")),
          lit(0.0), (a, x) => a + x).as("chi2"))
    val nnd = col("nn").cast("double")
    val phi2p = greatest(lit(0.0),
      col("chi2") / nnd -
        ((col("r") - 1) * (col("c") - 1)).cast("double") /
          (col("nn") - 1).cast("double"))
    val rp = col("r").cast("double") -
      ((col("r") - 1) * (col("r") - 1)).cast("double") /
        (col("nn") - 1).cast("double")
    val cp = col("c").cast("double") -
      ((col("c") - 1) * (col("c") - 1)).cast("double") /
        (col("nn") - 1).cast("double")
    chi.select(col("nn").as("n"), col("chi2"),
      sqrt(phi2p / least(rp - 1.0, cp - 1.0)).as("cramers_v_corrected"))
  }

  val all: Seq[Q] = Seq(q107CusumChangepoint, q108ProportionsZtest,
    q109CramersVCorrected)
}
