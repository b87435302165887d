package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Q
import graft.Tables._

/** Eleventh event-analytics batch — the remaining classical-test and
  * audience-overlap surface: the pooled-variance Student t-test
  * (completing the two-sample family next to Welch's), a chi-square
  * goodness-of-fit for day-of-week uniformity, and the event-type
  * audience-overlap Jaccard matrix. Moments stay exact ×10⁴/×10⁸
  * integers; each statistic is one mirrored double tree. */
object EventAnalytics11 {

  private val dec = DecimalType(38, 0)

  /** Student's two-sample t (pooled variance) of each type vs the
    * 'view' baseline: t = (m1−m2)/√(sp²·(1/n1+1/n2)) with sp² the
    * pooled unbiased variance — all from the same exact ×10⁴
    * (sum, sum-of-squares) moments as `q99_welch_ttest`, which
    * differs only in the denominator (unpooled). */
  val q128StudentTtest: Q = Q(
    "q128_student_ttest",
    """WITH m AS (
      |  SELECT event_type AS t, COUNT(*)::BIGINT AS n,
      |    SUM(CAST(FLOOR(value * 10000.0::DOUBLE + 0.5::DOUBLE)
      |      AS BIGINT))::HUGEINT AS s,
      |    SUM(CAST(CAST(FLOOR(value * 10000.0::DOUBLE + 0.5::DOUBLE)
      |      AS BIGINT) AS HUGEINT)
      |      * CAST(FLOOR(value * 10000.0::DOUBLE + 0.5::DOUBLE)
      |        AS BIGINT))::HUGEINT AS ss
      |  FROM events GROUP BY 1),
      |b AS (SELECT n AS n2, s AS s2, ss AS ss2 FROM m WHERE t = 'view')
      |SELECT m.t AS event_type, m.n AS n1, b.n2,
      |  (CAST(m.s AS DOUBLE) / m.n - CAST(b.s2 AS DOUBLE) / b.n2)
      |    / 10000.0::DOUBLE AS mean_diff,
      |  ((CAST(m.ss AS DOUBLE) - CAST(m.s AS DOUBLE) * CAST(m.s AS DOUBLE)
      |      / m.n)
      |    + (CAST(b.ss2 AS DOUBLE)
      |       - CAST(b.s2 AS DOUBLE) * CAST(b.s2 AS DOUBLE) / b.n2))
      |    / (m.n + b.n2 - 2) / 100000000.0::DOUBLE AS pooled_var,
      |  ((CAST(m.s AS DOUBLE) / m.n - CAST(b.s2 AS DOUBLE) / b.n2)
      |    / 10000.0::DOUBLE)
      |    / SQRT((((CAST(m.ss AS DOUBLE)
      |        - CAST(m.s AS DOUBLE) * CAST(m.s AS DOUBLE) / m.n)
      |      + (CAST(b.ss2 AS DOUBLE)
      |         - CAST(b.s2 AS DOUBLE) * CAST(b.s2 AS DOUBLE) / b.n2))
      |      / (m.n + b.n2 - 2) / 100000000.0::DOUBLE)
      |      * (1.0::DOUBLE / m.n + 1.0::DOUBLE / b.n2)) AS t_stat
      |FROM m CROSS JOIN b WHERE m.t <> 'view'
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    val v4 = floor(col("value") * 10000.0 + 0.5).cast("long")
    val m = events(s, d)
      .select(col("event_type").as("t"), v4.as("v4"))
      .groupBy("t")
      .agg(count(lit(1)).as("n"),
        sum(col("v4").cast(dec)).as("s"),
        sum(col("v4").cast(dec) * col("v4").cast(dec)).as("ss"))
    val b = broadcast(m.filter(col("t") === "view")
      .select(col("n").as("n2"), col("s").as("s2"), col("ss").as("ss2")))
    val n1d = col("n").cast("double"); val n2d = col("n2").cast("double")
    val meanDiff = (col("s").cast("double") / n1d -
      col("s2").cast("double") / n2d) / 10000.0
    val css1 = col("ss").cast("double") -
      col("s").cast("double") * col("s").cast("double") / n1d
    val css2 = col("ss2").cast("double") -
      col("s2").cast("double") * col("s2").cast("double") / n2d
    val pooled = (css1 + css2) / (col("n") + col("n2") - 2) / 1e8
    m.filter(col("t") =!= "view").crossJoin(b)
      .select(col("t").as("event_type"), col("n").as("n1"), col("n2"),
        meanDiff.as("mean_diff"),
        pooled.as("pooled_var"),
        (meanDiff / sqrt(pooled * (lit(1.0) / n1d + lit(1.0) / n2d)))
          .as("t_stat"))
      .orderBy("event_type")
  }

  /** Chi-square goodness-of-fit for day-of-week uniformity per event
    * type: χ² = Σ (o_d − n/7)²/(n/7) = (7·Σo_d² − n²)/n — the algebra
    * keeps everything one exact integer expression per type with a
    * single final division (no per-cell float accumulation). */
  val q129DowChi2: Q = Q(
    "q129_dow_chi2",
    """WITH o AS (
      |  SELECT event_type AS t, ISODOW(CAST(ts AS DATE))::BIGINT AS dow,
      |    COUNT(*)::BIGINT AS c
      |  FROM events GROUP BY 1, 2),
      |g AS (
      |  SELECT t, SUM(c)::BIGINT AS n, COUNT(*)::BIGINT AS n_days,
      |    SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT))::HUGEINT AS ss
      |  FROM o GROUP BY 1)
      |SELECT t AS event_type, n, n_days,
      |  (7.0::DOUBLE * CAST(ss AS DOUBLE)
      |    - CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)
      |    AS chi2,
      |  (7.0::DOUBLE * CAST(ss AS DOUBLE)
      |    - CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)
      |    > 12.592::DOUBLE AS reject_uniform
      |FROM g
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    val o = events(s, d)
      .groupBy(col("event_type").as("t"),
        (weekday(col("ts").cast("date")) + 1).cast("long").as("dow"))
      .agg(count(lit(1)).as("c"))
    val g = o.groupBy("t").agg(
      sum("c").as("n"), count(lit(1)).as("n_days"),
      sum(col("c").cast(dec) * col("c").cast(dec)).as("ss"))
    val nD = col("n").cast("double")
    val chi2 = (lit(7.0) * col("ss").cast("double") - nD * nD) / nD
    g.select(col("t").as("event_type"), col("n"), col("n_days"),
      chi2.as("chi2"),
      (chi2 > 12.592).as("reject_uniform"))
      .orderBy("event_type")
  }

  /** Audience-overlap Jaccard matrix: for every event-type pair, the
    * distinct-user intersection / union — "do purchasers also search"
    * as a number. Distinct (type, user) grid self-joined only on
    * shared users; output is type-pair-bounded. */
  val q130AudienceOverlap: Q = Q(
    "q130_audience_overlap",
    """WITH tu AS (SELECT DISTINCT event_type AS t, user_id FROM events),
      |tc AS (SELECT t, COUNT(*)::BIGINT AS n FROM tu GROUP BY 1),
      |ov AS (
      |  SELECT a.t AS type_a, b.t AS type_b, COUNT(*)::BIGINT AS n_common
      |  FROM tu a JOIN tu b ON b.user_id = a.user_id AND a.t < b.t
      |  GROUP BY 1, 2)
      |SELECT ov.type_a, ov.type_b, ca.n AS users_a, cb.n AS users_b,
      |  ov.n_common,
      |  CAST(ov.n_common AS DOUBLE)
      |    / CAST(ca.n + cb.n - ov.n_common AS DOUBLE) AS jaccard
      |FROM ov JOIN tc ca ON ca.t = ov.type_a
      |        JOIN tc cb ON cb.t = ov.type_b
      |ORDER BY type_a, type_b""".stripMargin) { (s, d) =>
    val tu = events(s, d)
      .select(col("event_type").as("t"), col("user_id"))
      .distinct()
      .localCheckpoint()
    val tc = tu.groupBy("t").agg(count(lit(1)).as("n"))
    val ov = tu.as("a")
      .join(tu.as("b"),
        col("b.user_id") === col("a.user_id") && col("a.t") < col("b.t"))
      .groupBy(col("a.t").as("type_a"), col("b.t").as("type_b"))
      .agg(count(lit(1)).as("n_common"))
    ov
      .join(broadcast(tc.select(col("t").as("type_a"),
        col("n").as("users_a"))), "type_a")
      .join(broadcast(tc.select(col("t").as("type_b"),
        col("n").as("users_b"))), "type_b")
      .select(col("type_a"), col("type_b"), col("users_a"), col("users_b"),
        col("n_common"),
        (col("n_common").cast("double") /
          (col("users_a") + col("users_b") - col("n_common"))
            .cast("double")).as("jaccard"))
      .orderBy("type_a", "type_b")
  }

  val all: Seq[Q] =
    Seq(q128StudentTtest, q129DowChi2, q130AudienceOverlap)
}
