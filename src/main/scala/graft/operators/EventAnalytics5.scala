package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.Tables._

/** Fifth batch of event-stream analytics — the weighted-quantile and
  * statistical-test aggregates from the ClickHouse function surface
  * (`quantileExactWeighted`, `welchTTest`): distribution summaries a
  * monitoring deployment runs directly on the landed CDC stream.
  *
  * Exactness contracts as everywhere: quantile selection is pure
  * integer comparison (100·cumweight ≥ pct·totalweight — no float
  * thresholds), and the t-test's moments come from exact 128-bit-class
  * power sums with doubles appearing only in the final identical
  * expression trees. */
object EventAnalytics5 {

  /** ClickHouse-`quantileExactWeighted` analogue: per event type, the
    * weighted p50/p90 of value with weight w = props.k + 1 — the exact
    * lower weighted quantile (smallest v whose cumulative weight
    * reaches the target). Value collapses to the ×10⁴ fixed-point
    * domain first, so the cumulative window runs over DISTINCT values
    * (value-domain-bounded, not event-bounded), and the pick rule is
    * 100·cum ≥ pct·W in BIGINTs.
    *
    * 100 TB shape: one hash agg to (type, v4) — map-side combined, the
    * heavy reduction — then a per-type window over the distinct value
    * domain (bounded by value cardinality, not corpus), then a per-type
    * min. */
  val q98WeightedQuantile: Q = Q(
    "q98_weighted_quantile",
    """WITH v AS (
      |  SELECT event_type,
      |    CAST(FLOOR(value * 10000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS v4,
      |    CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) + 1 AS w
      |  FROM events),
      |g AS (SELECT event_type, v4, SUM(w) AS cw FROM v GROUP BY 1, 2),
      |c AS (
      |  SELECT event_type, v4,
      |    SUM(cw) OVER (PARTITION BY event_type ORDER BY v4
      |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    SUM(cw) OVER (PARTITION BY event_type) AS tot
      |  FROM g)
      |SELECT event_type, CAST(MAX(tot) AS BIGINT) AS w_total,
      |  CAST(MIN(CASE WHEN 100 * cum >= 50 * tot THEN v4 END) AS DOUBLE)
      |    / 10000.0::DOUBLE AS wq50,
      |  CAST(MIN(CASE WHEN 100 * cum >= 90 * tot THEN v4 END) AS DOUBLE)
      |    / 10000.0::DOUBLE AS wq90
      |FROM c
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    val v = events(s, d).select(col("event_type"),
      floor(col("value") * 10000.0 + 0.5).cast("long").as("v4"),
      (get_json_object(col("props"), "$.k").cast("bigint") + 1).as("w"))
    val g = v.groupBy("event_type", "v4").agg(sum(col("w")).as("cw"))
    val wOrd = Window.partitionBy("event_type").orderBy(col("v4"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("event_type")
    g.withColumn("cum", sum(col("cw")).over(wOrd))
      .withColumn("tot", sum(col("cw")).over(wAll))
      .groupBy("event_type")
      .agg(
        max(col("tot")).cast("bigint").as("w_total"),
        (min(when(lit(100L) * col("cum") >= lit(50L) * col("tot"),
          col("v4"))).cast("double") / 10000.0).as("wq50"),
        (min(when(lit(100L) * col("cum") >= lit(90L) * col("tot"),
          col("v4"))).cast("double") / 10000.0).as("wq90"))
      .orderBy("event_type")
  }

  /** ClickHouse-`welchTTest` analogue: Welch's unequal-variance t
    * statistic and Welch–Satterthwaite degrees of freedom for each
    * event type's value distribution against the 'view' baseline — the
    * "did this metric shift for clicks vs views" test, run directly on
    * the stream.
    *
    * Moments come from exact sums (Σy BIGINT, Σy² as DECIMAL(38,0) ≡
    * HUGEINT); mean and sample variance are single divisions; t and df
    * are the identical IEEE expression trees on both engines:
    *   sv = (n·Σy² − (Σy)²) / (n·(n−1))   [×10⁻⁸ to value² units]
    *   t  = (m1 − m2) / √(sv1/n1 + sv2/n2)
    *   df = (sv1/n1 + sv2/n2)² / ((sv1/n1)²/(n1−1) + (sv2/n2)²/(n2−1))
    * One hash agg over the stream; the baseline row broadcasts. */
  val q99WelchTtest: Q = Q(
    "q99_welch_ttest",
    """WITH s AS (
      |  SELECT event_type, COUNT(*)::BIGINT AS n,
      |    SUM(CAST(FLOOR(value * 10000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT))::HUGEINT AS sy,
      |    SUM(CAST(CAST(FLOOR(value * 10000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS HUGEINT)
      |      * CAST(CAST(FLOOR(value * 10000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS HUGEINT)) AS syy
      |  FROM events GROUP BY event_type),
      |m AS (
      |  SELECT event_type, n,
      |    CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) / 10000.0::DOUBLE AS mean,
      |    CAST(n * syy - sy * sy AS DOUBLE)
      |      / CAST(n * (n - 1) AS DOUBLE) / 100000000.0::DOUBLE AS sv
      |  FROM s),
      |b AS (SELECT mean AS bmean, sv AS bsv, n AS bn FROM m
      |      WHERE event_type = 'view')
      |SELECT m.event_type, m.n,
      |  (m.mean - b.bmean)
      |    / SQRT(m.sv / CAST(m.n AS DOUBLE) + b.bsv / CAST(b.bn AS DOUBLE))
      |    AS t_stat,
      |  ((m.sv / CAST(m.n AS DOUBLE) + b.bsv / CAST(b.bn AS DOUBLE))
      |    * (m.sv / CAST(m.n AS DOUBLE) + b.bsv / CAST(b.bn AS DOUBLE)))
      |    / ((m.sv / CAST(m.n AS DOUBLE)) * (m.sv / CAST(m.n AS DOUBLE))
      |         / CAST(m.n - 1 AS DOUBLE)
      |       + (b.bsv / CAST(b.bn AS DOUBLE)) * (b.bsv / CAST(b.bn AS DOUBLE))
      |         / CAST(b.bn - 1 AS DOUBLE)) AS welch_df
      |FROM m CROSS JOIN b
      |WHERE m.event_type <> 'view'
      |ORDER BY m.event_type""".stripMargin) { (s, d) =>
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val y = floor(col("value") * 10000.0 + 0.5).cast("long")
    val stats = events(s, d)
      .select(col("event_type"), y.as("y"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("y")).cast(dec).as("sy"),
        sum((col("y") * col("y")).cast(dec)).as("syy"))
    val m = stats.select(col("event_type"), col("n"),
      (col("sy").cast("double") / col("n").cast("double") / 10000.0)
        .as("mean"),
      ((col("n").cast(dec) * col("syy") - col("sy") * col("sy"))
        .cast("double") /
        (col("n") * (col("n") - 1)).cast("double") / 100000000.0).as("sv"))
    val b = broadcast(m.filter(col("event_type") === "view")
      .select(col("mean").as("bmean"), col("sv").as("bsv"),
        col("n").as("bn")))
    val svn = col("sv") / col("n").cast("double")
    val bsvn = col("bsv") / col("bn").cast("double")
    m.crossJoin(b)
      .filter(col("event_type") =!= "view")
      .select(col("event_type"), col("n"),
        ((col("mean") - col("bmean")) / sqrt(svn + bsvn)).as("t_stat"),
        (((svn + bsvn) * (svn + bsvn)) /
          (svn * svn / (col("n") - 1).cast("double") +
            bsvn * bsvn / (col("bn") - 1).cast("double"))).as("welch_df"))
      .orderBy("event_type")
  }

  val all: Seq[Q] = Seq(q98WeightedQuantile, q99WelchTtest)
}
