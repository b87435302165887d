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

  /** ClickHouse-`cramersV` analogue: association strength between the
    * event type and the payload bucket (props.k mod 10) — the
    * "is this dimension independent of that one" check run on landed
    * streams before trusting a segmentation.
    *
    * χ² = Σ_cells (o·N − rt·ct)² / (N·rt·ct): each term is ONE double
    * division of exact integers ((o·N − rt·ct)² in 128-bit-class
    * arithmetic), and the cell sum — the one place addition order
    * could diverge — runs as a SEQUENTIAL FOLD over the
    * (type, bucket)-sorted cell array on both engines (the PortableLn
    * battery convention), so χ² and V are bit-identical. The cell
    * matrix is |types|·10, so the fold array is trivially bounded.
    *
    * 100 TB shape: one hash agg to the contingency cells (map-side
    * combined — the only corpus-sized work); margins re-aggregate the
    * 50-cell relation. */
  val q100CramersV: Q = Q(
    "q100_cramers_v",
    """WITH cells AS (
      |  SELECT event_type AS t,
      |    CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) % 10 AS b,
      |    COUNT(*)::BIGINT AS o
      |  FROM events GROUP BY 1, 2),
      |rt AS (SELECT t, SUM(o)::BIGINT AS rtot FROM cells GROUP BY t),
      |ct AS (SELECT b, SUM(o)::BIGINT AS ctot FROM cells GROUP BY b),
      |n AS (SELECT SUM(o)::BIGINT AS nn, COUNT(DISTINCT t)::BIGINT AS r,
      |             COUNT(DISTINCT b)::BIGINT AS c FROM cells),
      |terms AS (
      |  SELECT cells.t, cells.b,
      |    CAST((CAST(cells.o AS HUGEINT) * nn - CAST(rtot AS HUGEINT) * ctot)
      |         * (CAST(cells.o AS HUGEINT) * nn - CAST(rtot AS HUGEINT) * ctot)
      |      AS DOUBLE)
      |      / CAST(nn * rtot * ctot AS DOUBLE) AS term
      |  FROM cells JOIN rt ON rt.t = cells.t JOIN ct ON ct.b = cells.b
      |  CROSS JOIN n),
      |chi AS (
      |  SELECT LIST_REDUCE(LIST_PREPEND(0.0::DOUBLE,
      |    ARRAY_AGG(term ORDER BY t, b)), (a, x) -> a + x) AS chi2
      |  FROM terms)
      |SELECT n.nn AS n, n.r AS n_types, n.c AS n_buckets, chi.chi2,
      |  SQRT(chi.chi2 / CAST(n.nn * (LEAST(n.r, n.c) - 1) AS DOUBLE))
      |    AS cramers_v
      |FROM chi CROSS JOIN n""".stripMargin) { (s, d) =>
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val cells = events(s, d)
      .select(col("event_type").as("t"),
        (get_json_object(col("props"), "$.k").cast("bigint") % 10).as("b"))
      .groupBy("t", "b").agg(count(lit(1)).as("o"))
      // r16: the contingency table is |types|×10 rows at ANY corpus size
      // — materialize it once so the four consumers (rt, ct, n, terms)
      // read 50 rows instead of re-running the corpus scan + JSON
      // extraction (the static plan carried 4 copies of the subtree and
      // only runtime exchange reuse MIGHT have unified them)
      .localCheckpoint(true)
    val rt = cells.groupBy("t").agg(sum(col("o")).as("rtot"))
    val ct = cells.groupBy("b").agg(sum(col("o")).as("ctot"))
    val n = broadcast(cells.agg(sum(col("o")).as("nn"),
      countDistinct(col("t")).as("r"), countDistinct(col("b")).as("c")))
    val dev = col("o").cast(dec) * col("nn").cast(dec) -
      col("rtot").cast(dec) * col("ctot").cast(dec)
    val terms = cells.join(rt, "t").join(ct, "b").crossJoin(n)
      .select(col("t"), col("b"), col("nn"), col("r"), col("c"),
        ((dev * dev).cast("double") /
          (col("nn") * col("rtot") * col("ctot")).cast("double")).as("term"))
    val chi = terms
      .groupBy("nn", "r", "c")
      .agg(sort_array(collect_list(struct(col("t"), col("b"),
        col("term")))).as("cells"))
      .select(col("nn"), col("r"), col("c"),
        aggregate(transform(col("cells"), e => e.getField("term")),
          lit(0.0), (a, x) => a + x).as("chi2"))
    chi.select(col("nn").as("n"), col("r").as("n_types"),
      col("c").as("n_buckets"), col("chi2"),
      sqrt(col("chi2") /
        (col("nn") * (least(col("r"), col("c")) - 1)).cast("double"))
        .as("cramers_v"))
  }

  val all: Seq[Q] = Seq(q98WeightedQuantile, q99WelchTtest, q100CramersV)
}
