package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.Tables._

/** Sixth relational batch: a second array-function battery (canonical
  * JSON-stringified per the checker contract) and try_* error-safe
  * arithmetic with exactly-defined null semantics. */
object Relational6 {

  /** Array battery two: build a per-order array deterministically
    * (sorted aggregation), then slice/position/contains/min-max. All
    * array outputs leave as canonical JSON strings; all positions as
    * BIGINT. The aggregation is one hash agg; the array ops are per-row
    * codegen'd. */
  val q63ArrayFuncs2: Q = Q(
    "q63_array_funcs2",
    """SELECT l_orderkey AS o_orderkey,
      |  TO_JSON(list_sort(list(l_linenumber))) AS lines_json,
      |  CAST(LEN(list(l_linenumber)) AS BIGINT) AS n_lines,
      |  TO_JSON(list_slice(list_sort(list(l_linenumber)), 1, 2)) AS first2_json,
      |  CAST(COALESCE(list_position(list_sort(list(l_linenumber)), 3), 0) AS BIGINT) AS pos_of_3,
      |  list_contains(list(l_linenumber), 7) AS has_line7,
      |  CAST(list_min(list(l_linenumber)) AS BIGINT) AS min_line,
      |  CAST(list_max(list(l_linenumber)) AS BIGINT) AS max_line
      |FROM lineitem
      |WHERE l_orderkey IS NOT NULL
      |GROUP BY l_orderkey
      |HAVING l_orderkey < 2000
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    lineitem(s, d)
      .filter(col("l_orderkey").isNotNull)
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(collect_list(col("l_linenumber")).as("arr"))
      .filter(col("o_orderkey") < 2000)
      .select(col("o_orderkey"),
        to_json(sort_array(col("arr"))).as("lines_json"),
        size(col("arr")).cast("bigint").as("n_lines"),
        to_json(slice(sort_array(col("arr")), 1, 2)).as("first2_json"),
        array_position(sort_array(col("arr")), 3).as("pos_of_3"),
        array_contains(col("arr"), 7).as("has_line7"),
        array_min(col("arr")).cast("bigint").as("min_line"),
        array_max(col("arr")).cast("bigint").as("max_line"))
      .orderBy("o_orderkey")
  }

  /** try_* error-safe arithmetic: division by zero, failed string casts,
    * and BIGINT overflow all yield NULL instead of failing the job —
    * the per-record-resilience story (D7) applied to expressions. The
    * oracle states the identical semantics with explicitly-defined
    * arithmetic (CASE guards + HUGEINT range check), so the check pins
    * Spark's try_* null contract, not just "both engines error". */
  val q64TryArith: Q = Q(
    "q64_try_arith",
    """SELECT l_orderkey, l_linenumber,
      |  CASE WHEN (l_linenumber - 3) = 0 THEN NULL
      |       ELSE CAST(l_extendedprice AS DOUBLE) / (l_linenumber - 3)
      |  END AS safe_div,
      |  TRY_CAST(CASE WHEN l_linenumber % 2 = 0
      |                THEN CAST(l_linenumber AS VARCHAR) ELSE 'n/a' END
      |           AS BIGINT) AS parsed,
      |  CAST(CASE WHEN CAST(l_orderkey AS HUGEINT) * 4611686018427387904
      |                 BETWEEN -9223372036854775808 AND 9223372036854775807
      |            THEN l_orderkey * 4611686018427387904 ELSE NULL
      |       END AS BIGINT) AS big_product
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        try_divide(col("l_extendedprice").cast("double"),
          col("l_linenumber") - 3).as("safe_div"),
        expr("try_cast(CASE WHEN l_linenumber % 2 = 0 " +
          "THEN CAST(l_linenumber AS STRING) ELSE 'n/a' END AS BIGINT)")
          .as("parsed"),
        try_multiply(col("l_orderkey"), lit(4611686018427387904L))
          .as("big_product"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Date battery two: month arithmetic with end-of-month clamping,
    * last_day, quarter truncation, day-of-year — semantics the engines
    * agree on exactly (verified: both clamp Jan 31 + 1 month to the
    * month end). Fractional months_between is deliberately excluded
    * (engines define it differently). */
  val q65DateFuncs2: Q = Q(
    "q65_date_funcs2",
    """SELECT o_orderkey,
      |  CAST(o_orderdate AS DATE) AS d,
      |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
      |  LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end,
      |  CAST(DATE_TRUNC('quarter', CAST(o_orderdate AS DATE)) AS DATE) AS qtr_start,
      |  CAST(DAYOFYEAR(CAST(o_orderdate AS DATE)) AS BIGINT) AS doy,
      |  CAST(QUARTER(CAST(o_orderdate AS DATE)) AS BIGINT) AS qtr
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val dt = col("o_orderdate").cast("date")
    orders(s, d).select(
        col("o_orderkey"), dt.as("d"),
        add_months(dt, 3).as("plus3m"),
        last_day(dt).as("month_end"),
        date_trunc("quarter", dt).cast("date").as("qtr_start"),
        dayofyear(dt).cast("bigint").as("doy"),
        quarter(dt).cast("bigint").as("qtr"))
      .orderBy("o_orderkey")
  }

  /** LIKE pattern battery: %/_ wildcards, ILIKE case folding, and an
    * escaped literal underscore — the pattern-match semantics both
    * engines define identically (SQL-entry style: one text, two
    * engines). */
  val q68LikePatterns: Q = {
    val sql =
      """SELECT p_partkey, p_name,
        |  p_name LIKE 'small%' AS starts_small,
        |  p_name ILIKE 'SMALL%' AS starts_small_ci,
        |  p_name LIKE '%_ing' AS ends_ing_wild,
        |  p_name LIKE '%!_ing' ESCAPE '!' AS ends_ing_literal,
        |  p_name LIKE '%o%t%' AS o_then_t
        |FROM part
        |ORDER BY p_partkey""".stripMargin
    Q("q68_like_patterns", sql) { (s, d) =>
      part(s, d).createOrReplaceTempView("part")
      s.sql(sql)
    }
  }

  /** Schema-evolving union: two relations with different column sets
    * merged by NAME, absent columns null-filled — the batch analogue of
    * a CDC stream gaining columns mid-flight (the JDBC sink's schema
    * evolution path). Spark: unionByName(allowMissingColumns);
    * DuckDB: UNION ALL BY NAME. */
  val q69UnionByName: Q = Q(
    "q69_union_by_name",
    """SELECT * FROM (
      |  SELECT o_orderkey, 'prio' AS src, o_orderpriority
      |  FROM orders WHERE o_orderkey % 2 = 0
      |  UNION ALL BY NAME
      |  SELECT o_orderkey, 'price' AS src, o_totalprice
      |  FROM orders WHERE o_orderkey % 2 = 1)
      |ORDER BY o_orderkey, src""".stripMargin) { (s, d) =>
    val o = orders(s, d)
    val a = o.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), lit("prio").as("src"), col("o_orderpriority"))
    val b = o.filter(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), lit("price").as("src"), col("o_totalprice"))
    a.unionByName(b, allowMissingColumns = true)
      .orderBy("o_orderkey", "src")
  }

  /** Self-referencing aggregate — customers holding the maximum order
    * count. The per-customer aggregation feeds BOTH the row side and the
    * max side; Spark's ReuseExchange dedupes the shuffle so the fact
    * table is scanned and aggregated once (asserted in PlanShapeSpec). */
  val q70ExchangeReuse: Q = Q(
    "q70_exchange_reuse",
    """WITH agg AS (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY 1),
      |m AS (SELECT MAX(n) AS mx FROM agg)
      |SELECT a.o_custkey, a.n
      |FROM agg a CROSS JOIN m
      |WHERE a.n = m.mx
      |ORDER BY a.o_custkey""".stripMargin) { (s, d) =>
    val agg = orders(s, d).groupBy("o_custkey").agg(count(lit(1)).as("n"))
    agg.crossJoin(broadcast(agg.agg(max(col("n")).as("mx"))))
      .filter(col("n") === col("mx"))
      .select("o_custkey", "n")
      .orderBy("o_custkey")
  }

  val all: Seq[Q] = Seq(q63ArrayFuncs2, q64TryArith, q65DateFuncs2,
    q68LikePatterns, q69UnionByName, q70ExchangeReuse)
}
