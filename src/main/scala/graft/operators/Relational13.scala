package graft.operators

import org.apache.spark.sql.functions._

import graft.Q
import graft.Tables._

/** Thirteenth relational batch: multi-level aggregation — ROLLUP, CUBE,
  * and explicit GROUPING SETS, the ClickHouse `WITH ROLLUP/CUBE/TOTALS`
  * surface (reference scope: main.py:12-55's arbitrary OLAP SQL side)
  * that was the one remaining absent classic in the registry. All three
  * use Spark's native grouping-analytics API (`Dataset.rollup/cube/
  * groupingSets` — ONE shuffle producing every stratum via Expand, not
  * a UNION of re-aggregations) with `grouping_id()` disambiguating
  * super-aggregate NULLs from data NULLs, matching DuckDB's standard
  * `GROUPING(a, b)` bitmask (leftmost column = most significant bit on
  * both engines). Money/value sums ride the exact-decimal → double
  * house rule; ordering pins NULLS FIRST explicitly (Spark's ASC
  * default) because DuckDB defaults to NULLS LAST. */
object Relational13 {

  /** ROLLUP over the q01 grouping pair: per (returnflag, linestatus),
    * per returnflag subtotal, and the grand total, in one pass. */
  val q160Rollup: Q = Q(
    "q160_rollup",
    """SELECT l_returnflag AS rf, l_linestatus AS ls,
      |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY gid, rf NULLS FIRST, ls NULLS FIRST""".stripMargin) { (s, d) =>
    lineitem(s, d)
      .rollup(col("l_returnflag").as("rf"), col("l_linestatus").as("ls"))
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n"),
        dsum(money(col("l_quantity"))).as("sum_qty"))
      .select("rf", "ls", "gid", "n", "sum_qty")
      .orderBy(col("gid"), col("rf").asc_nulls_first,
        col("ls").asc_nulls_first)
  }

  /** CUBE over (event_type, weekday): all four strata — per cell, per
    * type, per weekday, grand total — from one Expand pass. */
  val q161Cube: Q = Q(
    "q161_cube",
    """WITH e AS (
      |  SELECT event_type AS t, dayofweek(ts) AS dow,
      |    CAST(FLOOR(value * 10000.0 + 0.5) AS BIGINT) AS v4
      |  FROM events)
      |SELECT t, dow, CAST(GROUPING(t, dow) AS BIGINT) AS gid,
      |  COUNT(*) AS n,
      |  CAST(SUM(v4) AS DOUBLE) / 10000.0::DOUBLE AS sum_v
      |FROM e
      |GROUP BY CUBE(t, dow)
      |ORDER BY gid, t NULLS FIRST, dow NULLS FIRST""".stripMargin) { (s, d) =>
    events(s, d)
      .select(col("event_type").as("t"),
        (dayofweek(col("ts")) - 1).cast("long").as("dow"),
        floor(col("value") * 10000.0 + 0.5).cast("long").as("v4"))
      .cube(col("t"), col("dow"))
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n"),
        (sum(col("v4")).cast("double") / 10000.0).as("sum_v"))
      .select("t", "dow", "gid", "n", "sum_v")
      .orderBy(col("gid"), col("t").asc_nulls_first,
        col("dow").asc_nulls_first)
  }

  /** Explicit GROUPING SETS: the per-priority and per-status marginals
    * plus the grand total — WITHOUT the cross cells a CUBE would add
    * (the shape reporting pipelines actually ask for). */
  val q162GroupingSets: Q = Q(
    "q162_grouping_sets",
    """SELECT o_orderpriority AS pri, o_orderstatus AS st,
      |  CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS revenue
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
      |ORDER BY gid, pri NULLS FIRST, st NULLS FIRST""".stripMargin) { (s, d) =>
    orders(s, d)
      // the set expressions must be IDENTICAL to the grouping columns
      // (an alias inside makes Spark see 4 distinct grouping exprs and
      // grouping_id goes 4-bit); rename in the projection instead
      .groupingSets(
        Seq(Seq(col("o_orderpriority")), Seq(col("o_orderstatus")), Seq()),
        col("o_orderpriority"), col("o_orderstatus"))
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n"),
        dsum(money(col("o_totalprice"))).as("revenue"))
      .select(col("o_orderpriority").as("pri"),
        col("o_orderstatus").as("st"), col("gid"), col("n"), col("revenue"))
      .orderBy(col("gid"), col("pri").asc_nulls_first,
        col("st").asc_nulls_first)
  }

  val all: Seq[Q] = Seq(q160Rollup, q161Cube, q162GroupingSets)
}
