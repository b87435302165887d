package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.Tables._

/** Relational / analytical operator surface (SURVEY.md §2.3).
  *
  * The reference lands CDC streams into ClickHouse to query them
  * analytically (reference: docker-compose.yml:155-174); the concrete
  * operator surface below is the ClickHouse-side capability re-expressed
  * as Catalyst-optimized DataFrame plans. Everything is declarative: scans
  * get predicate pushdown + column pruning, dimension joins are broadcast,
  * aggregations are partial+final, and AQE picks shuffle partition counts
  * at runtime — i.e. the plans survive a 100× scale-up unchanged.
  *
  * Determinism contract with the DuckDB oracle: double aggregation is
  * order-dependent, so all checked aggregates run in exact decimal and
  * surface as double (see [[graft.Tables]]); every query ends in a total
  * order over a unique key set.
  */
object Relational {

  /** TPC-H-Q1-shaped pricing summary: scan → filter (pushed to parquet) →
    * partial/final hash aggregate. No shuffle beyond the single agg
    * exchange on (returnflag, linestatus) — 6 groups, trivially scalable.
    */
  val q01PricingSummary: Q = Q(
    "q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    val one = lit(1).cast(Rate)
    lineitem(s, d)
      .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(money(col("l_quantity"))).as("sum_qty"),
        dsum(money(col("l_extendedprice"))).as("sum_base_price"),
        dsum(money(col("l_extendedprice")) * (one - rate(col("l_discount"))))
          .as("sum_disc_price"),
        dsum(money(col("l_extendedprice")) * (one - rate(col("l_discount"))) *
          (one + rate(col("l_tax")))).as("sum_charge"),
        davg(money(col("l_quantity"))).as("avg_qty"),
        davg(money(col("l_extendedprice"))).as("avg_price"),
        davg(rate(col("l_discount"))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Projection + conjunctive predicates (range, between, null-safe
    * equality). All predicates reach the parquet scan as PushedFilters;
    * only the 6 referenced columns are read (ReadSchema pruning).
    */
  val q02FilterProject: Q = Q(
    "q02_filter_project",
    """SELECT l_orderkey, l_linenumber,
      |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2)) AS DOUBLE) AS discount_amount
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07
      |  AND l_quantity < 24
      |  AND l_returnflag IS NOT DISTINCT FROM 'N'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24 &&
        (col("l_returnflag") <=> lit("N")))
      .select(col("l_orderkey"), col("l_linenumber"),
        (money(col("l_extendedprice")) * rate(col("l_discount")))
          .cast("double").as("discount_amount"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** 5-table star join: region ⋈ nation ⋈ customer ⋈ orders ⋈ lineitem.
    * region/nation are broadcast (tiny dims — no shuffle of the fact
    * side); customer⋈orders⋈lineitem shuffle on their keys, and at 100 TB
    * that is exactly the co-partitioning you want (AQE coalesces). */
  val q03RevenueByRegion: Q = Q(
    "q03_revenue_by_region",
    """SELECT r.r_name,
      |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM region r
      |JOIN nation n ON n.n_regionkey = r.r_regionkey
      |JOIN customer c ON c.c_nationkey = n.n_nationkey
      |JOIN orders o ON o.o_custkey = c.c_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY r.r_name
      |ORDER BY r.r_name""".stripMargin) { (s, d) =>
    val one = lit(1).cast(Rate)
    val r = region(s, d); val n = nation(s, d); val c = customer(s, d)
    val o = orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val l = lineitem(s, d)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name")
      .agg(
        dsum(money(col("l_extendedprice")) * (one - rate(col("l_discount"))))
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name")
  }

  /** Left-semi join (EXISTS) with an extra non-equi conjunct: orders that
    * had at least one line item shipped >60 days after the order date. */
  val q04SemiJoin: Q = Q(
    "q04_semi_join",
    """SELECT o_orderpriority, COUNT(*) AS n_orders
      |FROM orders o
      |WHERE EXISTS (
      |  SELECT 1 FROM lineitem l
      |  WHERE l.l_orderkey = o.o_orderkey
      |    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    val o = orders(s, d); val l = lineitem(s, d)
    o.join(l,
        o("o_orderkey") === l("l_orderkey") &&
          l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAY"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** Left-anti join (NOT EXISTS): customers that never ordered, counted by
    * nation (nation broadcast). */
  val q05AntiJoin: Q = Q(
    "q05_anti_join",
    """SELECT n.n_name, COUNT(*) AS n_customers
      |FROM customer c
      |JOIN nation n ON n.n_nationkey = c.c_nationkey
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey
      |    AND o.o_orderdate >= TIMESTAMP '2001-01-01')
      |GROUP BY n.n_name
      |ORDER BY n.n_name""".stripMargin) { (s, d) =>
    val c = customer(s, d); val n = nation(s, d)
    val o = orders(s, d)
      .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .join(broadcast(n), col("c_nationkey") === n("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("n_name")
  }

  /** Left-outer join + two-level aggregation (TPC-H Q13 shape): order
    * count per customer (0 for order-less customers), then the customer
    * distribution per order count. */
  val q06OuterJoinAgg: Q = Q(
    "q06_outer_join_agg",
    """SELECT c_count, COUNT(*) AS custdist FROM (
      |  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      |  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      |  GROUP BY c.c_custkey)
      |GROUP BY c_count
      |ORDER BY c_count""".stripMargin) { (s, d) =>
    val c = customer(s, d); val o = orders(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(c("c_custkey"))
      .agg(count(o("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy("c_count")
  }

  /** Full-outer join of two aggregates: customer count vs supplier count
    * per nation key, null-filled with 0. */
  val q07FullOuterJoin: Q = Q(
    "q07_full_outer_join",
    """SELECT COALESCE(c.k, s.k) AS nationkey,
      |  COALESCE(c.n, 0) AS n_customers, COALESCE(s.n, 0) AS n_suppliers
      |FROM (SELECT c_nationkey AS k, COUNT(*) AS n FROM customer GROUP BY 1) c
      |FULL JOIN (SELECT s_nationkey AS k, COUNT(*) AS n FROM supplier GROUP BY 1) s
      |  ON c.k = s.k
      |ORDER BY nationkey""".stripMargin) { (s, d) =>
    val c = customer(s, d).groupBy(col("c_nationkey").as("k"))
      .agg(count(lit(1)).as("n")).as("c")
    val su = supplier(s, d).groupBy(col("s_nationkey").as("k"))
      .agg(count(lit(1)).as("n")).as("s")
    c.join(su, col("c.k") === col("s.k"), "full_outer")
      .select(
        coalesce(col("c.k"), col("s.k")).as("nationkey"),
        coalesce(col("c.n"), lit(0L)).as("n_customers"),
        coalesce(col("s.n"), lit(0L)).as("n_suppliers"))
      .orderBy("nationkey")
  }

  /** Per-group top-k via ranking window: top-3 orders per customer by
    * total price (deterministic tiebreak on order key). At scale this is
    * the single-shuffle pattern — partition by customer, sort within —
    * and Catalyst's InferWindowGroupLimit plants a two-phase
    * WindowGroupLimit (map-side top-k pruning BEFORE the shuffle, final
    * after), so only ≤k rows per group per mapper ever move. Verified in
    * the physical plan; no custom rewrite rule needed. */
  val q08TopkPerGroup: Q = Q(
    "q08_topk_per_group",
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders)
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).cast("bigint").as("rn"))
      .filter(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  /** Analytic window functions: lag/lead/first/last + exact running sum
    * per customer ordered by order date. */
  val q09WindowAnalytic: Q = Q(
    "q09_window_analytic",
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  LAG(o_totalprice) OVER w AS prev_price,
      |  LEAD(o_totalprice) OVER w AS next_price,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
      |  FIRST_VALUE(o_orderkey) OVER w AS first_order,
      |  LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(s, d).select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        lag("o_totalprice", 1).over(w).as("prev_price"),
        lead("o_totalprice", 1).over(w).as("next_price"),
        sum(money(col("o_totalprice"))).over(wRun).cast("double").as("running_spend"),
        first("o_orderkey").over(w).as("first_order"),
        last("o_orderkey").over(wAll).as("last_order"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Ranking family on a low-cardinality sort key: rank / dense_rank share
    * ties on p_size; ntile and row_number use a fully deterministic order.
    */
  val q10RankFamily: Q = Q(
    "q10_rank_family",
    """SELECT p_partkey, p_size,
      |  RANK() OVER (ORDER BY p_size) AS rnk,
      |  DENSE_RANK() OVER (ORDER BY p_size) AS drnk,
      |  NTILE(7) OVER (ORDER BY p_size, p_partkey) AS bucket,
      |  ROW_NUMBER() OVER (ORDER BY p_size, p_partkey) AS rn
      |FROM part
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    // Distributed rank family — no single-partition window (the r04
    // scale finding: `Window.orderBy` serializes the whole table onto
    // one task). Global row_number over the unique (p_size, p_partkey)
    // order comes from the two-pass range-partitioned shape; rank is
    // the tie group's min row number (hash agg + broadcast join);
    // dense_rank is the group's own row number (same two-pass over the
    // per-size relation, ≤ |distinct sizes| rows); NTILE boundaries are
    // seven driver-side constants folded into a CASE over row_number.
    val base = part(s, d).select(col("p_partkey"), col("p_size"))
    val withRn = ScalableWindows.globalRowNumber(base,
      Seq(col("p_size"), col("p_partkey")), "rn")
    val groups = withRn.groupBy("p_size").agg(min(col("rn")).as("rnk"))
    val sized = ScalableWindows.globalRowNumber(groups,
      Seq(col("p_size")), "drnk", parts = 8)
    // NTILE(7) via the q117 in-plan integer arithmetic over (rn, n) —
    // with q = n div 7 and r = n mod 7, SQL NTILE front-loads (the first
    // r tiles hold q+1 rows), so the tile is pure arithmetic. r16: n was
    // previously a SEPARATE driver-side count() action during query
    // construction; it now rides the main action as a broadcast 1-row agg
    // (identical front-loaded assignment — guide §5, driver does no data
    // work)
    val nDf = broadcast(withRn.agg(count(lit(1)).as("n")))
    val bucket = expr(
      """CASE WHEN rn <= (n % 7) * (n div 7 + 1)
        |  THEN (rn - 1) div (n div 7 + 1) + 1
        |  ELSE n % 7 + (rn - (n % 7) * (n div 7 + 1) - 1) div (n div 7) + 1
        |END""".stripMargin)
    withRn.join(broadcast(sized), "p_size").crossJoin(nDf)
      .select(col("p_partkey"), col("p_size"),
        col("rnk").cast("bigint").as("rnk"),
        col("drnk").cast("bigint").as("drnk"),
        bucket.cast("bigint").as("bucket"),
        col("rn").cast("bigint").as("rn"))
      .orderBy("p_partkey")
  }

  /** Set operators: customers active in 1995 vs 1996 — INTERSECT /
    * EXCEPT / UNION ALL of the two distinct key sets, tagged. */
  val q11SetOps: Q = Q(
    "q11_set_ops",
    """WITH y95 AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'),
      |     y96 AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01')
      |SELECT 'both' AS tag, o_custkey FROM (SELECT o_custkey FROM y95 INTERSECT SELECT o_custkey FROM y96)
      |UNION ALL
      |SELECT 'only95' AS tag, o_custkey FROM (SELECT o_custkey FROM y95 EXCEPT SELECT o_custkey FROM y96)
      |UNION ALL
      |SELECT 'only96' AS tag, o_custkey FROM (SELECT o_custkey FROM y96 EXCEPT SELECT o_custkey FROM y95)
      |ORDER BY tag, o_custkey""".stripMargin) { (s, d) =>
    def active(from: String, until: String): DataFrame =
      orders(s, d)
        .filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
          col("o_orderdate") < lit(until).cast("timestamp"))
        .select("o_custkey").distinct()
    val y95 = active("1995-01-01", "1996-01-01")
    val y96 = active("1996-01-01", "1997-01-01")
    y95.intersect(y96).withColumn("tag", lit("both"))
      .unionByName(y95.except(y96).withColumn("tag", lit("only95")))
      .unionByName(y96.except(y95).withColumn("tag", lit("only96")))
      .select("tag", "o_custkey")
      .orderBy("tag", "o_custkey")
  }

  /** Scalar string function battery over part. */
  val q12StringFuncs: Q = Q(
    "q12_string_funcs",
    """SELECT p_partkey,
      |  UPPER(p_brand) AS brand_u,
      |  LOWER(p_type) AS type_l,
      |  SUBSTRING(p_name, 1, 5) AS name5,
      |  CONCAT_WS('-', p_brand, p_type) AS brand_type,
      |  STRING_SPLIT(p_type, ' ')[1] AS type_head,
      |  REGEXP_EXTRACT(p_name, '([a-z]+)', 1) AS first_word,
      |  LENGTH(p_name) AS name_len,
      |  REPLACE(p_type, ' ', '_') AS type_snake,
      |  LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
      |  TRIM(CONCAT(' ', p_brand, ' ')) AS brand_trim
      |FROM part
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    part(s, d).select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        lower(col("p_type")).as("type_l"),
        substring(col("p_name"), 1, 5).as("name5"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        element_at(split(col("p_type"), " "), 1).as("type_head"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
        length(col("p_name")).cast("bigint").as("name_len"),
        regexp_replace(col("p_type"), " ", "_").as("type_snake"),
        lpad(col("p_size").cast("string"), 4, "0").as("size_pad"),
        trim(concat(lit(" "), col("p_brand"), lit(" "))).as("brand_trim"))
      .orderBy("p_partkey")
  }

  /** Date/time function battery over orders. */
  val q13DateFuncs: Q = Q(
    "q13_date_funcs",
    """SELECT o_orderkey,
      |  YEAR(o_orderdate) AS y,
      |  MONTH(o_orderdate) AS m,
      |  DAY(o_orderdate) AS dom,
      |  QUARTER(o_orderdate) AS qtr,
      |  DATE_TRUNC('month', o_orderdate) AS month_start,
      |  CAST(EPOCH(o_orderdate) AS BIGINT) AS epoch_s,
      |  DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
      |  CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS next_month
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("bigint").as("y"),
        month(col("o_orderdate")).cast("bigint").as("m"),
        dayofmonth(col("o_orderdate")).cast("bigint").as("dom"),
        quarter(col("o_orderdate")).cast("bigint").as("qtr"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
          .cast("bigint").as("days_since"),
        add_months(col("o_orderdate"), 1).as("next_month"))
      .orderBy("o_orderkey")
  }

  /** Conditional expressions: CASE buckets + COALESCE/NULLIF. */
  val q14Conditional: Q = Q(
    "q14_conditional",
    """SELECT
      |  CASE WHEN o_totalprice >= 300000 THEN 'high'
      |       WHEN o_totalprice >= 100000 THEN 'mid'
      |       ELSE 'low' END AS bucket,
      |  COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_label,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin) { (s, d) =>
    orders(s, d)
      .select(
        when(col("o_totalprice") >= 300000, "high")
          .when(col("o_totalprice") >= 100000, "mid")
          .otherwise("low").as("bucket"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN"))
          .as("status_label"),
        col("o_totalprice"))
      .groupBy("bucket", "status_label")
      .agg(count(lit(1)).as("n"), dsum(money(col("o_totalprice"))).as("total"))
      .orderBy("bucket", "status_label")
  }

  /** ROLLUP over (returnflag, linestatus); grouping nulls surfaced as
    * '(all)' labels so ordering is engine-independent. */
  val q15Rollup: Q = Q(
    "q15_rollup",
    """SELECT COALESCE(l_returnflag, '(all)') AS flag,
      |  COALESCE(l_linestatus, '(all)') AS status,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY flag, status""".stripMargin) { (s, d) =>
    lineitem(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), dsum(money(col("l_quantity"))).as("qty"))
      .select(
        coalesce(col("l_returnflag"), lit("(all)")).as("flag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("status"),
        col("n"), col("qty"))
      .orderBy("flag", "status")
  }

  /** CUBE over (orderstatus, orderpriority). */
  val q16Cube: Q = Q(
    "q16_cube",
    """SELECT COALESCE(o_orderstatus, '(all)') AS status,
      |  COALESCE(o_orderpriority, '(all)') AS priority,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin) { (s, d) =>
    orders(s, d)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum(money(col("o_totalprice"))).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
        col("n"), col("total"))
      .orderBy("status", "priority")
  }

  /** GROUPING SETS via the SQL surface (also exercises view registration
    * + spark.sql entry). */
  val q17GroupingSets: Q = Q(
    "q17_grouping_sets",
    """SELECT COALESCE(l_returnflag, '(all)') AS flag,
      |  COALESCE(l_linestatus, '(all)') AS status,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
      |ORDER BY flag, status""".stripMargin) { (s, d) =>
    lineitem(s, d).createOrReplaceTempView("graft_li_gs")
    s.sql(
      """SELECT COALESCE(l_returnflag, '(all)') AS flag,
        |  COALESCE(l_linestatus, '(all)') AS status,
        |  COUNT(*) AS n
        |FROM graft_li_gs
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY flag, status""".stripMargin)
  }

  /** Exact distinct aggregates (multiple rewrites → expand + two-phase
    * aggregation under the hood). */
  val q18DistinctAgg: Q = Q(
    "q18_distinct_agg",
    """SELECT o_orderpriority,
      |  COUNT(DISTINCT o_custkey) AS n_custs,
      |  COUNT(DISTINCT MONTH(o_orderdate)) AS n_months,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    orders(s, d)
      .groupBy("o_orderpriority")
      .agg(
        countDistinct(col("o_custkey")).as("n_custs"),
        countDistinct(month(col("o_orderdate"))).as("n_months"),
        count(lit(1)).as("n_orders"),
        dsum(money(col("o_totalprice"))).as("total"))
      .orderBy("o_orderpriority")
  }

  /** JSON extraction from the events.props payload (reference's dynamic
    * schemas land as JSON; cf. SURVEY.md §2.3 array/map/json row). */
  val q19Json: Q = Q(
    "q19_json",
    """SELECT event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  MAX(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)) AS max_k,
      |  MIN(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)) AS min_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    val k = get_json_object(col("props"), "$.k").cast("bigint")
    events(s, d)
      .select(col("event_type"), k.as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"), min(col("k")).as("min_k"))
      .orderBy("event_type")
  }

  /** Event-time tumbling window (batch shape of the streaming ST4 op):
    * 1-hour buckets per event type. */
  val q20TimeBucket: Q = Q(
    "q20_time_bucket",
    """SELECT TIME_BUCKET(INTERVAL 1 HOUR, ts) AS bucket, event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin) { (s, d) =>
    events(s, d)
      .groupBy(window(col("ts"), "1 hour").getField("start").as("bucket"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(val4(col("value"))).as("total_value"))
      .orderBy("bucket", "event_type")
  }

  /** Equi + range ("banded") join: line items shipped within 30 days of
    * their order date, aggregated per order month. */
  val q21RangeJoin: Q = Q(
    "q21_range_join",
    """SELECT DATE_TRUNC('month', o.o_orderdate) AS order_month,
      |  COUNT(*) AS n_fast_items,
      |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS fast_revenue
      |FROM orders o
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |  AND l.l_shipdate >= o.o_orderdate
      |  AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
      |GROUP BY 1
      |ORDER BY 1""".stripMargin) { (s, d) =>
    val o = orders(s, d); val l = lineitem(s, d)
    o.join(l,
        o("o_orderkey") === l("l_orderkey") &&
          l("l_shipdate") >= o("o_orderdate") &&
          l("l_shipdate") < o("o_orderdate") + expr("INTERVAL 30 DAY"))
      .groupBy(date_trunc("month", col("o_orderdate")).as("order_month"))
      .agg(count(lit(1)).as("n_fast_items"),
        dsum(money(col("l_extendedprice"))).as("fast_revenue"))
      .orderBy("order_month")
  }

  /** As-of join: for every purchase event, the most recent signup event
    * of the same user at-or-before it. Implemented as the scalable
    * single-pass union+window form — one shuffle on user_id, no
    * correlated re-scan — instead of a join + re-aggregation. */
  val q22AsofJoin: Q = Q(
    "q22_asof_join",
    """SELECT p.event_id, p.user_id, p.ts,
      |  (SELECT MAX(sg.ts) FROM events sg
      |   WHERE sg.user_id = p.user_id AND sg.event_type = 'signup'
      |     AND sg.ts <= p.ts) AS asof_signup_ts
      |FROM events p
      |WHERE p.event_type = 'purchase'
      |ORDER BY p.event_id""".stripMargin) { (s, d) =>
    val ev = events(s, d).filter(col("event_type").isin("signup", "purchase"))
      .withColumn("is_signup", (col("event_type") === "signup").cast("int"))
      .withColumn("signup_ts",
        when(col("event_type") === "signup", col("ts")))
    // Order signups before purchases at equal ts so "<=" semantics hold.
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("is_signup").desc, col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("asof_signup_ts",
        last("signup_ts", ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "asof_signup_ts")
      .orderBy("event_id")
  }

  val all: Seq[Q] = Seq(
    q01PricingSummary, q02FilterProject, q03RevenueByRegion, q04SemiJoin,
    q05AntiJoin, q06OuterJoinAgg, q07FullOuterJoin, q08TopkPerGroup,
    q09WindowAnalytic, q10RankFamily, q11SetOps, q12StringFuncs,
    q13DateFuncs, q14Conditional, q15Rollup, q16Cube, q17GroupingSets,
    q18DistinctAgg, q19Json, q20TimeBucket, q21RangeJoin, q22AsofJoin)
}
