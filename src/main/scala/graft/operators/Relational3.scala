package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.Tables._

/** Third relational batch (SURVEY.md §2.3): pivot, multiset set ops,
  * distribution window functions, map functions. */
object Relational3 {

  /** Pivot (CASE-aggregation under the hood — the oracle spells that
    * out): order counts per priority × status. */
  val q30Pivot: Q = Q(
    "q30_pivot",
    """SELECT o_orderpriority,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    orders(s, d)
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("F"),
        coalesce(col("O"), lit(0L)).as("O"),
        coalesce(col("P"), lit(0L)).as("P"))
      .orderBy("o_orderpriority")
  }

  /** Multiset set operators (ALL variants preserve duplicates). */
  val q31SetOpsAll: Q = Q(
    "q31_set_ops_all",
    """WITH a AS (SELECT l_quantity FROM lineitem WHERE l_returnflag = 'A'),
      |     b AS (SELECT l_quantity FROM lineitem WHERE l_returnflag = 'R')
      |SELECT 'inter' AS tag, l_quantity, COUNT(*) AS n
      |FROM (SELECT l_quantity FROM a INTERSECT ALL SELECT l_quantity FROM b)
      |GROUP BY 2
      |UNION ALL
      |SELECT 'except' AS tag, l_quantity, COUNT(*) AS n
      |FROM (SELECT l_quantity FROM a EXCEPT ALL SELECT l_quantity FROM b)
      |GROUP BY 2
      |ORDER BY tag, l_quantity""".stripMargin) { (s, d) =>
    val li = lineitem(s, d)
    val a = li.filter(col("l_returnflag") === "A").select("l_quantity")
    val b = li.filter(col("l_returnflag") === "R").select("l_quantity")
    a.intersectAll(b).groupBy("l_quantity")
      .agg(count(lit(1)).as("n")).withColumn("tag", lit("inter"))
      .unionByName(a.exceptAll(b).groupBy("l_quantity")
        .agg(count(lit(1)).as("n")).withColumn("tag", lit("except")))
      .select("tag", "l_quantity", "n")
      .orderBy("tag", "l_quantity")
  }

  /** Distribution window functions: percent_rank / cume_dist /
    * nth_value over a deterministic per-customer order. */
  val q32WindowDistribution: Q = Q(
    "q32_window_distribution",
    """SELECT o_custkey, o_orderkey,
      |  PERCENT_RANK() OVER w AS pr,
      |  CUME_DIST() OVER w AS cd,
      |  NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_order
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    orders(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        nth_value(col("o_orderkey"), 2).over(wAll).as("second_order"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Map functions: per-priority month→count map built from entries,
    * round-tripped through map_entries, plus keyed access. The map is
    * emitted as a canonical "k:v,k:v" string (the driver's pandas-based
    * checker cannot sort raw map columns). */
  val q33MapFuncs: Q = Q(
    "q33_map_funcs",
    """WITH mc AS (
      |  SELECT o_orderpriority, CAST(MONTH(o_orderdate) AS BIGINT) AS m, COUNT(*) AS n
      |  FROM orders GROUP BY 1, 2)
      |SELECT o_orderpriority,
      |  ARRAY_TO_STRING(LIST_TRANSFORM(LIST_SORT(LIST({'key': m, 'value': n})),
      |    e -> e.key || ':' || e.value), ',') AS month_counts,
      |  CAST(LEN(LIST(m)) AS BIGINT) AS n_keys,
      |  MAX(CASE WHEN m = 12 THEN n END) AS dec_count
      |FROM mc
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    orders(s, d)
      .groupBy(col("o_orderpriority"), month(col("o_orderdate")).cast("bigint").as("m"))
      .agg(count(lit(1)).as("n"))
      .groupBy("o_orderpriority")
      .agg(
        map_from_entries(sort_array(collect_list(struct(col("m").as("key"),
          col("n").as("value"))))).as("mc"),
        count(lit(1)).as("n_keys"))
      .select(col("o_orderpriority"),
        array_join(transform(map_entries(col("mc")),
          e => concat_ws(":", e.getField("key").cast("string"),
            e.getField("value").cast("string"))), ",").as("month_counts"),
        col("n_keys"),
        element_at(col("mc"), lit(12L)).as("dec_count"))
      .orderBy("o_orderpriority")
  }

  /** Deterministic sampling / train-validation fold assignment — the
    * training-pipeline staple. Multiplicative (Knuth) hashing over the
    * key in portable BIGINT arithmetic, so the split is reproducible on
    * any engine and stable under repartitioning (unlike rand()-based
    * sampling). 10 folds; fold 0 doubles as a 10% sample.
    *
    * The key is reduced mod 2²⁶ BEFORE the multiply: the raw product
    * `doc_id · 2654435761` overflows BIGINT for doc_id ≳ 3.5e9 — found
    * by the sf1 scale run, where replica-offset ids hit ~9e9 and ANSI
    * mode aborted the query. 2²⁶·2654435761 ≈ 1.8e17 can never
    * overflow, and the reduction is the identity for every driver-SF
    * id, so gate outputs are bit-identical. */
  val q34FoldAssign: Q = Q(
    "q34_fold_assign",
    """WITH folded AS (
      |  SELECT lang, (((doc_id % 67108864) * 2654435761) % 4294967296) % 10 AS fold
      |  FROM documents)
      |SELECT lang, fold, COUNT(*) AS n
      |FROM folded
      |GROUP BY lang, fold
      |ORDER BY lang, fold""".stripMargin) { (s, d) =>
    documents(s, d)
      .select(col("lang"),
        ((col("doc_id") % 67108864L * 2654435761L) % 4294967296L % 10)
          .as("fold"))
      .groupBy("lang", "fold")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "fold")
  }

  /** RANGE window frame: per-customer trailing-30-day spend (event-time
    * range frame, not row count). Completes the frame coverage: rows
    * frames in q09, unbounded in q32, range here. */
  val q35RangeFrame: Q = Q(
    "q35_range_frame",
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY CAST(EPOCH(o_orderdate) AS BIGINT)
      |    RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_30d_spend
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy(unix_timestamp(col("o_orderdate")))
      .rangeBetween(-2592000L, Window.currentRow)
    orders(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        sum(money(col("o_totalprice"))).over(w).cast("double")
          .as("trailing_30d_spend"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Ordered string aggregation (LISTAGG shape) — built from
    * sort_array(collect_list) + array_join so the order is explicit and
    * engine-independent. */
  val q36StringAgg: Q = Q(
    "q36_string_agg",
    """SELECT r.r_name, STRING_AGG(n.n_name, ',' ORDER BY n.n_name) AS nations
      |FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
      |GROUP BY r.r_name
      |ORDER BY r.r_name""".stripMargin) { (s, d) =>
    val r = region(s, d); val n = nation(s, d)
    n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name")
      .agg(array_join(sort_array(collect_list(col("n_name"))), ",")
        .as("nations"))
      .orderBy("r_name")
  }

  /** NOT IN with three-valued logic: a NULL in the subquery makes
    * NOT IN unsatisfiable (count 0) — identical SQL text runs on both
    * engines, exercising Catalyst's null-aware anti join. */
  val q38NotIn: Q = {
    val sql =
      """SELECT 'no_null' AS tag, COUNT(*) AS n FROM customer
        |WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_name LIKE 'A%')
        |UNION ALL
        |SELECT 'with_null' AS tag, COUNT(*) AS n FROM customer
        |WHERE c_nationkey NOT IN (SELECT NULLIF(n_nationkey, 0) FROM nation)
        |ORDER BY tag""".stripMargin
    Q("q38_not_in", sql) { (s, d) =>
      customer(s, d).createOrReplaceTempView("customer")
      nation(s, d).createOrReplaceTempView("nation")
      s.sql(sql)
    }
  }

  /** Aggregate FILTER clauses — per-condition counts in one pass over
    * the fact table (identical SQL text on both engines). */
  val q39AggFilter: Q = {
    val sql =
      """SELECT l_returnflag,
        |  COUNT(*) AS n,
        |  COUNT(*) FILTER (WHERE l_quantity >= 25) AS n_bulk,
        |  COUNT(*) FILTER (WHERE l_discount >= 0.05) AS n_discounted,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_tax >= 0.04) AS DOUBLE) AS taxed_qty
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin
    Q("q39_agg_filter", sql) { (s, d) =>
      lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql(sql)
    }
  }

  /** LATERAL correlated subquery in FROM — per-region top-2 nations
    * (the planner decorrelates into a ranked join). */
  val q40Lateral: Q = {
    val sql =
      """SELECT r.r_name, t.n_name
        |FROM region r,
        |LATERAL (SELECT n_name FROM nation n
        |         WHERE n.n_regionkey = r.r_regionkey
        |         ORDER BY n_name LIMIT 2) t
        |ORDER BY r.r_name, t.n_name""".stripMargin
    Q("q40_lateral", sql) { (s, d) =>
      region(s, d).createOrReplaceTempView("region")
      nation(s, d).createOrReplaceTempView("nation")
      s.sql(sql)
    }
  }

  /** Global top-k: ORDER BY + LIMIT plans as TakeOrderedAndProject —
    * per-partition top-k then a k-row merge on the driver, never a
    * global sort (the plan shape that matters at 100 TB). */
  val q41GlobalTopk: Q = Q(
    "q41_global_topk",
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 20""".stripMargin) { (s, d) =>
    orders(s, d)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
  }

  /** HAVING: post-aggregation predicate (plans as Filter over the
    * aggregate — pushed nowhere, by design). */
  val q42Having: Q = Q(
    "q42_having",
    """SELECT o_custkey, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
      |FROM orders
      |GROUP BY o_custkey
      |HAVING COUNT(*) >= 15
      |ORDER BY o_custkey""".stripMargin) { (s, d) =>
    orders(s, d)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        dsum(money(col("o_totalprice"))).as("spend"))
      .filter(col("n_orders") >= 15)
      .orderBy("o_custkey")
  }

  /** Boolean aggregates: bool_or / bool_and / conditional any-match. */
  val q43BoolAgg: Q = Q(
    "q43_bool_agg",
    """SELECT o_orderpriority,
      |  BOOL_OR(o_totalprice > 400000) AS any_jumbo,
      |  BOOL_AND(o_totalprice > 1000) AS all_over_1k,
      |  BOOL_OR(o_orderstatus = 'P') AS any_pending
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    orders(s, d)
      .groupBy("o_orderpriority")
      .agg(
        bool_or(col("o_totalprice") > 400000).as("any_jumbo"),
        bool_and(col("o_totalprice") > 1000).as("all_over_1k"),
        bool_or(col("o_orderstatus") === "P").as("any_pending"))
      .orderBy("o_orderpriority")
  }

  /** Bounded sliding ROWS frame: centered 3-order moving spend per
    * customer (decimal-exact sum over the frame). */
  val q44MovingWindow: Q = Q(
    "q44_moving_window",
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE) AS moving_spend,
      |  COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS frame_n
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(-1, 1)
    orders(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        sum(money(col("o_totalprice"))).over(w).cast("double")
          .as("moving_spend"),
        count(lit(1)).over(w).as("frame_n"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Second string battery: translate/repeat/reverse/split_part/
    * strpos/starts_with/ends_with. */
  val q45StringFuncs2: Q = Q(
    "q45_string_funcs2",
    """SELECT p_partkey,
      |  TRANSLATE(p_type, 'aeiou', '.....') AS type_devowel,
      |  REPEAT(p_brand, 2) AS brand_x2,
      |  REVERSE(p_name) AS name_rev,
      |  SPLIT_PART(p_type, ' ', 2) AS type_mid,
      |  CAST(STRPOS(p_name, 'a') AS BIGINT) AS first_a,
      |  STARTS_WITH(p_type, 'STANDARD') AS is_standard,
      |  ENDS_WITH(p_brand, '5') AS brand_ends_5
      |FROM part
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    part(s, d).select(
        col("p_partkey"),
        translate(col("p_type"), "aeiou", ".....").as("type_devowel"),
        repeat(col("p_brand"), 2).as("brand_x2"),
        reverse(col("p_name")).as("name_rev"),
        split_part(col("p_type"), lit(" "), lit(2)).as("type_mid"),
        instr(col("p_name"), "a").cast("bigint").as("first_a"),
        col("p_type").startsWith("STANDARD").as("is_standard"),
        col("p_brand").endsWith("5").as("brand_ends_5"))
      .orderBy("p_partkey")
  }

  /** Salted join through the correctness gate: the skew-spreading plan
    * (big side salted, small side replicated 8×) must produce exactly
    * the plain-join result — the oracle is the unsalted SQL join. */
  val q46SaltedJoin: Q = Q(
    "q46_salted_join",
    """SELECT o.o_orderpriority,
      |  COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      |GROUP BY o.o_orderpriority
      |ORDER BY o.o_orderpriority""".stripMargin) { (s, d) =>
    val big = lineitem(s, d)
      .select(col("l_orderkey").as("o_orderkey"), col("l_extendedprice"))
    val small = orders(s, d).select("o_orderkey", "o_orderpriority")
    Joins.saltedJoin(big, small, Seq("o_orderkey"), saltFactor = 8)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        dsum(money(col("l_extendedprice"))).as("revenue"))
      .orderBy("o_orderpriority")
  }

  val all: Seq[Q] = Seq(q30Pivot, q31SetOpsAll, q32WindowDistribution,
    q33MapFuncs, q34FoldAssign, q35RangeFrame, q36StringAgg, q38NotIn,
    q39AggFilter, q40Lateral, q41GlobalTopk, q42Having, q43BoolAgg,
    q44MovingWindow, q45StringFuncs2, q46SaltedJoin)
}
