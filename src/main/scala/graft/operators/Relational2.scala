package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.Tables._

/** Second batch of relational surface (SURVEY.md §2.3): generators,
  * array aggregation, math functions, correlated subqueries, exact
  * percentiles, approximate distinct. */
object Relational2 {

  /** Lateral explode with position (the Generator row of §2.3): word
    * tokens of the first 20 documents. */
  val q23ExplodeTokens: Q = Q(
    "q23_explode_tokens",
    """SELECT doc_id,
      |  UNNEST(RANGE(0, LEN(STRING_SPLIT(TRIM(text), ' ')))) AS pos,
      |  UNNEST(STRING_SPLIT(TRIM(text), ' ')) AS token
      |FROM documents
      |WHERE doc_id < 20
      |ORDER BY doc_id, pos""".stripMargin) { (s, d) =>
    documents(s, d)
      .filter(col("doc_id") < 20)
      .select(col("doc_id"),
        posexplode(split(trim(col("text")), " ")).as(Seq("pos", "token")))
      .select(col("doc_id"), col("pos").cast("bigint").as("pos"), col("token"))
      .orderBy("doc_id", "pos")
  }

  /** Array aggregation: sorted distinct order-months per priority +
    * array ops over the result. The list itself is emitted as a
    * canonical comma-joined string (the driver's pandas-based checker
    * cannot sort raw array columns). */
  val q24ArrayAgg: Q = Q(
    "q24_array_agg",
    """SELECT o_orderpriority,
      |  ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT MONTH(o_orderdate))), ',') AS active_months,
      |  LEN(LIST(DISTINCT MONTH(o_orderdate))) AS n_months,
      |  LIST_CONTAINS(LIST(DISTINCT MONTH(o_orderdate)), 12) AS has_december
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    orders(s, d)
      .groupBy("o_orderpriority")
      .agg(sort_array(collect_set(month(col("o_orderdate")).cast("bigint")))
        .as("months"))
      .select(col("o_orderpriority"),
        array_join(transform(col("months"), _.cast("string")), ",")
          .as("active_months"),
        size(col("months")).cast("bigint").as("n_months"),
        array_contains(col("months"), 12L).as("has_december"))
      .orderBy("o_orderpriority")
  }

  /** Math-function battery — only IEEE-exact operations (abs, ceil,
    * floor, sign, mod, least/greatest, sqrt which is correctly rounded)
    * so both engines agree bit-for-bit. */
  val q25MathFuncs: Q = Q(
    "q25_math_funcs",
    """SELECT p_partkey,
      |  ABS(p_retailprice - 1000.0) AS dev,
      |  CAST(CEIL(p_retailprice) AS DOUBLE) AS price_ceil,
      |  CAST(FLOOR(p_retailprice) AS DOUBLE) AS price_floor,
      |  CAST(SIGN(p_retailprice - 1000.0) AS DOUBLE) AS over_1000,
      |  MOD(p_size, 7) AS size_mod,
      |  GREATEST(p_size, 25) AS size_hi,
      |  LEAST(p_size, 25) AS size_lo,
      |  SQRT(CAST(p_size AS DOUBLE)) AS size_sqrt
      |FROM part
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    part(s, d).select(
        col("p_partkey"),
        abs(col("p_retailprice") - 1000.0).as("dev"),
        ceil(col("p_retailprice")).cast("double").as("price_ceil"),
        floor(col("p_retailprice")).cast("double").as("price_floor"),
        signum(col("p_retailprice") - 1000.0).as("over_1000"),
        (col("p_size") % 7).as("size_mod"),
        greatest(col("p_size"), lit(25)).cast("bigint").as("size_hi"),
        least(col("p_size"), lit(25)).cast("bigint").as("size_lo"),
        sqrt(col("p_size").cast("double")).as("size_sqrt"))
      .orderBy("p_partkey")
  }

  /** Correlated scalar subquery (Catalyst decorrelates it into a join):
    * orders above their customer's exact average. Exercises the SQL
    * entry path; the identical text runs on both engines. */
  val q26CorrelatedSubquery: Q = {
    val sql =
      """SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        |FROM orders o
        |WHERE o.o_totalprice > 2 * (
        |  SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o.o_orderkey""".stripMargin
    Q("q26_correlated_subquery", sql) { (s, d) =>
      orders(s, d).createOrReplaceTempView("orders")
      s.sql(sql)
    }
  }

  /** Exact percentiles (sort-based, integer-valued column so the
    * interpolation is IEEE-exact in both engines) + median. */
  val q27Percentiles: Q = Q(
    "q27_percentiles",
    """SELECT p_brand,
      |  QUANTILE_CONT(p_size, 0.25) AS p25,
      |  QUANTILE_CONT(p_size, 0.5) AS p50,
      |  QUANTILE_CONT(p_size, 0.9) AS p90,
      |  MIN(p_size) AS size_min,
      |  MAX(p_size) AS size_max
      |FROM part
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin) { (s, d) =>
    part(s, d)
      .groupBy("p_brand")
      .agg(
        expr("percentile(p_size, 0.25)").as("p25"),
        expr("percentile(p_size, 0.5)").as("p50"),
        expr("percentile(p_size, 0.9)").as("p90"),
        min(col("p_size")).as("size_min"),
        max(col("p_size")).as("size_max"))
      .orderBy("p_brand")
  }

  /** HyperLogLog approximate distinct, fully oracle-checked (the q62
    * pattern): the output carries the EXACT distinct counts (DuckDB
    * reproduces them bit-for-bit) plus `est_ok`, the Spark-computed
    * claim that each sketch estimate lies within 3σ of exact (default
    * rsd 0.05 → 15%; rsd 0.01 → 3%). The oracle emits literal TRUE, so
    * a drifting sketch fails the driver's hash compare. */
  val q28ApproxDistinct: Q = Q(
    "q28_approx_distinct",
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_orderkey) AS n_orders,
      |  COUNT(DISTINCT l_partkey) AS n_parts,
      |  TRUE AS est_ok
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    def ok(est: Column, exact: Column, bound: Double): Column =
      abs(est.cast("double") - exact.cast("double")) <=
        exact.cast("double") * lit(bound)
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"),
        approx_count_distinct(col("l_orderkey")).as("a_orders"),
        approx_count_distinct(col("l_partkey"), rsd = 0.01).as("a_parts"))
      .select(col("l_returnflag"), col("n_orders"), col("n_parts"),
        (ok(col("a_orders"), col("n_orders"), 0.15) &&
          ok(col("a_parts"), col("n_parts"), 0.03)).as("est_ok"))
      .orderBy("l_returnflag")
  }

  /** Session windows in batch (the ST4 session shape): Spark's native
    * session_window vs a gaps-and-islands oracle. Spark merges an event
    * into a session iff ts < last_ts + gap (end-exclusive), so the
    * oracle's island break uses `<` too; session_end = max(ts) + gap. */
  val q29SessionWindow: Q = Q(
    "q29_session_window",
    """WITH marked AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) < INTERVAL 30 MINUTE
      |         THEN 0 ELSE 1 END AS new_sess
      |  FROM events),
      |sess AS (
      |  SELECT user_id, ts, value,
      |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM marked)
      |SELECT user_id, MIN(ts) AS session_start, MAX(ts) + INTERVAL 30 MINUTE AS session_end,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      |FROM sess
      |GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
    events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), dsum(val4(col("value"))).as("total_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n"), col("total_value"))
      .orderBy("user_id", "session_start")
  }

  val all: Seq[Q] = Seq(q23ExplodeTokens, q24ArrayAgg, q25MathFuncs,
    q26CorrelatedSubquery, q27Percentiles, q28ApproxDistinct,
    q29SessionWindow)
}
