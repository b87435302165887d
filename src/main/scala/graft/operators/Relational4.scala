package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.Tables._

/** Fourth relational batch (round 2): unpivot, uncorrelated scalar +
  * EXISTS subqueries, deterministic stratified sampling, and IGNORE NULLS
  * window navigation. */
object Relational4 {

  /** Wide→long unpivot (the inverse of q30's pivot). Both engines see
    * pre-aliased source columns so the emitted `metric` labels match. */
  val q47Unpivot: Q = Q(
    "q47_unpivot",
    """SELECT p_partkey, metric, value FROM (
      |  SELECT p_partkey, p_retailprice::DOUBLE AS retailprice,
      |         p_size::DOUBLE AS size
      |  FROM part) UNPIVOT (value FOR metric IN (retailprice, size))
      |ORDER BY p_partkey, metric""".stripMargin) { (s, d) =>
    part(s, d)
      .select(col("p_partkey"),
        col("p_retailprice").cast("double").as("retailprice"),
        col("p_size").cast("double").as("size"))
      .unpivot(Array(col("p_partkey")),
        Array(col("retailprice"), col("size")), "metric", "value")
      .orderBy("p_partkey", "metric")
  }

  /** Uncorrelated scalar subquery + correlated EXISTS in one predicate —
    * the SQL entry path (identical text runs on both engines). Catalyst
    * plans the scalar as a broadcast one-row join and EXISTS as a
    * left-semi join. */
  val q48ExistsScalar: Q = {
    val sql =
      """SELECT c.c_custkey, c.c_acctbal
        |FROM customer c
        |WHERE c.c_acctbal > (
        |    SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |    FROM customer c2)
        |  AND EXISTS (
        |    SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c.c_custkey""".stripMargin
    Q("q48_exists_scalar", sql) { (s, d) =>
      customer(s, d).createOrReplaceTempView("customer")
      orders(s, d).createOrReplaceTempView("orders")
      s.sql(sql)
    }
  }

  /** Deterministic stratified sampling: per-stratum rates applied via
    * Knuth multiplicative hashing of the key — reproducible on any
    * engine, stable under repartitioning, and a pure per-row filter (no
    * shuffle before the verifying aggregation). The training-pipeline
    * counterpart of q34's global folds. */
  val q49StratifiedSample: Q = Q(
    "q49_stratified_sample",
    """WITH hashed AS (
      |  SELECT doc_id, lang, ((doc_id * 2654435761) % 4294967296) AS h
      |  FROM documents),
      |sampled AS (
      |  SELECT * FROM hashed
      |  WHERE h < CASE WHEN lang = 'en' THEN 2147483648 ELSE 429496729 END)
      |SELECT lang, COUNT(*) AS n_sampled, MIN(doc_id) AS min_id,
      |  MAX(doc_id) AS max_id
      |FROM sampled
      |GROUP BY lang
      |ORDER BY lang""".stripMargin) { (s, d) =>
    documents(s, d)
      .select(col("doc_id"), col("lang"),
        ((col("doc_id") * 2654435761L) % 4294967296L).as("h"))
      // 50% of en docs, 10% of the rest — all integer arithmetic
      .filter(col("h") < when(col("lang") === "en", 2147483648L)
        .otherwise(429496729L))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_sampled"), min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"))
      .orderBy("lang")
  }

  /** IGNORE NULLS window navigation: per customer, the most recent urgent
    * order so far (running last_value over a sparse event column). */
  val q50IgnoreNulls: Q = Q(
    "q50_ignore_nulls",
    """SELECT o_custkey, o_orderkey,
      |  LAST_VALUE(CASE WHEN o_orderpriority = '1-URGENT' THEN o_orderkey END IGNORE NULLS)
      |    OVER (PARTITION BY o_custkey ORDER BY o_orderkey
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_urgent_key
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        last(when(col("o_orderpriority") === "1-URGENT", col("o_orderkey")),
          ignoreNulls = true).over(w).as("last_urgent_key"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Pure range join (no equi key): lineitems shipped inside each urgent
    * order's 7-day window, against ALL lineitems. Routed through
    * [[Joins.binnedRangeJoin]] — a bin-bucketed HASH join — while the
    * oracle states the plain theta join. Interval owners with zero
    * matches are restored by a left join (count stays 0). */
  val q51RangeBinJoin: Q = Q(
    "q51_range_bin_join",
    """SELECT o.o_orderkey, COUNT(l.l_orderkey) AS n_shipped
      |FROM orders o
      |LEFT JOIN lineitem l
      |  ON l.l_shipdate >= o.o_orderdate
      | AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY
      |WHERE o.o_orderpriority = '1-URGENT' AND o.o_orderkey < 2000
      |GROUP BY o.o_orderkey
      |ORDER BY o.o_orderkey""".stripMargin) { (s, d) =>
    val epoch = lit("1970-01-01")
    val ivals = orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderkey") < 2000)
      .select(col("o_orderkey"),
        datediff(col("o_orderdate"), epoch).cast("long").as("s"))
      .withColumn("e", col("s") + 7)
    val points = lineitem(s, d)
      .select(datediff(col("l_shipdate"), epoch).cast("long").as("p"))
    val counts = Joins.binnedRangeJoin(ivals, points, "p", "s", "e", binWidth = 7)
      .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
    ivals.select("o_orderkey")
      .join(counts, Seq("o_orderkey"), "left")
      .select(col("o_orderkey"),
        coalesce(col("n"), lit(0L)).as("n_shipped"))
      .orderBy("o_orderkey")
  }

  /** Approximate percentiles (Greenwald-Khanna sketch): mergeable,
    * bounded-memory, single pass — the at-scale substitute for q27's
    * exact sort-based percentiles. Sketch results are
    * algorithm-specific → rows-only driver check; the spec bounds the
    * rank error against the exact values. */
  val q52ApproxQuantile: Q = Q.noOracle("q52_approx_quantile") { (s, d) =>
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        expr("approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), 1000)")
          .as("price_quantiles"),
        expr("approx_percentile(l_quantity, 0.5, 1000)").as("qty_median"))
      .orderBy("l_returnflag")
  }

  val all: Seq[Q] = Seq(q47Unpivot, q48ExistsScalar, q49StratifiedSample,
    q50IgnoreNulls, q51RangeBinJoin, q52ApproxQuantile)
}
