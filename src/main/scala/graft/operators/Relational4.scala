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
    * counterpart of q34's global folds. Key reduced mod 2²⁶ before the
    * multiply so the product can never overflow BIGINT (see
    * [[Relational3.q34FoldAssign]] — found by the sf1 scale run);
    * identity at every driver SF. */
  val q49StratifiedSample: Q = Q(
    "q49_stratified_sample",
    """WITH hashed AS (
      |  SELECT doc_id, lang, (((doc_id % 67108864) * 2654435761) % 4294967296) AS h
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
        (col("doc_id") % 67108864L * 2654435761L % 4294967296L).as("h"))
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
    * exact sort-based percentiles.
    *
    * Fully oracle-checked (the q62 pattern): the output carries EXACT
    * discrete percentiles — `percentile_disc` picks a real data value
    * (no cross-engine float interpolation; DECIMAL→DOUBLE is exact at
    * cent granularity) and both engines implement the same Postgres
    * definition (smallest value with cume_dist ≥ q) — plus `approx_ok`,
    * the Spark-computed claim that every GK estimate's rank lies within
    * ε·n (ε = 1/accuracy = 0.001, +1 slack for ceiling semantics) of
    * its target rank. Rank-of-estimate is computed by a broadcast join
    * of the 5-row estimate relation back onto lineitem — one extra
    * scan, no shuffle of the fact side. The oracle emits literal TRUE,
    * so a sketch whose rank error exceeds its guarantee hash-fails. */
  val q52ApproxQuantile: Q = Q(
    "q52_approx_quantile",
    """SELECT l_returnflag, COUNT(*) AS n,
      |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice) AS DOUBLE) AS price_p50,
      |  CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY l_extendedprice) AS DOUBLE) AS price_p90,
      |  CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY l_extendedprice) AS DOUBLE) AS price_p99,
      |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE) AS qty_median,
      |  TRUE AS approx_ok
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    val li = lineitem(s, d).select(
      col("l_returnflag"),
      col("l_extendedprice").cast("double").as("price"),
      col("l_quantity").cast("double").as("qty"))
    val est = li.groupBy("l_returnflag").agg(
      count(lit(1)).as("n"),
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY price)")
        .as("price_p50"),
      expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY price)")
        .as("price_p90"),
      expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY price)")
        .as("price_p99"),
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY qty)")
        .as("qty_median"),
      expr("approx_percentile(price, 0.5, 1000)").as("a50"),
      expr("approx_percentile(price, 0.9, 1000)").as("a90"),
      expr("approx_percentile(price, 0.99, 1000)").as("a99"),
      expr("approx_percentile(qty, 0.5, 1000)").as("aq50"))
    // rank of each GK estimate: one conditional-count pass over the
    // fact table against the broadcast 5-row estimate relation
    val ranks = li
      .join(broadcast(est.select("l_returnflag", "a50", "a90", "a99", "aq50")),
        Seq("l_returnflag"))
      .groupBy("l_returnflag")
      .agg(
        sum(when(col("price") < col("a50"), 1L).otherwise(0L)).as("lt50"),
        sum(when(col("price") <= col("a50"), 1L).otherwise(0L)).as("le50"),
        sum(when(col("price") < col("a90"), 1L).otherwise(0L)).as("lt90"),
        sum(when(col("price") <= col("a90"), 1L).otherwise(0L)).as("le90"),
        sum(when(col("price") < col("a99"), 1L).otherwise(0L)).as("lt99"),
        sum(when(col("price") <= col("a99"), 1L).otherwise(0L)).as("le99"),
        sum(when(col("qty") < col("aq50"), 1L).otherwise(0L)).as("ltq"),
        sum(when(col("qty") <= col("aq50"), 1L).otherwise(0L)).as("leq"))
    // GK guarantee at accuracy 1000: the returned value's rank interval
    // [rank_lt+1, rank_le] intersects [⌈(q-ε)n⌉, ⌈(q+ε)n⌉], ε = 0.001
    def okq(lt: String, le: String, q: Double): Column = {
      val n = col("n").cast("double")
      (col(lt).cast("double") <= n * lit(q + 0.001) + lit(1.0)) &&
        (col(le).cast("double") >= n * lit(q - 0.001) - lit(1.0))
    }
    est.join(broadcast(ranks), Seq("l_returnflag"))
      .select(col("l_returnflag"), col("n"),
        col("price_p50"), col("price_p90"), col("price_p99"),
        col("qty_median"),
        (okq("lt50", "le50", 0.5) && okq("lt90", "le90", 0.9) &&
          okq("lt99", "le99", 0.99) && okq("ltq", "leq", 0.5))
          .as("approx_ok"))
      .orderBy("l_returnflag")
  }

  /** Explicit NULLS FIRST/LAST ordering semantics — the engines DISAGREE
    * on defaults (Spark: nulls first ASC; DuckDB: nulls last), so ranks
    * computed over a nullable sort key only match when the placement is
    * stated. December months are nulled to create the nullable key. */
  val q53NullOrdering: Q = Q(
    "q53_null_ordering",
    """SELECT o_orderkey, m,
      |  ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      |    ORDER BY m ASC NULLS FIRST, o_orderkey) AS rn_nf,
      |  ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      |    ORDER BY m DESC NULLS LAST, o_orderkey) AS rn_nl
      |FROM (SELECT o_orderkey, o_orderpriority,
      |        NULLIF(CAST(MONTH(o_orderdate) AS BIGINT), 12) AS m
      |      FROM orders)
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val base = orders(s, d).select(col("o_orderkey"), col("o_orderpriority"),
      nullif(month(col("o_orderdate")).cast("bigint"), lit(12L)).as("m"))
    val wNf = Window.partitionBy("o_orderpriority")
      .orderBy(col("m").asc_nulls_first, col("o_orderkey"))
    val wNl = Window.partitionBy("o_orderpriority")
      .orderBy(col("m").desc_nulls_last, col("o_orderkey"))
    base.select(col("o_orderkey"), col("m"),
        row_number().over(wNf).cast("bigint").as("rn_nf"),
        row_number().over(wNl).cast("bigint").as("rn_nl"))
      .orderBy("o_orderkey")
  }

  /** Exact decimal money arithmetic: +, −, × over DECIMAL with pinned
    * result types. The inputs are parquet DOUBLEs, and a direct
    * double→decimal CAST is NOT portable (Spark rounds the shortest
    * string repr HALF_UP; DuckDB rounds the binary value), so the
    * decimalization step is the portable fixed-point idiom
    * `floor(x·100 + 0.5)` — identical IEEE ops on both engines — and
    * everything after is exact integer/decimal arithmetic. The final
    * columns leave the query as DOUBLE: both engines round the same
    * exact decimal value to the nearest double, so the values are
    * bit-identical, whereas DECIMAL-typed output serializes
    * differently (Spark parquet decimal vs DuckDB decimal128) and
    * breaks value-level hashing even when every value is equal. */
  val q54DecimalMath: Q = Q(
    "q54_decimal_math",
    """SELECT l_orderkey, l_linenumber,
      |  CAST(CAST((pc + tc) * 0.01 AS DECIMAL(20,2)) AS DOUBLE) AS add2,
      |  CAST(CAST((pc - dc) * 0.01 AS DECIMAL(20,2)) AS DOUBLE) AS sub2,
      |  CAST(CAST((pc * dc) * 0.0001 AS DECIMAL(30,4)) AS DOUBLE) AS mul4
      |FROM (SELECT l_orderkey, l_linenumber,
      |        CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS pc,
      |        CAST(FLOOR(l_tax * 100 + 0.5) AS BIGINT) AS tc,
      |        CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) AS dc
      |      FROM lineitem)
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    def cents(c: Column): Column =
      floor(c * lit(100d) + lit(0.5d)).cast("bigint")
    val tick2 = lit(BigDecimal("0.01"))
    val tick4 = lit(BigDecimal("0.0001"))
    lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        cents(col("l_extendedprice")).as("pc"),
        cents(col("l_tax")).as("tc"),
        cents(col("l_discount")).as("dc"))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        ((col("pc") + col("tc")) * tick2).cast("decimal(20,2)")
          .cast("double").as("add2"),
        ((col("pc") - col("dc")) * tick2).cast("decimal(20,2)")
          .cast("double").as("sub2"),
        ((col("pc") * col("dc")) * tick4).cast("decimal(30,4)")
          .cast("double").as("mul4"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  val all: Seq[Q] = Seq(q47Unpivot, q48ExistsScalar, q49StratifiedSample,
    q50IgnoreNulls, q51RangeBinJoin, q52ApproxQuantile, q53NullOrdering,
    q54DecimalMath)
}
