package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.Tables._

/** Fifth relational batch (round 2): regex scalar functions, exact
  * distribution moments (stddev/correlation via decimal sums), date-spine
  * gap filling, bitwise aggregates, GROUPING flags, JSON struct
  * serialization, and arg-min/max aggregates. */
object Relational5 {

  /** Regex battery over the Java-regex ∩ RE2 subset (character classes,
    * groups, anchors, bounded repeats — no lookarounds/backrefs, which
    * RE2 lacks): extract with group index, boolean match, global
    * replace. Pure per-row codegen'd work. */
  val q55Regexp: Q = Q(
    "q55_regexp",
    """SELECT p_partkey,
      |  CAST(REGEXP_EXTRACT(p_brand, 'Brand#([0-9]+)', 1) AS BIGINT) AS brand_num,
      |  REGEXP_EXTRACT(p_name, '^([a-z]+)', 1) AS first_word,
      |  REGEXP_MATCHES(p_name, '[aeiou]$') AS vowel_end,
      |  REGEXP_REPLACE(p_name, '[aeiou]', '*', 'g') AS masked
      |FROM part
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    part(s, d).select(
        col("p_partkey"),
        regexp_extract(col("p_brand"), "Brand#([0-9]+)", 1)
          .cast("bigint").as("brand_num"),
        regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_word"),
        col("p_name").rlike("[aeiou]$").as("vowel_end"),
        regexp_replace(col("p_name"), "[aeiou]", "*").as("masked"))
      .orderBy("p_partkey")
  }

  /** Distribution moments with deterministic float behavior: all sums
    * (Σx, Σx², Σxy) accumulate in exact DECIMAL (order-independent), and
    * variance/stddev/correlation are then a fixed sequence of IEEE double
    * ops mirrored token-for-token in the oracle. sqrt is correctly
    * rounded by IEEE, so it preserves bit equality. This is the at-scale
    * shape too: one map-side-combined aggregation, no second pass. */
  val q56StatsMoments: Q = Q(
    "q56_stats_moments",
    // moments as exact INTEGER-cents sums; big HUGEINT→DOUBLE casts
    // route through varchar (strtod) because DuckDB's direct cast
    // mis-rounds ~0.6% of integers past 2⁵³ — caught by the r10 sf1
    // oracle sweep as a 1-ulp corr divergence (the q118 finding; scaled
    // DECIMAL→DOUBLE double-rounds on BOTH engines, so the conversion
    // happens from scale-0 integers only)
    """WITH m AS (
      |  SELECT l_returnflag,
      |    COUNT(*) AS n,
      |    CAST(CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT))::HUGEINT AS VARCHAR) AS DOUBLE) AS sx,
      |    CAST(CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)::HUGEINT * CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT))::HUGEINT AS VARCHAR) AS DOUBLE) AS sxx,
      |    CAST(CAST(SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT))::HUGEINT AS VARCHAR) AS DOUBLE) AS sy,
      |    CAST(CAST(SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)::HUGEINT * CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT))::HUGEINT AS VARCHAR) AS DOUBLE) AS syy,
      |    CAST(CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)::HUGEINT * CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT))::HUGEINT AS VARCHAR) AS DOUBLE) AS sxy
      |  FROM lineitem
      |  GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |  sx / n / 100.0::DOUBLE AS mean_price,
      |  SQRT((sxx - (sx * sx) / n) / (n - 1)) / 100.0::DOUBLE AS std_price,
      |  ((sxy - (sx * sy) / n) / (n - 1)) /
      |    (SQRT((sxx - (sx * sx) / n) / (n - 1)) * SQRT((syy - (sy * sy) / n) / (n - 1))) AS corr_price_qty
      |FROM m
      |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val x = floor(col("l_extendedprice") * 100.0 + 0.5).cast("long").cast(dec38)
    val y = floor(col("l_quantity") * 100.0 + 0.5).cast("long").cast(dec38)
    val m = lineitem(s, d).groupBy("l_returnflag").agg(
      count(lit(1)).as("n"),
      sum(x).cast("double").as("sx"),
      sum(x * x).cast("double").as("sxx"),
      sum(y).cast("double").as("sy"),
      sum(y * y).cast("double").as("syy"),
      sum(x * y).cast("double").as("sxy"))
    val n = col("n"); val sx = col("sx"); val sxx = col("sxx")
    val sy = col("sy"); val syy = col("syy"); val sxy = col("sxy")
    val varX = (sxx - (sx * sx) / n) / (n - 1)
    val varY = (syy - (sy * sy) / n) / (n - 1)
    m.select(col("l_returnflag"), n,
        (sx / n / 100.0).as("mean_price"),
        (sqrt(varX) / 100.0).as("std_price"),
        (((sxy - (sx * sy) / n) / (n - 1)) / (sqrt(varX) * sqrt(varY)))
          .as("corr_price_qty"))
      .orderBy("l_returnflag")
  }

  /** Date-spine gap filling: generate the full day range between the
    * observed min/max order dates (computed, not hard-coded) and
    * left-join daily order counts — days with no orders surface as 0.
    * The spine is driver-cheap (one agg row → sequence) and the count
    * side is a single hash aggregation. */
  val q57DateSpine: Q = Q(
    "q57_date_spine",
    """WITH bounds AS (
      |  SELECT MIN(CAST(o_orderdate AS DATE)) AS mn,
      |         MAX(CAST(o_orderdate AS DATE)) AS mx
      |  FROM orders),
      |spine AS (
      |  SELECT CAST(UNNEST(GENERATE_SERIES(mn, mx, INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM bounds),
      |daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n
      |  FROM orders GROUP BY 1)
      |SELECT spine.day, CAST(COALESCE(daily.n, 0) AS BIGINT) AS n_orders
      |FROM spine LEFT JOIN daily ON daily.day = spine.day
      |ORDER BY spine.day""".stripMargin) { (s, d) =>
    val o = orders(s, d)
    val spine = o.agg(min(col("o_orderdate").cast("date")).as("mn"),
        max(col("o_orderdate").cast("date")).as("mx"))
      .select(explode(expr("sequence(mn, mx, interval 1 day)")).as("day"))
    val daily = o.groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
    spine.join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("n"), lit(0L)).as("n_orders"))
      .orderBy("day")
  }

  /** Bitwise aggregates (AND/OR/XOR over a key column) — fully
    * associative/commutative, so map-side partial aggregation is exact
    * at any parallelism. */
  val q58BitAgg: Q = Q(
    "q58_bit_agg",
    """SELECT o_orderpriority,
      |  CAST(BIT_AND(o_orderkey) AS BIGINT) AS key_and,
      |  CAST(BIT_OR(o_orderkey) AS BIGINT) AS key_or,
      |  CAST(BIT_XOR(o_orderkey) AS BIGINT) AS key_xor
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    orders(s, d).groupBy("o_orderpriority")
      .agg(expr("bit_and(o_orderkey)").cast("bigint").as("key_and"),
        expr("bit_or(o_orderkey)").cast("bigint").as("key_or"),
        expr("bit_xor(o_orderkey)").cast("bigint").as("key_xor"))
      .orderBy("o_orderpriority")
  }

  /** GROUPING() flags over a CUBE: distinguishes "NULL because
    * aggregated away" from data nulls — the flags (not label coalescing)
    * are the portable way to consume cube output. */
  val q59GroupingId: Q = Q(
    "q59_grouping_id",
    """SELECT COALESCE(o_orderpriority, '<all>') AS prio,
      |  COALESCE(CAST(YEAR(o_orderdate) AS BIGINT), -1) AS yr,
      |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
      |  CAST(GROUPING(YEAR(o_orderdate)) AS BIGINT) AS g_yr,
      |  COUNT(*) AS n
      |FROM orders
      |GROUP BY CUBE(o_orderpriority, YEAR(o_orderdate))
      |ORDER BY prio, yr, g_prio, g_yr""".stripMargin) { (s, d) =>
    orders(s, d)
      .withColumn("yr0", year(col("o_orderdate")).cast("bigint"))
      .cube(col("o_orderpriority"), col("yr0"))
      .agg(grouping(col("o_orderpriority")).cast("bigint").as("g_prio"),
        grouping(col("yr0")).cast("bigint").as("g_yr"),
        count(lit(1)).as("n"))
      .select(coalesce(col("o_orderpriority"), lit("<all>")).as("prio"),
        coalesce(col("yr0"), lit(-1L)).as("yr"),
        col("g_prio"), col("g_yr"), col("n"))
      .orderBy("prio", "yr", "g_prio", "g_yr")
  }

  /** Struct → canonical JSON serialization (the checker-safe way to emit
    * nested output). Field order is declaration order in both engines;
    * all fields are non-null (Spark's to_json DROPS null fields while
    * DuckDB keeps them, so nulls are coalesced before packing). */
  val q60StructJson: Q = Q(
    "q60_struct_json",
    """SELECT o_orderkey,
      |  TO_JSON(STRUCT_PACK(
      |    key := o_orderkey,
      |    prio := o_orderpriority,
      |    yr := CAST(YEAR(o_orderdate) AS BIGINT),
      |    cents := CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
      |  )) AS doc
      |FROM orders
      |WHERE o_orderkey < 500
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    orders(s, d)
      .filter(col("o_orderkey") < 500)
      .select(col("o_orderkey"),
        to_json(struct(
          col("o_orderkey").as("key"),
          col("o_orderpriority").as("prio"),
          year(col("o_orderdate")).cast("bigint").as("yr"),
          (money(col("o_totalprice")) * 100).cast("bigint").as("cents")))
          .as("doc"))
      .orderBy("o_orderkey")
  }

  /** arg-min/max aggregates: the order row realizing an extreme of a
    * DETERMINISTIC sort key (date then orderkey packed into one BIGINT —
    * ties are impossible, so both engines pick the same row). One hash
    * aggregation; the 100 TB shape of "latest record per key". */
  val q61ArgMinMax: Q = Q(
    "q61_argminmax",
    """WITH k AS (
      |  SELECT o_custkey, o_orderkey,
      |    CAST(DATEDIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) * 10000000 + o_orderkey AS sk
      |  FROM orders)
      |SELECT o_custkey,
      |  ARG_MAX(o_orderkey, sk) AS latest_order,
      |  ARG_MIN(o_orderkey, sk) AS first_order,
      |  COUNT(*) AS n_orders
      |FROM k
      |GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin) { (s, d) =>
    val sk = datediff(col("o_orderdate").cast("date"), lit("1970-01-01"))
      .cast("bigint") * 10000000L + col("o_orderkey")
    orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), sk.as("sk"))
      .groupBy("o_custkey")
      .agg(max_by(col("o_orderkey"), col("sk")).as("latest_order"),
        min_by(col("o_orderkey"), col("sk")).as("first_order"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_custkey")
  }

  /** Mergeable sketch states (the ClickHouse `-State`/`-Merge`
    * combinator shape): per-group HLL sketches built in one pass, then
    * RE-aggregated by unioning the serialized states — the rollup never
    * rescans the fact table. This is the 100 TB pre-aggregation
    * pattern: store states at fine grain, merge to any coarser grain.
    *
    * Fully oracle-checked (r04 item): the output carries the EXACT
    * distinct counts (which DuckDB reproduces bit-for-bit) plus
    * `est_ok`, the Spark-computed claim that the sketch estimate —
    * including the `<all>` row's union-of-states estimate — lies within
    * 3% of exact (lgK=14 → rsd ≈ 0.8%, so 3% is > 3σ). The oracle emits
    * literal TRUE, so a drifting sketch fails the driver's hash
    * compare; JoinsSpec additionally asserts union-of-states ≡
    * direct whole-table sketch, the merge-algebra identity itself. */
  val q62HllUnion: Q = Q(
    "q62_hll_union",
    """WITH pg AS (
      |  SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_distinct
      |  FROM orders GROUP BY 1),
      |al AS (
      |  SELECT '<all>' AS o_orderpriority, COUNT(DISTINCT o_custkey) AS n_distinct
      |  FROM orders)
      |SELECT o_orderpriority, n_distinct, TRUE AS est_ok FROM pg
      |UNION ALL
      |SELECT o_orderpriority, n_distinct, TRUE AS est_ok FROM al
      |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    def ok(est: Column, exact: Column): Column =
      abs(est.cast("double") - exact) <= exact * lit(0.03)
    val o = orders(s, d).select("o_orderpriority", "o_custkey")
    val states = o.groupBy("o_orderpriority")
      .agg(hll_sketch_agg(col("o_custkey"), lit(14)).as("state"),
        countDistinct(col("o_custkey")).as("n_distinct"))
    val perGroup = states.select(col("o_orderpriority"), col("n_distinct"),
      ok(hll_sketch_estimate(col("state")), col("n_distinct")).as("est_ok"))
    // the global row exercises the MERGE: estimate from unioned states,
    // exact from a direct distinct over the base (1-row ⋈ 1-row attach)
    val globalEst = states
      .agg(hll_sketch_estimate(hll_union_agg(col("state"), lit(false)))
        .as("est"))
      .withColumn("__k", lit(1))
    val globalExact = o.agg(countDistinct(col("o_custkey")).as("n_distinct"))
      .withColumn("__k", lit(1))
    val global = globalEst.join(globalExact, "__k")
      .select(lit("<all>").as("o_orderpriority"), col("n_distinct"),
        ok(col("est"), col("n_distinct")).as("est_ok"))
    perGroup.unionByName(global).orderBy("o_orderpriority")
  }

  val all: Seq[Q] = Seq(q55Regexp, q56StatsMoments, q57DateSpine, q58BitAgg,
    q59GroupingId, q60StructJson, q61ArgMinMax, q62HllUnion)
}
