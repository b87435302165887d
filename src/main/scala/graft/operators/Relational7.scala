package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.Tables._

/** Seventh relational batch: bitwise/integer scalar ops, null-handling
  * conditionals, and a third character-function battery. All pure
  * per-row codegen'd work over semantics the engines define identically
  * (probed: hex minimal-uppercase, % keeps the dividend sign,
  * least/greatest skip NULLs, instr 1-based with 0 for absent). */
object Relational7 {

  /** Bit arithmetic battery: shifts, and/or/xor masks, hex rendering,
    * signed remainder, sign and absolute value. */
  val q74BitOps: Q = Q(
    "q74_bit_ops",
    """SELECT o_orderkey,
      |  o_orderkey << 3 AS shl,
      |  o_orderkey >> 2 AS shr,
      |  o_orderkey & 255 AS band,
      |  o_orderkey | 255 AS bor,
      |  XOR(o_orderkey, 255) AS bxor,
      |  HEX(o_orderkey) AS hexs,
      |  (o_orderkey - 7500) % 7 AS m7,
      |  CAST(SIGN(o_orderkey - 7500) AS BIGINT) AS sgn,
      |  ABS(o_orderkey - 7500) AS absv
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val k = col("o_orderkey")
    orders(s, d).select(k,
        shiftleft(k, 3).as("shl"),
        shiftright(k, 2).as("shr"),
        k.bitwiseAND(255).as("band"),
        k.bitwiseOR(255).as("bor"),
        k.bitwiseXOR(255).as("bxor"),
        hex(k).as("hexs"),
        ((k - 7500) % 7).as("m7"),
        signum(k - 7500).cast("bigint").as("sgn"),
        abs(k - 7500).as("absv"))
      .orderBy("o_orderkey")
  }

  /** Null-handling conditionals: NULLIF / coalesce-style NVL / NVL2 and
    * NULL-skipping LEAST/GREATEST. */
  val q75Conditional2: Q = Q(
    "q75_conditional2",
    """SELECT c_custkey,
      |  NULLIF(c_mktsegment, 'MACHINERY') AS seg_or_null,
      |  COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'NONE') AS seg_nvl,
      |  CASE WHEN NULLIF(c_mktsegment, 'MACHINERY') IS NOT NULL
      |       THEN 'other' ELSE 'machinery' END AS seg_nvl2,
      |  CAST(LEAST(NULLIF(c_nationkey, 5), 3) AS BIGINT) AS least_skipnull,
      |  CAST(GREATEST(NULLIF(c_nationkey, 5), 3) AS BIGINT) AS greatest_skipnull
      |FROM customer
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val segOrNull = nullif(col("c_mktsegment"), lit("MACHINERY"))
    customer(s, d).select(col("c_custkey"),
        segOrNull.as("seg_or_null"),
        coalesce(segOrNull, lit("NONE")).as("seg_nvl"),
        when(segOrNull.isNotNull, "other").otherwise("machinery")
          .as("seg_nvl2"),
        least(nullif(col("c_nationkey"), lit(5)), lit(3))
          .cast("bigint").as("least_skipnull"),
        greatest(nullif(col("c_nationkey"), lit(5)), lit(3))
          .cast("bigint").as("greatest_skipnull"))
      .orderBy("c_custkey")
  }

  /** Character battery three: digest, fixed-width slices, 1-based
    * substring search, code points, separator concat. */
  val q76CharFuncs: Q = Q(
    "q76_char_funcs",
    """SELECT p_partkey,
      |  MD5(p_name) AS name_md5,
      |  LEFT(p_name, 3) AS l3,
      |  RIGHT(p_name, 3) AS r3,
      |  CAST(INSTR(p_name, 'o') AS BIGINT) AS pos_o,
      |  CAST(ASCII(p_name) AS BIGINT) AS first_code,
      |  CHR(CAST(65 + p_partkey % 26 AS INTEGER)) AS letter,
      |  CONCAT_WS('-', p_brand, p_type) AS brand_type
      |FROM part
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    part(s, d).select(col("p_partkey"),
        md5(col("p_name")).as("name_md5"),
        expr("left(p_name, 3)").as("l3"),
        expr("right(p_name, 3)").as("r3"),
        instr(col("p_name"), "o").cast("bigint").as("pos_o"),
        ascii(col("p_name")).cast("bigint").as("first_code"),
        chr(lit(65) + col("p_partkey") % 26).as("letter"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"))
      .orderBy("p_partkey")
  }

  /** Multiple DISTINCT aggregates over different columns in ONE
    * aggregation — Catalyst rewrites this with an Expand (one row
    * replica per distinct group), the standard single-pass plan; the
    * alternative (N self-joined single-distinct aggs) rescans the fact
    * table N times. */
  val q77MultiDistinct: Q = Q(
    "q77_multi_distinct",
    """SELECT o_orderpriority,
      |  COUNT(*) AS n,
      |  COUNT(DISTINCT o_custkey) AS n_customers,
      |  COUNT(DISTINCT CAST(YEAR(o_orderdate) AS BIGINT)) AS n_years,
      |  COUNT(DISTINCT o_orderstatus) AS n_statuses
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    orders(s, d).groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("o_custkey")).as("n_customers"),
        countDistinct(year(col("o_orderdate")).cast("bigint")).as("n_years"),
        countDistinct(col("o_orderstatus")).as("n_statuses"))
      .orderBy("o_orderpriority")
  }

  /** Recursive CTE (hierarchy walk — Spark 4 finally speaks WITH
    * RECURSIVE): each seed key walks its binary-ancestor chain
    * k → ⌊k/2⌋ down to 1, aggregating depth and path sum. One SQL text
    * runs on both engines; the halving is FLOOR(k/2.0) because bare
    * integer `/` differs across engines (DuckDB yields DOUBLE). The
    * iterative-DataFrame twin of this shape is
    * [[Dedup.connectedComponents]]. */
  val q78RecursiveCte: Q = {
    val sql =
      """WITH RECURSIVE chain(start_key, k, depth) AS (
        |  SELECT o_orderkey, o_orderkey, 0 FROM orders WHERE o_orderkey < 50
        |  UNION ALL
        |  SELECT start_key, CAST(FLOOR(k / 2.0) AS BIGINT), depth + 1
        |  FROM chain WHERE k > 1)
        |SELECT start_key,
        |  CAST(MAX(depth) AS BIGINT) AS chain_len,
        |  CAST(SUM(k) AS BIGINT) AS key_sum
        |FROM chain
        |GROUP BY start_key
        |ORDER BY start_key""".stripMargin
    Q("q78_recursive_cte", sql) { (s, d) =>
      orders(s, d).createOrReplaceTempView("orders")
      s.sql(sql)
    }
  }

  val all: Seq[Q] = Seq(q74BitOps, q75Conditional2, q76CharFuncs,
    q77MultiDistinct, q78RecursiveCte)
}
