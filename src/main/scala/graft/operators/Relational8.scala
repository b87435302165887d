package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.Tables._

/** Round-3 relational additions: TOP-N WITH TIES semantics and the
  * bucketed-table co-located join — the storage-level answer to
  * shuffle-free fact joins at 100 TB. */
object Relational8 {

  /** FETCH FIRST n WITH TIES per group: rank() (not row_number) keeps
    * every row tied with the n-th — the semantics ANSI WITH TIES
    * prescribes. Catalyst still plans the two-phase WindowGroupLimit
    * (rank filters push into the shuffle), so ties cost nothing extra. */
  val q83RankWithTies: Q = Q(
    "q83_rank_with_ties",
    """SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rnk AS BIGINT) AS rnk
      |FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    RANK() OVER (PARTITION BY o_orderpriority
      |      ORDER BY o_totalprice DESC) AS rnk
      |  FROM orders)
      |WHERE rnk <= 10
      |ORDER BY o_orderpriority, rnk, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc)
    orders(s, d)
      .withColumn("rnk", rank().over(w).cast("bigint"))
      .filter(col("rnk") <= 10)
      .select("o_orderpriority", "o_orderkey", "o_totalprice", "rnk")
      .orderBy("o_orderpriority", "rnk", "o_orderkey")
  }

  /** Bucketed co-located join as a DRIVER-CHECKED query (the registry
    * face of [[graft.sources.Bucketing]], whose spec already asserts the
    * zero-Exchange plan): orders and customer land `bucketBy(8, custkey)`
    * + sorted, then join bucket-to-bucket with no exchange on either
    * side — the physical layout IS the partitioning, which at 100 TB
    * turns every repeated fact⋈dim join on the bucket key into a
    * zero-shuffle merge. The write happens once per session per scale
    * factor (first call lays the tables down; reruns hit the catalog).
    * `PlanShapeSpec` asserts the exchange-free join subtree here too.
    */
  /** Land the bucketed orders/customer tables for `d` if this session
    * hasn't yet (first call writes; reruns hit the catalog). Exposed so
    * Bench can do the one-time layout in its UNTIMED warmup — the
    * benchmark should time the co-located join, not the landing write.
    * Returns the (orders, customer) table names. */
  def ensureBucketedTables(s: org.apache.spark.sql.SparkSession,
      d: String): (String, String) = {
    val suffix = d.replaceAll("[^A-Za-z0-9]", "_")
    val oTbl = s"graft_orders_bkt_$suffix"
    val cTbl = s"graft_customer_bkt_$suffix"
    // check BOTH tables: a partial failure between the two writes must
    // not latch a half-registered state for the rest of the session
    if (!s.catalog.tableExists(oTbl) || !s.catalog.tableExists(cTbl)) {
      // a previous JVM may have left the managed location behind while
      // this session's in-memory catalog has no table entry — clear it,
      // or saveAsTable refuses with LOCATION_ALREADY_EXISTS
      val wh = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"))
      val fs = wh.getFileSystem(s.sparkContext.hadoopConfiguration)
      Seq(oTbl, cTbl).foreach { t =>
        val p = new org.apache.hadoop.fs.Path(wh, t)
        if (fs.exists(p)) fs.delete(p, true)
      }
      graft.sources.Bucketing.writeBucketed(orders(s, d), oTbl, "o_custkey", 8)
      graft.sources.Bucketing.writeBucketed(customer(s, d), cTbl, "c_custkey", 8)
    }
    (oTbl, cTbl)
  }

  val q84BucketedJoin: Q = Q(
    "q84_bucketed_join",
    """SELECT c.c_mktsegment, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |GROUP BY 1
      |ORDER BY 1""".stripMargin) { (s, d) =>
    val (oTbl, cTbl) = ensureBucketedTables(s, d)
    val o = s.table(oTbl); val c = s.table(cTbl)
    o.join(c, col("c_custkey") === col("o_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        dsum(money(col("o_totalprice"))).as("revenue"))
      .orderBy("c_mktsegment")
  }

  /** Interval-overlap self-join, partitioned by a carrying key: pairs of
    * a customer's 7-day order windows that overlap. The equi-key join
    * (custkey) carries the quadratic part — per-customer order counts
    * are bounded (tens), so each key's pair space is tiny while the
    * plan stays a plain hash join at any corpus size; there is NO
    * unkeyed interval join here. Exact date arithmetic throughout. */
  val q85IntervalOverlap: Q = Q(
    "q85_interval_overlap",
    """SELECT a.o_custkey AS custkey,
      |  a.o_orderkey AS a_key, b.o_orderkey AS b_key,
      |  CAST(DATE_DIFF('day', b.o_orderdate, a.o_orderdate + INTERVAL 7 DAY) AS BIGINT)
      |    AS overlap_days
      |FROM orders a JOIN orders b
      |  ON a.o_custkey = b.o_custkey
      | AND a.o_orderkey < b.o_orderkey
      | AND b.o_orderdate < a.o_orderdate + INTERVAL 7 DAY
      | AND a.o_orderdate <= b.o_orderdate
      |ORDER BY custkey, a_key, b_key""".stripMargin) { (s, d) =>
    val a = orders(s, d).as("a"); val b = orders(s, d).as("b")
    a.join(b,
        col("a.o_custkey") === col("b.o_custkey") &&
          col("a.o_orderkey") < col("b.o_orderkey") &&
          col("b.o_orderdate") < col("a.o_orderdate") + expr("INTERVAL 7 DAY") &&
          col("a.o_orderdate") <= col("b.o_orderdate"))
      .select(col("a.o_custkey").as("custkey"),
        col("a.o_orderkey").as("a_key"), col("b.o_orderkey").as("b_key"),
        datediff(col("a.o_orderdate") + expr("INTERVAL 7 DAY"),
          col("b.o_orderdate")).cast("bigint").as("overlap_days"))
      .orderBy("custkey", "a_key", "b_key")
  }

  /** Period-over-period reporting: monthly revenue with absolute and
    * relative month-over-month change. Revenue stays exact DECIMAL into
    * the LAG; the single relative-change division is the only float op,
    * mirrored verbatim. Window runs over the per-month aggregate. */
  val q86PeriodOverPeriod: Q = Q(
    "q86_period_over_period",
    """WITH monthly AS (
      |  SELECT DATE_TRUNC('month', o_orderdate) AS month,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders GROUP BY 1)
      |SELECT month, CAST(rev AS DOUBLE) AS revenue,
      |  CAST(rev - LAG(rev) OVER (ORDER BY month) AS DOUBLE) AS mom_delta,
      |  CAST(rev - LAG(rev) OVER (ORDER BY month) AS DOUBLE) /
      |    CAST(LAG(rev) OVER (ORDER BY month) AS DOUBLE) AS mom_pct
      |FROM monthly
      |ORDER BY month""".stripMargin) { (s, d) =>
    val w = Window.orderBy("month")
    val monthly = orders(s, d)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(sum(money(col("o_totalprice"))).as("rev"))
    monthly.select(col("month"),
        col("rev").cast("double").as("revenue"),
        (col("rev") - lag("rev", 1).over(w)).cast("double").as("mom_delta"),
        ((col("rev") - lag("rev", 1).over(w)).cast("double") /
          lag("rev", 1).over(w).cast("double")).as("mom_pct"))
      .orderBy("month")
  }

  val all: Seq[Q] = Seq(q83RankWithTies, q84BucketedJoin, q85IntervalOverlap,
    q86PeriodOverPeriod)
}
