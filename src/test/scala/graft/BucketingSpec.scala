package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Bucketing

/** S11 bucketed layout: a join of two tables bucketed on the same key
  * must plan WITHOUT shuffle exchanges, and match the plain join. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("co-located join on bucketed tables plans no Exchange") {
    val orders = Tables.orders(spark, TestSpark.tiny)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Tables.lineitem(spark, TestSpark.tiny)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 4)
    Bucketing.writeBucketed(lineitem, "b_lineitem", "o_orderkey", 4)

    val expected = lineitem.join(orders, "o_orderkey").count()

    // force the shuffle-visible path: no broadcast, no AQE re-planning
    val conf = spark.conf
    val oldBroadcast = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val oldAqe = conf.get("spark.sql.adaptive.enabled")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.enabled", "false")
      val joined = Bucketing.bucketedJoin(spark, "b_lineitem", "b_orders",
        "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"shuffle in bucketed join:\n$plan")
      assert(plan.contains("SortMergeJoin"))
      // bucket-file sort order satisfies SMJ's requirement: no extra Sort
      // between scan and join on either side
      assert(joined.count() === expected)
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", oldBroadcast)
      conf.set("spark.sql.adaptive.enabled", oldAqe)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("bucketed aggregation on the bucket key plans no Exchange") {
    val orders = Tables.orders(spark, TestSpark.tiny)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    Bucketing.writeBucketed(orders, "b_orders_agg", "o_custkey", 4)
    val conf = spark.conf
    val oldAqe = conf.get("spark.sql.adaptive.enabled")
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      val agg = spark.table("b_orders_agg")
        .groupBy("o_custkey").agg(count(lit(1)).as("n"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"shuffle in bucketed agg:\n$plan")
      assert(agg.count() > 0)
    } finally {
      conf.set("spark.sql.adaptive.enabled", oldAqe)
      spark.sql("DROP TABLE IF EXISTS b_orders_agg")
    }
  }
}
