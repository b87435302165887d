package graft.tools

import org.apache.spark.sql.functions._

import graft.Tables

/** Addendum to [[SkewStudy]]: the SAME q46 join shape at Spark's
  * DEFAULT skew-split thresholds — establishes whether the main
  * study's lowered thresholds were load-bearing for the split to fire
  * on this corpus, with the exact plan lines and the operative config
  * values printed as evidence. Prints one JSON line. */
object SkewStudyDefault {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/skew1")
    val spark = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    for (k <- Seq(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes"))
      System.err.println(s"[skewdef] $k = " +
        spark.conf.getOption(k).getOrElse("<default>"))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o_orderkey"), col("l_extendedprice"))
    val ord = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderpriority")
    val df = li.join(ord, "o_orderkey")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    plan.linesIterator.filter(_.toLowerCase.contains("skew"))
      .take(6).foreach(l => System.err.println("[skewdef] plan: " + l.trim))
    val seen = plan.contains("skew=true") || plan.contains("skewed")
    System.err.println(s"[skewdef] genuine skew marker: $seen")
    spark.stop()
    println(s"""{"study":"skew_default_thresholds","dir":"$dir","skew_split_seen":"$seen"}""")
  }
}
