package graft

import org.apache.spark.sql.functions._

import graft.operators.Joins

/** Timing probe for the salted-join components at sf0.1. */
object DebugSalted {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val d = "/root/testdata/sf0.1"
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs"); r
    }
    val big = Tables.lineitem(spark, d)
      .select(col("l_orderkey").as("o_orderkey"), col("l_extendedprice"))
    val small = Tables.orders(spark, d).select("o_orderkey", "o_orderpriority")
    time("warm read")(big.count())
    time("warm read small")(small.count())
    time("plain join+agg") {
      big.join(small, "o_orderkey").groupBy("o_orderpriority").count().collect()
    }
    time("sketch only") {
      val sketch = udaf(new graft.functions.FrequentItems(1024))
      big.select(xxhash64(col("o_orderkey")).cast("string").as("k"))
        .agg(sketch(col("k"))).collect()
    }
    time("salted join+agg") {
      Joins.saltedJoin(big, small, Seq("o_orderkey"), 8)
        .groupBy("o_orderpriority").count().collect()
    }
  }
}
