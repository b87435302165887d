package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Joins, Relational2, Relational3, Relational4, Relational5}

class JoinsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedJoin equals the plain join on a skewed key distribution") {
    // 90% of rows share one hot key — the salting target
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 7L, i))
      .toDF("k", "v")
    val small = Seq((7L, "hot"), (20L, "a"), (1000L, "b")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "v", "name")
      .collect().toSet
    val salted = Joins.saltedJoin(big, small, Seq("k"), saltFactor = 8)
      .select("k", "v", "name").collect().toSet
    assert(salted === plain)
    assert(plain.size === 1802) // 1800 hot-key rows + keys 20 and 1000
  }

  test("saltedJoin is answer-identical under FORCED mis-detection: " +
    "empty hot set, over-detection, and a wrong hot key") {
    // skewed corpus with a boundary key: key 7 is hot (60%), key 9 sits
    // just under a 1/capacity share (the detection-miss regime the
    // sketch cannot guarantee), the rest are cold singletons
    val big = (1 to 3000).map { i =>
      val k = if (i % 5 != 0) 7L else if (i % 25 == 0) 9L else (i % 40).toLong
      (k, i)
    }.toDF("k", "v")
    val small = Seq((7L, "hot"), (9L, "edge"), (20L, "a"), (35L, "b"),
      (9999L, "unmatched")).toDF("k", "name")
    for (jt <- Seq("inner", "left_outer")) {
      val plain = big.join(small, Seq("k"), jt)
        .select("k", "v", "name").collect().toSet
      def forced(hot: Seq[Long]) =
        Joins.saltedJoinForced(big, small, Seq("k"), 8, jt, hot)
          .select("k", "v", "name").collect().toSet
      val allKeyHashes = big.select(xxhash64(col("k")))
        .distinct().as[Long].collect().toSeq
      // detection FAILURE: nothing salted, plain path must carry it
      assert(forced(Seq.empty) === plain, s"$jt: empty hot set")
      // OVER-detection: every key salted, including unmatched ones
      assert(forced(allKeyHashes) === plain, s"$jt: all keys hot")
      // MIS-detection: a cold key flagged, the true hot key missed
      val coldHash = big.filter(col("k") === 20L)
        .select(xxhash64(col("k"))).as[Long].head()
      assert(forced(Seq(coldHash)) === plain, s"$jt: wrong key hot")
      // and the real detector on the same corpus (key 9 at the sketch
      // boundary may or may not be flagged — either way, same answer)
      assert(Joins.saltedJoin(big, small, Seq("k"), 8, jt)
        .select("k", "v", "name").collect().toSet === plain,
        s"$jt: detected path at the skew boundary")
    }
  }

  test("saltedJoin left_outer keeps unmatched big-side rows exactly once") {
    val big = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val small = Seq((1L, "m")).toDF("k", "name")
    val got = Joins.saltedJoin(big, small, Seq("k"), 4, "left_outer")
      .select("k", "v", "name").as[(Long, String, Option[String])]
      .collect().toSet
    assert(got === Set((1L, "x", Some("m")), (2L, "y", None)))
  }

  test("saltedJoin with no skew matches plain join (cold path only)") {
    val big = (1 to 500).map(i => (i.toLong, i)).toDF("k", "v") // all unique
    val small = (1 to 100).map(i => (i.toLong, s"n$i")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "v", "name").collect().toSet
    val salted = Joins.saltedJoin(big, small, Seq("k"), 8)
      .select("k", "v", "name").collect().toSet
    assert(salted === plain)
  }

  test("saltedJoin rejects right/full outer (replication breaks them)") {
    val df = Seq((1L, "x")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Joins.saltedJoin(df, df, Seq("k"), 4, "full_outer")
    }
    intercept[IllegalArgumentException] {
      Joins.saltedJoin(df, df, Seq("k"), 4, "right")
    }
  }

  test("binnedRangeJoin equals the theta join and plans no BNL") {
    val intervals = Seq((1L, 10L, 20L), (2L, 15L, 16L), (3L, 100L, 130L))
      .toDF("iv_id", "s", "e")
    val points = (0L to 150L).map(p => (p, s"v$p")).toDF("p", "tag")
    val binned = Joins.binnedRangeJoin(intervals, points, "p", "s", "e", 10)
    val theta = intervals.join(points, col("p") >= col("s") && col("p") < col("e"))
    assert(binned.select("iv_id", "p").collect().toSet ===
      theta.select("iv_id", "p").collect().toSet)
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"non-hash join:\n$plan")
  }

  test("fold assignment is stable under repartitioning (q34 claim)") {
    val base = Relational3.q34FoldAssign.run(spark, TestSpark.tiny)
      .collect().map(_.toSeq).toSeq
    val docs = Tables.documents(spark, TestSpark.tiny).repartition(13)
    docs.createOrReplaceTempView("graft_docs_reparted")
    // same hash arithmetic over the repartitioned table
    val reparted = docs
      .select(col("lang"),
        (col("doc_id") % 67108864L * 2654435761L % 4294967296L % 10)
          .as("fold"))
      .groupBy("lang", "fold").agg(count(lit(1)).as("n"))
      .orderBy("lang", "fold").collect().map(_.toSeq).toSeq
    assert(base === reparted)
  }

  test("q52: exact disc percentiles verified, GK rank claim holds") {
    val got = Relational4.q52ApproxQuantile.run(spark, TestSpark.tiny)
      .select("l_returnflag", "qty_median", "approx_ok")
      .as[(String, Double, Boolean)].collect()
    val exact = Tables.lineitem(spark, TestSpark.tiny)
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_quantity, 0.5)").as("m"))
      .as[(String, Double)].collect().toMap
    got.foreach { case (k, m, ok) =>
      // disc vs interpolated median differ by at most one integer step
      // (quantities are 1..50)
      assert(math.abs(m - exact(k)) <= 1.0, s"flag $k: $m vs ${exact(k)}")
      assert(ok, s"flag $k: GK estimate outside its rank-error guarantee")
    }
  }

  test("q28: exact distinct counts verified, HLL est_ok claim holds") {
    val got = Relational2.q28ApproxDistinct.run(spark, TestSpark.tiny)
      .as[(String, Long, Long, Boolean)].collect()
    val exact = Tables.lineitem(spark, TestSpark.tiny)
      .groupBy("l_returnflag")
      .agg(countDistinct("l_orderkey").as("no"),
        countDistinct("l_partkey").as("np"))
      .as[(String, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    got.foreach { case (k, nOrders, nParts, ok) =>
      assert((nOrders, nParts) === exact(k), s"flag $k exact counts")
      assert(ok, s"flag $k: sketch estimate out of its 3σ bound")
    }
  }

  test("hll sketch states: exact counts verified, estimates in bound, " +
    "and union-of-states equals the direct whole-table sketch") {
    val got = Relational5.q62HllUnion.run(spark, TestSpark.tiny)
      .as[(String, Long, Boolean)].collect()
    val o = Tables.orders(spark, TestSpark.tiny)
    val exact = o.groupBy("o_orderpriority")
      .agg(countDistinct("o_custkey").as("n"))
      .as[(String, Long)].collect().toMap +
      ("<all>" -> o.select("o_custkey").distinct().count())
    got.foreach { case (k, n, ok) =>
      assert(n === exact(k), s"$k exact count")
      assert(ok, s"$k estimate out of its 3% bound")
    }
    // merge-algebra identity: unioning per-group states must yield the
    // SAME sketch estimate as sketching the whole table directly
    val viaUnion = o.groupBy("o_orderpriority")
      .agg(hll_sketch_agg(col("o_custkey"), lit(14)).as("state"))
      .agg(hll_sketch_estimate(hll_union_agg(col("state"), lit(false))))
      .first().getLong(0)
    val direct = o
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"), lit(14))))
      .first().getLong(0)
    assert(viaUnion === direct, "state-merge drifted from direct sketch")
  }
}
