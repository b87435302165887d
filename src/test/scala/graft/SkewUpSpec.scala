package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tools.SkewUp

/** The skew generator must produce a corpus that is (1) referentially
  * intact — every rewritten FK still resolves in its dimension, (2)
  * schema-identical to the source, (3) actually skewed: the hottest
  * key carries ~25% of its fact table (the geometric head the study
  * relies on), and (4) deterministic — two runs agree row-for-row. */
class SkewUpSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val out = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_skew").toString
    SkewUp.run(spark, TestSpark.tiny, dir)
    dir
  }

  test("schema and row counts survive the rewrite") {
    for (t <- Seq("lineitem", "orders", "events")) {
      val src = spark.read.parquet(s"${TestSpark.tiny}/$t.parquet")
      val got = spark.read.parquet(s"$out/$t.parquet")
      assert(got.schema === src.schema, t)
      assert(got.count() === src.count(), t)
    }
  }

  test("every rewritten key still resolves in its dimension") {
    val orphans = spark.read.parquet(s"$out/lineitem.parquet")
      .select(col("l_orderkey").as("k")).distinct()
      .join(spark.read.parquet(s"$out/orders.parquet")
        .select(col("o_orderkey").as("k")), Seq("k"), "left_anti")
      .count()
    assert(orphans === 0L)
    val custOrphans = spark.read.parquet(s"$out/orders.parquet")
      .select(col("o_custkey").as("k")).distinct()
      .join(spark.read.parquet(s"$out/customer.parquet")
        .select(col("c_custkey").as("k")), Seq("k"), "left_anti")
      .count()
    assert(custOrphans === 0L)
  }

  test("the hot head carries its geometric shares") {
    val li = spark.read.parquet(s"$out/lineitem.parquet")
    val n = li.count().toDouble
    val top = li.groupBy("l_orderkey").count()
      .orderBy(col("count").desc).limit(2).collect()
    // hot(0) ≈ 25% plus whatever rows already owned that key; hash
    // tiering over a few thousand rows wobbles a couple of points
    val share0 = top(0).getLong(1) / n
    assert(share0 > 0.20 && share0 < 0.32, s"hot0 share $share0")
    val share1 = top(1).getLong(1) / n
    assert(share1 > 0.09 && share1 < 0.18, s"hot1 share $share1")
    // events head visible to the cdc audit path too
    val ev = spark.read.parquet(s"$out/events.parquet")
    val evTop = ev.groupBy("user_id").count()
      .orderBy(col("count").desc).limit(1).collect()(0).getLong(1)
    val evShare = evTop / ev.count().toDouble
    assert(evShare > 0.20 && evShare < 0.32, s"events hot share $evShare")
  }

  test("deterministic: a second run is row-identical") {
    val dir2 = java.nio.file.Files
      .createTempDirectory("graft_skew2").toString
    SkewUp.run(spark, TestSpark.tiny, dir2)
    val a = spark.read.parquet(s"$out/lineitem.parquet")
    val b = spark.read.parquet(s"$dir2/lineitem.parquet")
    assert(a.exceptAll(b).count() === 0L)
    assert(b.exceptAll(a).count() === 0L)
    val da = spark.read.parquet(s"$out/documents.parquet")
    val db = spark.read.parquet(s"$dir2/documents.parquet")
    assert(da.exceptAll(db).count() === 0L)
    assert(db.exceptAll(da).count() === 0L)
  }

  test("hot-template document tier: ~25% of docs share one near-dup " +
    "template with a per-doc variant tail; n_chars re-derived; the " +
    "rest verbatim") {
    val src = spark.read.parquet(s"${TestSpark.tiny}/documents.parquet")
    val got = spark.read.parquet(s"$out/documents.parquet")
    assert(got.schema === src.schema)
    assert(got.count() === src.count())
    val n = got.count().toDouble
    val hot = got.filter(col("text").rlike(" pv[0-9]+$"))
    val share = hot.count() / n
    assert(share > 0.15 && share < 0.35, s"hot doc share $share")
    // one template: all hot docs agree on every word but the tail
    val prefixes = hot
      .select(regexp_replace(col("text"), " pv[0-9]+$", "").as("p"))
      .distinct().count()
    assert(prefixes === 1L)
    // n_chars tracks the rewritten text
    assert(hot.filter(length(col("text")) =!= col("n_chars")).count() === 0L)
    // cold docs are byte-identical to the source
    val cold = got.filter(!col("text").rlike(" pv[0-9]+$"))
    assert(cold.exceptAll(src.join(cold.select("doc_id"), "doc_id"))
      .count() === 0L)
  }
}
