package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bit-parity of the codegen'd poly-hash expressions against an
  * independent copy of the interpreted HOF fold they replaced, on the
  * real corpus plus edge strings, and a direct check of the walkers'
  * plain-Scala semantics.
  */
class PolyHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  // the ORIGINAL interpreted shapes, kept verbatim as the reference
  private def hofPolyHash(text: org.apache.spark.sql.Column) =
    aggregate(
      transform(sequence(lit(1), length(text)),
        i => ascii(text.substr(i, lit(1))).cast("bigint")),
      lit(0L),
      (acc, c) => (acc * 31 + c) % 1000000007L)
  private def hofMinWindow(text: org.apache.spark.sql.Column, win: Int) =
    when(length(text) < win, lit(null).cast("long"))
      .otherwise(array_min(transform(
        sequence(lit(1), length(text) - (win - 1)),
        i => aggregate(
          sequence(lit(0), lit(win - 1)),
          lit(0L),
          (acc, k) => (acc * 31 + ascii(text.substr(i + k, lit(1)))) % 1000000007L))))

  test("native full hash ≡ interpreted fold on the corpus") {
    val d = Tables.documents(spark, sf).select(
      graft.functions.PolyHash.full(col("text")).as("a"),
      hofPolyHash(col("text")).as("b"))
    assert(d.filter(col("a") =!= col("b")).count() === 0)
  }

  test("native min-window hash ≡ interpreted fold on the corpus") {
    val d = Tables.documents(spark, sf).select(
      graft.functions.PolyHash.minWindowCol(col("text"), 8).as("a"),
      hofMinWindow(col("text"), 8).as("b"))
    assert(d.filter(!(col("a") <=> col("b"))).count() === 0)
  }

  test("edge strings: empty, short, exactly-window, repeated") {
    import spark.implicits._
    val edge = Seq("", "a", "abcdefg", "abcdefgh", "abcdefghi",
      "aaaaaaaaaaaa", "the quick brown fox").toDF("text")
    val d = edge.select(
      graft.functions.PolyHash.full(col("text")).as("a"),
      hofPolyHash(col("text")).as("b"),
      graft.functions.PolyHash.minWindowCol(col("text"), 8).as("ma"),
      hofMinWindow(col("text"), 8).as("mb"))
    for (r <- d.collect()) {
      assert(r.getLong(0) === r.getLong(1))
      assert((r.isNullAt(2) && r.isNullAt(3)) ||
        r.getLong(2) === r.getLong(3))
    }
  }

  test("plain-Scala walk matches a hand fold") {
    def ph(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)
    for (s <- Seq("", "a", "hash me", "abcdefghij")) {
      assert(graft.functions.PolyHash.fullHash(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)) === ph(s))
    }
    val s = "abcdefghij"
    val windows = s.sliding(8).map(ph).toSeq
    assert(graft.functions.PolyHash.minWindow(
      org.apache.spark.unsafe.types.UTF8String.fromString(s), 8)
      === windows.min)
  }
}
