package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tools.ScaleUp

/** The bench-only sf scale-up must preserve the semantic SHAPE of the
  * corpus, not just the row count — these are the claims ScaleUp's
  * class doc makes. */
class ScaleUpSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val out: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_sf_up").toString
    ScaleUp.run(spark, TestSpark.tiny, dir, 3)
    dir
  }

  test("row counts scale by factor; dims stay fixed") {
    val docs0 = Tables.documents(spark, TestSpark.tiny).count()
    assert(Tables.documents(spark, out).count() === 3 * docs0)
    val li0 = Tables.lineitem(spark, TestSpark.tiny).count()
    assert(Tables.lineitem(spark, out).count() === 3 * li0)
    assert(Tables.region(spark, out).count() ===
      Tables.region(spark, TestSpark.tiny).count())
  }

  test("key offsets keep joins 1:N — no cross-replica collisions") {
    // orders⋈lineitem match count must scale exactly by the factor
    val j0 = Tables.orders(spark, TestSpark.tiny)
      .join(Tables.lineitem(spark, TestSpark.tiny),
        col("o_orderkey") === col("l_orderkey")).count()
    val j1 = Tables.orders(spark, out)
      .join(Tables.lineitem(spark, out),
        col("o_orderkey") === col("l_orderkey")).count()
    assert(j1 === 3 * j0)
    // doc_ids globally unique after offsetting
    val d = Tables.documents(spark, out)
    assert(d.select("doc_id").distinct().count() === d.count())
  }

  test("replica texts are NOT near-dups of the original (Jaccard < 0.5)") {
    val orig = Tables.documents(spark, TestSpark.tiny)
      .select(col("doc_id"), col("text")).limit(20)
    // the same 3-gram shingle definition the dedup operators use
    def shingles(c: org.apache.spark.sql.Column) =
      graft.operators.Dedup.shingles(c)
    // replica 1 of the same doc lives at doc_id + 1e9
    val rep = Tables.documents(spark, out)
      .select((col("doc_id") - 1000000000L).as("doc_id"),
        col("text").as("rtext"))
    val jac = orig.join(rep, "doc_id")
      .select(
        (size(array_intersect(shingles(col("text")), shingles(col("rtext"))))
          .cast("double") /
          size(array_union(shingles(col("text")), shingles(col("rtext")))))
          .as("j"))
      .agg(max("j")).as[Double].first()
    assert(jac < 0.5, s"replica too similar to original: max Jaccard $jac")
  }

  test("replica embeddings are not clones; norms preserved") {
    val orig = Tables.embeddings(spark, TestSpark.tiny)
      .select(col("vec_id"), col("embedding")).limit(20)
    val rep = Tables.embeddings(spark, out)
      .select((col("vec_id") - 1000000000L).as("vec_id"),
        col("embedding").as("remb"))
    def dot(a: String, b: String) = aggregate(
      zip_with(col(a), col(b), (x, y) => (x * y).cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val cos = orig.join(rep, "vec_id")
      .select((dot("embedding", "remb") /
        sqrt(dot("embedding", "embedding")) /
        sqrt(dot("remb", "remb"))).as("c"))
      .agg(max(abs(col("c")))).as[Double].first()
    assert(cos < 0.9, s"replica vector too close to original: |cos| $cos")
    // sign flips preserve the norm exactly
    val norms = orig.join(rep, "vec_id")
      .select((dot("embedding", "embedding") - dot("remb", "remb")).as("d"))
      .agg(max(abs(col("d")))).as[Double].first()
    assert(norms < 1e-6)
  }

  test("events.ts survives the loader contract (ns int64 round-trip)") {
    val e0 = Tables.events(spark, TestSpark.tiny)
      .agg(min("ts"), max("ts")).first()
    val e1 = Tables.events(spark, out).agg(min("ts"), max("ts")).first()
    assert(e0 === e1)
    assert(Tables.events(spark, out).count() ===
      3 * Tables.events(spark, TestSpark.tiny).count())
  }
}
