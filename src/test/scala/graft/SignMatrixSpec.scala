package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SignMatrix

/** Bit-parity of the codegen'd sign-matrix walk against the interpreted
  * `aggregate(zip_with(...))` fold it replaced (the r06 `weak`), on the
  * real embeddings table — same sequential-fold arithmetic, so every
  * LSH-family oracle stays hash-exact after the swap.
  */
class SignMatrixSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** The replaced shape, verbatim: per-element xxhash64 sign, sequential
    * double fold in array order, seed 0.0. */
  private def hofProj(p: Int, vec: Column, len: Int): Column =
    aggregate(
      zip_with(vec, sequence(lit(0), lit(len - 1)),
        (x, i) => x.cast("double") *
          when(xxhash64(lit(p), i).bitwiseAND(lit(1L)) === 1L, lit(1.0))
            .otherwise(lit(-1.0))),
      lit(0.0), (acc, x) => acc + x)

  private def emb = Tables.embeddings(spark, TestSpark.tiny)

  test("Project is bit-identical to the HOF fold (all 68 planes, real data)") {
    for (base <- Seq(0, 32, 36, 52); n <- Seq(4)) {
      val both = emb.select(
        SignMatrix.projectCol(col("embedding"), base, n).as("fast"),
        array((0 until n).map(b =>
          hofProj(base + b, col("embedding"), 64)): _*).as("slow"))
      val bad = both.filter(not(col("fast") <=> col("slow"))).count()
      assert(bad == 0, s"planes $base..${base + n - 1}: $bad rows differ")
    }
  }

  test("Project scale is applied after the fold (JL parity)") {
    val both = emb.select(
      SignMatrix.projectCol(col("embedding"), 52, 16, scale = 0.25).as("fast"),
      array((0 until 16).map(j =>
        hofProj(52 + j, col("embedding"), 64) * 0.25): _*).as("slow"))
    assert(both.filter(not(col("fast") <=> col("slow"))).count() == 0)
  }

  test("PackBits matches the foldLeft-of-signs shape (32 planes + slices)") {
    val slowFull = (0 until 32).foldLeft(lit(0L)) { (acc, p) =>
      acc.bitwiseOR(shiftleft(
        when(hofProj(p, col("embedding"), 64) >= 0, lit(1L)).otherwise(lit(0L)),
        p))
    }
    val slowSlice = (0 until 4).foldLeft(lit(0L)) { (acc, b) =>
      acc.bitwiseOR(shiftleft(
        when(hofProj(36 + b, slice(col("embedding"), 17, 16), 16) >= 0,
          lit(1L)).otherwise(lit(0L)), b))
    }
    val both = emb.select(
      SignMatrix.bitsCol(col("embedding"), 0, 32).as("f1"),
      slowFull.as("s1"),
      SignMatrix.bitsCol(slice(col("embedding"), 17, 16), 36, 4).as("f2"),
      slowSlice.as("s2"))
    assert(both.filter(col("f1") =!= col("s1") ||
      col("f2") =!= col("s2")).count() == 0)
  }

  test("stacked Project+PackBits projection compiles under CODEGEN_ONLY") {
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try {
      val n = emb.select(
        SignMatrix.projectCol(col("embedding"), 32, 4).as("ivf"),
        SignMatrix.projectCol(col("embedding"), 52, 16, 0.25).as("jl"),
        SignMatrix.bitsCol(col("embedding"), 0, 32).as("sig")).collect().length
      assert(n > 0)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
}
