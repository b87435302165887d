package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-engine bit-exact natural log.
  *
  * `Math.log` (JVM intrinsic) and glibc's `log` (DuckDB) are each <1 ulp
  * from the true value but occasionally disagree in the last ulp; any
  * post-hoc rounding of a score derived from them can then flip at a
  * rounding boundary (the round-1 `text_bm25` hash failure). Instead of
  * rounding away the difference, this computes ln from scratch using only
  * operations IEEE 754 fully specifies (compare, add, subtract, multiply,
  * divide — each correctly rounded by definition), so BOTH engines produce
  * the *identical* 64-bit pattern and no rounding is needed at all:
  *
  *   1. binary range reduction: x = m·2^e, m ∈ [1,2), via exact
  *      power-of-two divisions (6 CASE stages covering x < 2^64);
  *   2. a final √2 stage mapping m to [√2/2, √2) so |y| ≤ 0.1716 for
  *      y = (m−1)/(m+1);
  *   3. ln(m) = 2·atanh(y) by a 12-term Horner series in t = y²
  *      (t ≤ 0.0295 ⇒ truncation ~1e-20, below double resolution);
  *   4. ln(x) = e·ln2 + 2y·H with ln2 as a fixed double literal.
  *
  * The result is within ~2 ulps of true ln — deterministically the SAME
  * ~2 ulps on every engine that evaluates the stages as written.
  *
  * [[withLn]] is the Spark form (staged columns over a relation — keep it
  * on a small relation such as a vocabulary, not a fact table);
  * [[sqlStages]] emits the identical computation as nested ANSI-SQL
  * SELECTs for the DuckDB oracle. The two MUST stay op-for-op mirrored.
  */
object PortableLn {

  private val Ln2 = 0.6931471805599453 // nearest double to ln 2
  private val Sqrt2 = 1.4142135623730951 // nearest double to √2
  private val HalfSqrt2 = 0.7071067811865476 // nearest double to √2/2
  /** (power of two, exponent shift) halving ladder, covers x < 2^64. */
  private val Halvings: Seq[(Double, Int)] = Seq(
    4294967296.0 -> 32, 65536.0 -> 16, 256.0 -> 8,
    16.0 -> 4, 4.0 -> 2, 2.0 -> 1)
  private val SeriesTerms = 12

  /** Adds `out` = ln(`x`) to `rel` (requires 2^-64 < x < 2^64). */
  def withLn(rel: DataFrame, x: String, out: String): DataFrame = {
    var cur = rel
      .withColumn("__m", col(x).cast("double"))
      .withColumn("__e", lit(0))
    // up-ladder: x ≥ 2 divided down by exact powers of two
    for ((p, sh) <- Halvings :+ (Sqrt2, 1)) {
      val div = if (p == Sqrt2) 2.0 else p
      cur = cur
        .withColumn("__mN", when(col("__m") >= p, col("__m") / div)
          .otherwise(col("__m")))
        .withColumn("__eN", when(col("__m") >= p, col("__e") + sh)
          .otherwise(col("__e")))
        .drop("__m", "__e")
        .withColumnRenamed("__mN", "__m")
        .withColumnRenamed("__eN", "__e")
    }
    // down-ladder: x < 1 multiplied up by exact powers of two (no-op for
    // x ≥ 1), ending with the √2/2 stage so |y| ≤ 0.1716 on both sides
    for ((p, sh) <- Halvings :+ (2.0 / Sqrt2, 1)) {
      val thr = if (p == 2.0 / Sqrt2) HalfSqrt2 else 1.0 / p
      val mul = if (p == 2.0 / Sqrt2) 2.0 else p
      cur = cur
        .withColumn("__mN", when(col("__m") < thr, col("__m") * mul)
          .otherwise(col("__m")))
        .withColumn("__eN", when(col("__m") < thr, col("__e") - sh)
          .otherwise(col("__e")))
        .drop("__m", "__e")
        .withColumnRenamed("__mN", "__m")
        .withColumnRenamed("__eN", "__e")
    }
    cur = cur
      .withColumn("__y", (col("__m") - 1.0) / (col("__m") + 1.0))
      .withColumn("__t", col("__y") * col("__y"))
    val horner = (1 until SeriesTerms).foldRight(
      lit(1.0 / (2 * SeriesTerms + 1)): Column) { (k, inner) =>
      lit(1.0 / (2 * k + 1)) + col("__t") * inner
    }
    cur
      .withColumn(out,
        col("__e") * Ln2 + ((lit(2.0) * col("__y")) * (lit(1.0) + col("__t") * horner)))
      .drop("__m", "__e", "__y", "__t")
  }

  /** DuckDB mirror of [[withLn]]: nested SELECTs over `src` (a relation
    * with columns `keep :+ x`) producing `keep :+ (lnx = ln(x))`. */
  def sqlStages(src: String, keep: Seq[String], x: String = "x",
      out: String = "lnx"): String = {
    val k = keep.mkString(", ")
    var cur = s"SELECT $k, $x AS m, 0 AS e FROM $src"
    for ((p, sh) <- Halvings :+ (Sqrt2, 1)) {
      val pLit = if (p == Sqrt2) Sqrt2.toString else f"$p%.1f"
      val div = if (p == Sqrt2) "2.0" else pLit
      cur = s"SELECT $k, CASE WHEN m >= $pLit::DOUBLE THEN m / $div::DOUBLE ELSE m END AS m, " +
        s"CASE WHEN m >= $pLit::DOUBLE THEN e + $sh ELSE e END AS e FROM ($cur)"
    }
    for ((p, sh) <- Halvings :+ (2.0 / Sqrt2, 1)) {
      val thr = if (p == 2.0 / Sqrt2) HalfSqrt2.toString
        else s"(1.0::DOUBLE / ${f"$p%.1f"}::DOUBLE)"
      val mul = if (p == 2.0 / Sqrt2) "2.0" else f"$p%.1f"
      cur = s"SELECT $k, CASE WHEN m < $thr::DOUBLE THEN m * $mul::DOUBLE ELSE m END AS m, " +
        s"CASE WHEN m < $thr::DOUBLE THEN e - $sh ELSE e END AS e FROM ($cur)"
    }
    cur = s"SELECT $k, e, (m - 1.0::DOUBLE) / (m + 1.0::DOUBLE) AS y FROM ($cur)"
    cur = s"SELECT $k, e, y, y * y AS t FROM ($cur)"
    val horner = (1 until SeriesTerms).foldRight(
      s"(1.0::DOUBLE / ${2 * SeriesTerms + 1}.0::DOUBLE)") { (kk, inner) =>
      s"((1.0::DOUBLE / ${2 * kk + 1}.0::DOUBLE) + t * $inner)"
    }
    s"SELECT $k, e * $Ln2::DOUBLE + ((2.0::DOUBLE * y) * (1.0::DOUBLE + t * $horner)) AS $out FROM ($cur)"
  }
}
