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

  /** Adds `out` = ln(`x`) to `rel` (requires 2^-64 < x < 2^64).
    *
    * Each ladder stage is ONE `select` (r16 optimization): the previous
    * withColumn/withColumn/drop/drop/rename/rename formulation cost ~6
    * analyzer passes PER STAGE (~84 per ln call) — pure driver-side
    * plan-construction time, ~0.3-0.5 s per call on chained consumers
    * like text_bigram_llr (4 ladders). The per-stage EXPRESSIONS are
    * unchanged op-for-op, so the produced doubles are bit-identical and
    * the DuckDB mirror ([[sqlStages]]) is untouched. */
  def withLn(rel: DataFrame, x: String, out: String): DataFrame =
    withLns(rel, Seq(x -> out))

  /** Adds `out` = ln(`x`) for EVERY (x, out) pair in one 14-stage ladder
    * pass (r16): consumers that need several lns over the same relation
    * (text_bigram_llr needs four) previously chained full ladders —
    * k × 14 analyzer passes; carrying k (m, e) pairs through ONE ladder
    * costs 14 passes total. Per-column expressions are unchanged
    * op-for-op, so each output is bit-identical to the chained form. */
  def withLns(rel: DataFrame, xs: Seq[(String, String)]): DataFrame = {
    // outputs are APPENDED via select (not replaced in place like the
    // old withColumn form) — an `out` colliding with an existing column
    // would produce an ambiguous reference downstream; fail fast instead
    require(xs.forall(x => !rel.columns.contains(x._2)),
      s"withLns output name collides with an input column: " +
        s"${xs.map(_._2).filter(rel.columns.contains).mkString(", ")}")
    val keep: Seq[Column] = rel.columns.toSeq.map(col)
    val idx = xs.indices
    def m(i: Int) = s"__m$i"
    def e(i: Int) = s"__e$i"
    var cur = rel.select(keep ++ idx.flatMap { i =>
      Seq(col(xs(i)._1).cast("double").as(m(i)), lit(0).as(e(i)))
    }: _*)
    def stage(f: (Column, Column) => (Column, Column)): Unit =
      cur = cur.select(keep ++ idx.flatMap { i =>
        val (mN, eN) = f(col(m(i)), col(e(i)))
        Seq(mN.as(m(i)), eN.as(e(i)))
      }: _*)
    // up-ladder: x ≥ 2 divided down by exact powers of two
    for ((p, sh) <- Halvings :+ (Sqrt2, 1)) {
      val div = if (p == Sqrt2) 2.0 else p
      stage((mc, ec) => (
        when(mc >= p, mc / div).otherwise(mc),
        when(mc >= p, ec + sh).otherwise(ec)))
    }
    // down-ladder: x < 1 multiplied up by exact powers of two (no-op for
    // x ≥ 1), ending with the √2/2 stage so |y| ≤ 0.1716 on both sides
    for ((p, sh) <- Halvings :+ (2.0 / Sqrt2, 1)) {
      val thr = if (p == 2.0 / Sqrt2) HalfSqrt2 else 1.0 / p
      val mul = if (p == 2.0 / Sqrt2) 2.0 else p
      stage((mc, ec) => (
        when(mc < thr, mc * mul).otherwise(mc),
        when(mc < thr, ec - sh).otherwise(ec)))
    }
    def y(i: Int) = s"__y$i"
    def t(i: Int) = s"__t$i"
    val withY = cur.select(keep ++ idx.flatMap { i =>
      Seq(col(e(i)),
        ((col(m(i)) - 1.0) / (col(m(i)) + 1.0)).as(y(i)))
    }: _*)
    val withT = withY.select(keep ++ idx.flatMap { i =>
      Seq(col(e(i)), col(y(i)), (col(y(i)) * col(y(i))).as(t(i)))
    }: _*)
    withT.select(keep ++ idx.map { i =>
      val horner = (1 until SeriesTerms).foldRight(
        lit(1.0 / (2 * SeriesTerms + 1)): Column) { (k, inner) =>
        lit(1.0 / (2 * k + 1)) + col(t(i)) * inner
      }
      (col(e(i)) * Ln2 +
        ((lit(2.0) * col(y(i))) * (lit(1.0) + col(t(i)) * horner)))
        .as(xs(i)._2)
    }: _*)
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
