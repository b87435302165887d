package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Unit-cost Levenshtein distance via Myers' bit-parallel algorithm
  * (Myers 1999, JACM 46(3); multi-word form after Hyyrö 2003) — the
  * same metric as `functions.levenshtein`, ~64 DP cells per machine
  * word instead of one.
  *
  * Why: the classic O(m·n) dynamic program is the entire cost of the
  * edit-distance dedup verify once candidates are pruned (36 s of the
  * sf1 bench). The banded/thresholded builtin was measured SLOWER here
  * (73 s vs 36 s at sf1): its band is enforced by per-cell branches,
  * not loop bounds, and the early exit fires only after ~k full-width
  * rows — for near-threshold candidate pairs that's pure overhead.
  * Myers instead encodes a whole column of the DP lattice as bit
  * vectors (VP/VN = +1/−1 deltas) and advances 64 rows per word-op,
  * giving O(⌈m/64⌉·n) unconditionally — no data-dependent branch per
  * cell, so it wins on similar AND dissimilar pairs alike.
  *
  * Correctness containment: bit i of every word-op depends only on
  * bits ≤ i (carries propagate upward), so the garbage bits above
  * m−1 in the last partial block never corrupt the tracked score bit.
  * The score is maintained at lattice row m via bit (m−1) mod 64 of
  * the UNSHIFTED Ph/Mh in the last block — exactly Myers' single-word
  * update generalized. Distances are over Unicode CODE POINTS, same
  * as the builtin (`UTF8String.levenshteinDistance` counts chars, not
  * bytes). Property-tested against the builtin on random strings.
  */
case class MyersLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "myers_levenshtein"

  override def nullSafeEval(l: Any, r: Any): Any =
    MyersLevenshtein.dist(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = MyersLevenshtein.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, (a, b) => s"$cls.dist($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MyersLevenshtein {
  def apply(left: Column, right: Column): Column =
    ColumnBridge.column(MyersLevenshtein(
      ColumnBridge.expression(left), ColumnBridge.expression(right)))

  /** code points of s — the unit the builtin distance counts */
  private def codePoints(s: UTF8String): Array[Int] = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    val out = new Array[Int](n)
    var i = 0
    var k = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      out(k) = cp
      k += 1
      i += Character.charCount(cp)
    }
    out
  }

  def dist(a: UTF8String, b: UTF8String): Int = {
    val ca = codePoints(a)
    val cb = codePoints(b)
    // pattern = shorter side (bit vectors span the pattern)
    val (p, t) = if (ca.length <= cb.length) (ca, cb) else (cb, ca)
    val m = p.length
    val n = t.length
    if (m == 0) return n
    val w = (m + 63) >>> 6
    // Peq: per distinct pattern code point, the bitmask of its positions
    val peq = new java.util.HashMap[Integer, Array[Long]](m * 2)
    var i = 0
    while (i < m) {
      var arr = peq.get(p(i))
      if (arr == null) { arr = new Array[Long](w); peq.put(p(i), arr) }
      arr(i >>> 6) |= 1L << (i & 63)
      i += 1
    }
    val zeros = new Array[Long](w)
    val vp = Array.fill(w)(-1L)
    val vn = new Array[Long](w)
    var score = m
    val lastBlock = w - 1
    val lastBit = (m - 1) & 63
    var j = 0
    while (j < n) {
      val eqArr = { val e = peq.get(t(j)); if (e == null) zeros else e }
      var hin = 1 // top boundary row: D[0][j] = j, horizontal delta +1
      var blk = 0
      while (blk < w) {
        val pv = vp(blk)
        val mv = vn(blk)
        val eq0 = eqArr(blk)
        val hinNeg = if (hin < 0) 1L else 0L
        val xv = eq0 | mv
        val eq = eq0 | hinNeg
        val xh = (((eq & pv) + pv) ^ pv) | eq
        var ph = mv | ~(xh | pv)
        var mh = pv & xh
        if (blk == lastBlock) {
          score += ((ph >>> lastBit) & 1L).toInt
          score -= ((mh >>> lastBit) & 1L).toInt
        }
        val hout = ((ph >>> 63) & 1L).toInt - ((mh >>> 63) & 1L).toInt
        ph = (ph << 1) | (if (hin == 1) 1L else 0L)
        mh = (mh << 1) | hinNeg
        vp(blk) = mh | ~(xv | ph)
        vn(blk) = ph & xv
        hin = hout
        blk += 1
      }
      j += 1
    }
    score
  }
}
