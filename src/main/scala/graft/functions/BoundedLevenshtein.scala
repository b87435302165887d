package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Levenshtein
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Per-row THRESHOLDED Levenshtein — the banded variant of the builtin.
  *
  * `org.apache.spark.sql.functions.levenshtein(l, r, threshold)` only
  * accepts a literal Int threshold, but the underlying Catalyst
  * [[Levenshtein]] expression evaluates its threshold child per row and
  * dispatches to `UTF8String.levenshteinDistance(other, k)` — the
  * banded O((2k+1)·n) dynamic program with early exit, which returns -1
  * as soon as every cell in the current band exceeds k. For a verify
  * stage whose keep rule is RELATIVE (ed ≤ 0.3·maxlen), the bound is a
  * function of the pair's lengths, so the literal-threshold API can't
  * express it; this wrapper passes the bound as a column.
  *
  * Output contract (matches the SQL `levenshtein(l, r, k)` builtin):
  * the exact distance when ≤ k, and -1 otherwise — so
  * `bounded_levenshtein(a, b, k) BETWEEN 0 AND k` is equivalent to
  * `levenshtein(a, b) <= k`, and the surviving values are identical to
  * the unbounded call. Cost: O(min(n,m)·k) instead of O(n·m), with
  * early termination for pairs far over the bound.
  */
object BoundedLevenshtein {
  def apply(left: Column, right: Column, threshold: Column): Column =
    ColumnBridge.column(Levenshtein(
      ColumnBridge.expression(left),
      ColumnBridge.expression(right),
      Some(ColumnBridge.expression(threshold))))
}
