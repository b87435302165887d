package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from
  * codegen'd higher-order functions (no UDFs — stays inside whole-stage
  * codegen and Catalyst can prune/push around it).
  *
  * Determinism contract: every reduction is a sequential left fold in
  * array order (`aggregate`), matching DuckDB's `list_reduce` fold in the
  * oracle SQL bit-for-bit — float sums are order-dependent, so both
  * engines must fold identically for hash-equality.
  */
object VectorFunctions {

  /** dot(a, b) in double precision, sequential accumulation in array
    * order — a native codegen'd expression ([[DotProduct]]); the
    * equivalent HOF fold `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
    * produces bit-identical results but runs interpreted (~100× slower
    * in the 2M-pair joins). */
  def dot(a: Column, b: Column): Column = DotProduct(a, b)

  /** L2 norm, same fold. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** cosine(a, b) = dot / (‖a‖·‖b‖), all sequential-fold doubles. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** DuckDB oracle fragment computing the identical sequential-fold dot
    * product: `list_reduce(list_prepend(0.0, zipped products), +)`. */
  def duckDot(a: String, b: String, dim: Int): String =
    s"LIST_REDUCE(LIST_PREPEND(0.0::DOUBLE, LIST_TRANSFORM(RANGE(1, ${dim + 1}), i -> $a[i]::DOUBLE * $b[i]::DOUBLE)), (acc, x) -> acc + x)"

  def duckNorm(a: String, dim: Int): String =
    s"SQRT(${duckDot(a, a, dim)})"

  def duckCosine(a: String, b: String, dim: Int): String =
    s"(${duckDot(a, b, dim)} / (${duckNorm(a, dim)} * ${duckNorm(b, dim)}))"
}
