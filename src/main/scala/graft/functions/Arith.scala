package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Column-level arithmetic helpers for expressions that the SQL parser
  * exposes only as operators: inside higher-order-function lambdas an
  * `expr("a div b")` string cannot reference lambda variables, so the
  * truncating integral division must be constructed as a Catalyst node
  * directly. `IntegralDivide` here is EXACTLY the node `a div b`
  * parses to — same truncation, same long result type — so folds built
  * with [[idiv]] are bit-identical to their `expr` counterparts. */
object Arith {
  /** `a div b` — truncating integral division (long result). */
  def idiv(a: Column, b: Column): Column =
    ColumnBridge.column(new IntegralDivide(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
