package graft.operators

import org.apache.spark.sql.functions._

import graft.Q
import graft.Tables._

/** Fourteenth relational batch: the ClickHouse ANY JOIN surface.
  * Reference scope: `/root/reference/main.py:12-55` replicates into
  * ClickHouse, whose dialect extends standard joins with the ANY
  * strictness (`LEFT ANY JOIN` — at most one right-side row per left
  * row). ClickHouse picks an ARBITRARY matching row; a deterministic
  * engine (and a cross-engine oracle) must pin which one, so this
  * implementation defines ANY = the match with the smallest ordering
  * key — the same determinism pinning as the repo's other
  * tie-sensitive operators. */
object Relational14 {

  /** LEFT ANY JOIN orders → lineitem: each order annotated with its
    * FIRST line (min l_linenumber; the synthetic lineitem table reuses
    * line numbers within an order, so the pick is made total with the
    * (l_partkey, l_suppkey, l_extendedprice, l_quantity) tie-break —
    * every OUTPUT column is in the ordering key, so the pick is total
    * by construction, not by a uniqueness accident of the generator).
    * The right side collapses BEFORE the join via a
    * min_by hash aggregation — map-side combinable, one shuffle on the
    * join key, strictly cheaper than the window-rank formulation
    * (which must shuffle the full lineitem relation and then sort each
    * group just to keep row 1). LEFT semantics kept: an order with no
    * lines would still surface with nulls. */
  val q167AnyJoin: Q = Q(
    "q167_any_join",
    """SELECT o.o_orderkey, o.o_totalprice,
      |  f.l_partkey AS first_partkey, f.l_quantity AS first_quantity,
      |  f.l_extendedprice AS first_price
      |FROM orders o LEFT JOIN (
      |  SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
      |  FROM lineitem
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY l_orderkey
      |    ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice,
      |      l_quantity)
      |    = 1) f
      |ON f.l_orderkey = o.o_orderkey
      |ORDER BY o.o_orderkey""".stripMargin) { (s, d) =>
    val first = lineitem(s, d).groupBy("l_orderkey")
      .agg(min_by(
        struct(col("l_partkey"), col("l_quantity"), col("l_extendedprice")),
        struct(col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_quantity"))).as("f"))
      .select(col("l_orderkey"), col("f.l_partkey").as("first_partkey"),
        col("f.l_quantity").as("first_quantity"),
        col("f.l_extendedprice").as("first_price"))
    val o = orders(s, d)
    o.join(first, o("o_orderkey") === first("l_orderkey"), "left")
      .select(col("o_orderkey"), col("o_totalprice"),
        col("first_partkey"), col("first_quantity"), col("first_price"))
      .orderBy("o_orderkey")
  }

  val all: Seq[Q] = Seq(q167AnyJoin)
}
