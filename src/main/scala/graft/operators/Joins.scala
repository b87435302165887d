package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join utilities for cluster-scale shapes (SURVEY.md §2.3 joins row).
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; explicit
  * salting remains the tool when one hot key dominates a shuffle hash
  * join or an aggregation feeding a join. Both utilities preserve exact
  * join semantics — specs assert equality with the unsalted plan.
  */
object Joins {

  /** Equi-join with key salting: the big (skewed) side gets a
    * deterministic per-row salt in [0, saltFactor); the small side is
    * replicated saltFactor× so every (key, salt) bucket finds its match.
    * One hot key thus spreads over saltFactor shuffle partitions. */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltFactor: Int,
      joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    // salt from a row hash — deterministic, no RNG state, spreads evenly
    val salted = big.withColumn("__graft_salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(saltFactor.toLong)))
    val expanded = small.withColumn("__graft_salt",
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    salted.join(expanded, keys :+ "__graft_salt", joinType)
      .drop("__graft_salt")
  }

  /** Broadcast a dimension side explicitly (dims below the auto
    * threshold broadcast anyway; this pins the hint for plans where
    * stats mislead the optimizer). */
  def broadcastDim(fact: DataFrame, dim: DataFrame, cond: Column,
      joinType: String = "inner"): DataFrame =
    fact.join(broadcast(dim), cond, joinType)
}
