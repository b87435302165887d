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

  /** Skew-aware equi-join salting.
    *
    * Round-1 form replicated the ENTIRE small side saltFactor×, which
    * multiplies shuffle volume for every key whether skewed or not. This
    * form salts only detected-hot keys:
    *
    *   1. one streaming pass over the big side feeds a Misra-Gries
    *      heavy-hitter sketch ([[graft.functions.FrequentItems]]) on the
    *      hashed join key — bounded memory, map-side mergeable, NO extra
    *      shuffle (any key above ~1/capacity of the rows provably
    *      survives the sketch);
    *   2. the top `maxHotKeys` survivors become the hot set (a driver
    *      list compiled into a codegen'd IN filter — false positives just
    *      salt a cold key, which is harmless, so no threshold to tune);
    *   3. hot-key rows get the salted join (big side salted by row hash,
    *      small side replicated saltFactor× FOR HOT KEYS ONLY);
    *   4. the cold remainder takes the plain equi-join;
    *   5. union of the two — an exact partition of the key space.
    *
    * Only inner/left_outer are supported: replicating the small side is
    * semantics-preserving for those (an unmatched replicated small row
    * would be emitted saltFactor× under right/full outer).
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltFactor: Int,
      joinType: String = "inner",
      maxHotKeys: Int = 64): DataFrame = {
    require(saltFactor > 0)
    require(Set("inner", "left", "left_outer", "leftouter")(joinType),
      s"saltedJoin preserves exact semantics only for inner/left_outer joins, got $joinType")
    val keyHash = xxhash64(keys.map(col).toIndexedSeq: _*)
    // detection runs on a 10% sample: a key's SHARE of rows is invariant
    // under uniform sampling, so sketch survival (share > 1/capacity) is
    // unaffected, and mis-detection only costs performance, never
    // correctness — the salted and plain branches compute the same join
    val sketch = udaf(new graft.functions.FrequentItems(16 * maxHotKeys))
    val hotKeys: Seq[Long] = big
      .sample(withReplacement = false, 0.1, seed = 42)
      .select(keyHash.cast("string").as("__k"))
      .agg(sketch(col("__k")).as("top"))
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .take(maxHotKeys).map(_.getString(0).toLong)
    saltedJoinForced(big, small, keys, saltFactor, joinType, hotKeys)
  }

  /** [[saltedJoin]] with the hot set INJECTED instead of detected —
    * the correctness claim that makes detection quality a pure
    * performance knob: for ANY hot set (empty = detection failure,
    * everything = over-detection, a wrong key = mis-detection) the
    * output equals the plain join, because hot/cold is an exact
    * partition of the key space and both branches compute the same
    * join. `JoinsSpec` proves all three mis-detection modes on a
    * skewed corpus. */
  private[graft] def saltedJoinForced(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltFactor: Int,
      joinType: String,
      hotKeys: Seq[Long]): DataFrame = {
    val keyHash = xxhash64(keys.map(col).toIndexedSeq: _*)
    if (hotKeys.isEmpty) return big.join(small, keys, joinType)
    val isHot = keyHash.isin(hotKeys: _*)
    val salted = big.filter(isHot).withColumn("__graft_salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(saltFactor.toLong)))
    val expanded = small.filter(isHot).withColumn("__graft_salt",
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    val hotJoined = salted.join(expanded, keys :+ "__graft_salt", joinType)
      .drop("__graft_salt")
    val coldJoined = big.filter(!isHot).join(small.filter(!isHot), keys, joinType)
    hotJoined.unionByName(coldJoined)
  }

  /** Broadcast a dimension side explicitly (dims below the auto
    * threshold broadcast anyway; this pins the hint for plans where
    * stats mislead the optimizer). */
  def broadcastDim(fact: DataFrame, dim: DataFrame, cond: Column,
      joinType: String = "inner"): DataFrame =
    fact.join(broadcast(dim), cond, joinType)

  /** Pure range join (no equi key) as a HASH join via bin bucketing —
    * the shape Spark otherwise plans as a broadcast-nested-loop over the
    * full cross product, which dies when neither side is tiny.
    *
    * Each interval [start, end) explodes to the bins it overlaps
    * (≤ ceil(len/binWidth)+1 rows); each point maps to exactly ONE bin,
    * so the bin equi-join meets every true (interval, point) pair exactly
    * once — no dedup needed — and the exact containment filter drops the
    * bin-collision false positives. Pick binWidth ≈ the typical interval
    * length: replication stays ~2× while bins stay selective. All columns
    * must be integral (days, epoch seconds, …); inner join semantics.
    */
  def binnedRangeJoin(intervals: DataFrame, points: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0)
    val ib = intervals.withColumn("__graft_bin",
      explode(sequence((col(startCol) / binWidth).cast("long"),
        ((col(endCol) - 1) / binWidth).cast("long"))))
    val pb = points.withColumn("__graft_bin",
      (col(pointCol) / binWidth).cast("long"))
    ib.join(pb, Seq("__graft_bin"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__graft_bin")
  }
}
