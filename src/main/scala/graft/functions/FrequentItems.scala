package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy hitters as a typed [[Aggregator]] (the §2.3
  * "custom typed agg for a non-built-in statistic" tier): mergeable,
  * bounded-memory approximate top-k counting for token/value frequency
  * over arbitrarily large corpora.
  *
  * Guarantees: counts undercount by at most N/capacity; when the number
  * of distinct items is below `capacity` no decrement ever fires and the
  * counts are EXACT — which is what makes the driver-oracle check of
  * [[graft.operators.TextAnalysis.frequentTokens]] well-defined.
  * Buffers merge associatively (sum, then trim to the top `capacity` by
  * count), so partial aggregation works map-side like any built-in.
  */
final class FrequentItems(capacity: Int)
    extends Aggregator[String, mutable.Map[String, Long], Seq[(String, Long)]] {
  require(capacity > 0)

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  override def reduce(b: mutable.Map[String, Long], item: String)
      : mutable.Map[String, Long] = {
    if (b.contains(item) || b.size < capacity) {
      b.update(item, b.getOrElse(item, 0L) + 1L)
    } else {
      // decrement-all step; drop zeros (classic Misra-Gries)
      val dead = mutable.ArrayBuffer.empty[String]
      b.keysIterator.foreach { k =>
        val v = b(k) - 1L
        if (v <= 0L) dead += k else b.update(k, v)
      }
      dead.foreach(b.remove)
    }
    b
  }

  override def merge(a: mutable.Map[String, Long], b: mutable.Map[String, Long])
      : mutable.Map[String, Long] = {
    b.foreach { case (k, v) => a.update(k, a.getOrElse(k, 0L) + v) }
    if (a.size > capacity) {
      // keep the top `capacity` by (count, item) — deterministic trim
      val keep = a.toSeq.sortBy { case (k, v) => (-v, k) }.take(capacity)
      a.clear()
      keep.foreach { case (k, v) => a.update(k, v) }
    }
    a
  }

  override def finish(b: mutable.Map[String, Long]): Seq[(String, Long)] =
    b.toSeq.sortBy { case (k, v) => (-v, k) }

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.kryo[mutable.Map[String, Long]]
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}
