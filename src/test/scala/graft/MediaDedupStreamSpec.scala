package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BmpPixels
import graft.operators.Multimodal2
import graft.streaming.Streams

/** Streaming maintenance for the media signature indexes (r14 VERDICT
  * task 2): the fold of per-batch pair DELTAS equals the one-shot
  * banded pair set after every batch — under cross-batch redelivery
  * and across a bucket-cap crossing (the removal path). */
class MediaDedupStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bands(h: Long): Seq[Long] =
    (0 until 4).map(k => (h >> (16 * k)) & 0xFFFFL)

  /** one-shot banded pairs at FINAL bucket counts (the bandedHammingPairs
    * semantics: shared ≤cap bucket within a block, Hamming ≤ t) */
  private def oneShot(sigs: Seq[(Long, Long, Long)], cap: Int,
      t: Int): Set[(Long, Long, Long)] = {
    val cnt = scala.collection.mutable.Map.empty[(Long, Int, Long), Int]
    for ((_, blk, h) <- sigs; (s, b) <- bands(h).zipWithIndex)
      cnt((blk, b, s)) = cnt.getOrElse((blk, b, s), 0) + 1
    val arr = sigs.sortBy(_._1)
    (for {
      i <- arr.indices; j <- (i + 1) until arr.length
      (a, blkA, ha) = arr(i); (b, blkB, hb) = arr(j)
      if blkA == blkB
      if bands(ha).zipWithIndex.exists { case (s, k) =>
        ((hb >> (16 * k)) & 0xFFFFL) == s && cnt((blkA, k, s)) <= cap
      }
      d = java.lang.Long.bitCount(ha ^ hb)
      if d <= t
    } yield (a, b, d.toLong)).toSet
  }

  /** fold the delta stream: adds minus removes */
  private def fold(deltas: Seq[(Long, Long, Long, Long, String)])
      : Set[(Long, Long, Long)] = {
    val adds = deltas.collect { case (a, b, _, h, "add") => (a, b, h) }.toSet
    val rems = deltas.collect { case (a, b, _, _, "remove") => (a, b) }.toSet
    adds.filterNot { case (a, b, _) => rems((a, b)) }
  }

  private def runBatch(rows: Seq[(Long, Long, Long)], dir: String,
      id: Long, cap: Long): Seq[(Long, Long, Long, Long, String)] =
    Streams.mediaDedupIncrementalBatch(
      rows.toDF("doc_id", "block", "hash"), dir, id, 3, cap)
      .as[(Long, Long, Long, Long, String)].collect().toSeq

  test("delta fold ≡ one-shot after every batch, with cross-batch " +
    "redelivery AND a cap crossing that retracts a hot bucket's pairs") {
    val dir = java.nio.file.Files.createTempDirectory("mediadedup").toString
    // content pairs (2k, 2k+1): hash differs in ≤3 bits within a block;
    // across contents hashes are iid-ish multiplicative mixes
    def baseHash(c: Long): Long = (c + 1) * 0x9E3779B97F4A7C15L
    val normal: Seq[(Long, Long, Long)] = (0L until 40L).map { id =>
      val c = id / 2
      val h =
        if (id % 2 == 0) baseHash(c)
        else baseHash(c) ^ (1L << (c % 60).toInt) // 1-bit re-encode
      (id, (c % 3) + 1, h) // block = content-derived class
    }
    // hot bucket: identical hash H in one block — all-pairs until the
    // bucket crosses cap, then every pair must retract
    val hot: Seq[(Long, Long, Long)] =
      (1000L until 1010L).map(id => (id, 7L, 0x0DEC0DE0L))
    val cap = 6L
    // batch 0: first 20 normal docs + 4 hot (bucket n=4 ≤ cap)
    val b0 = normal.take(20) ++ hot.take(4)
    // batch 1: next 10 normal + 5 REDELIVERED + 6 more hot (n=10 > cap)
    val b1 = normal.slice(20, 30) ++ normal.take(5) ++ hot.drop(4)
    // batch 2: the rest
    val b2 = normal.drop(30)
    val d0 = runBatch(b0, dir, 0L, cap)
    assert(fold(d0) === oneShot(b0, cap.toInt, 3))
    // hot all-pairs present while the bucket is under cap
    assert(fold(d0).count { case (a, _, _) => a >= 1000L } === 6)
    val d1 = runBatch(b1, dir, 1L, cap)
    val arrived1 = (b0 ++ b1).distinctBy(_._1)
    assert(fold(d0 ++ d1) === oneShot(arrived1, cap.toInt, 3))
    // the crossing retracted every hot pair (including batch-0 emissions)
    assert(d1.exists(_._5 == "remove"))
    assert(!fold(d0 ++ d1).exists { case (a, _, _) => a >= 1000L })
    val d2 = runBatch(b2, dir, 2L, cap)
    val all = (b0 ++ b1 ++ b2).distinctBy(_._1)
    assert(fold(d0 ++ d1 ++ d2) === oneShot(all, cap.toInt, 3))
    // foreachBatch retry: re-running batch 1 emits the SAME deltas and
    // the fold is unchanged (reads see batch_id < 1 only)
    val d1retry = runBatch(b1, dir, 1L, cap)
    assert(d1retry.toSet === d1.toSet)
    assert(fold(d0 ++ d1retry ++ d2) === oneShot(all, cap.toInt, 3))
  }

  test("golden vs the REGISTERED image query: folding the maintainer " +
    "over batches of real aHash signatures ≡ one-shot mm_phash_dedup") {
    val dir = java.nio.file.Files.createTempDirectory("mediaphash").toString
    val quartet = expr("doc_id div 4")
    val media = BmpPixels.build(col("doc_id"),
      (quartet % 29 + 8).cast("int"), (quartet % 17 + 8).cast("int"))
    val sigs = Tables.documents(spark, TestSpark.tiny)
      .select(col("doc_id"),
        ((quartet % 29 + 8) * 1000 + quartet % 17 + 8).cast("long")
          .as("block"),
        BmpPixels.aHash(media, 8, 8, 2).as("hash"))
      .as[(Long, Long, Long)].collect().toSeq
    val mid = sigs.map(_._1).sorted.apply(sigs.size / 2)
    val d0 = runBatch(sigs.filter(_._1 <= mid), dir, 0L,
      graft.operators.Dedup.BandBucketCap)
    val d1 = runBatch(sigs.filter(_._1 > mid), dir, 1L,
      graft.operators.Dedup.BandBucketCap)
    val folded = fold(d0 ++ d1)
    val oneShotQ = Multimodal2.phashDedup.run(spark, TestSpark.tiny)
      .as[(Long, Long, Long)].collect().toSet
    assert(folded === oneShotQ)
    assert(folded.nonEmpty)
  }

  test("media maintainer plans: equi-join buckets only, never " +
    "cartesian/BNL") {
    val dir = java.nio.file.Files.createTempDirectory("mediaplan").toString
    val rows = (0L until 10L).map(id => (id, 1L, id * 17L))
    // seed one batch so the second exercises every prior-reading path
    runBatch(rows.take(5), dir, 0L, 6L)
    val df = Streams.mediaDedupIncrementalBatch(
      rows.drop(5).toDF("doc_id", "block", "hash"), dir, 1L, 3, 6L)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
