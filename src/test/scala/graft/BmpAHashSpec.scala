package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BmpPixels
import graft.operators.Multimodal2

class BmpAHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** expected aHash straight from the generating formula (the oracle's
    * derivation): sample (⌊xx·w/8⌋, ⌊yy·h/8⌋), red = (sx·sy+seed)%256 */
  private def formulaHash(seed: Long, w: Int, h: Int): Long = {
    val vs = for (yy <- 0 until 8; xx <- 0 until 8) yield {
      val sx = xx * w / 8; val sy = yy * h / 8
      ((sx.toLong * sy + seed) % 256).toInt
    }
    val sum = vs.map(_.toLong).sum
    vs.zipWithIndex.foldLeft(0L) { case (acc, (v, i)) =>
      if (v.toLong * 64 > sum) acc | (1L << i) else acc
    }
  }

  test("aHash over built BMPs ≡ the generating-formula hash " +
    "(walker honors offset/stride/bottom-up order)") {
    for (seed <- Seq(0L, 7L, 123L, 4095L); (w, h) <- Seq((8, 8), (36, 24), (9, 17))) {
      val got = BmpPixels.bmpAHash(BmpPixels.buildBmp(seed, w, h), 8, 8, 2)
      assert(got === formulaHash(seed, w, h), s"seed=$seed w=$w h=$h")
    }
  }

  test("-1 sentinel: invalid input → NULL; valid hashes never collide " +
    "with the sentinel (all-ones is provably unreachable)") {
    assert(BmpPixels.bmpAHash(Array[Byte](1, 2, 3), 8, 8, 2) === -1L)
    assert(BmpPixels.bmpAHash(null, 8, 8, 2) === -1L)
    val df = Seq(Array[Byte](0, 1, 2)).toDF("media")
      .select(BmpPixels.aHash(col("media"), 8, 8, 2).as("h"))
    assert(df.collect()(0).isNullAt(0))
  }

  test("near-identical seeds (mod-256 wrap noise) land within Hamming 3; " +
    "phash query returns exactly the banded-verified pair set") {
    // quartet neighbours differ only where (sx·sy+seed) wraps 256
    val base = 1000L
    val h0 = formulaHash(base, 20, 15)
    val h1 = formulaHash(base + 1, 20, 15)
    assert(java.lang.Long.bitCount(h0 ^ h1) <= 3)

    val pairs = Multimodal2.phashDedup.run(spark, TestSpark.tiny)
      .as[(Long, Long, Long)].collect()
    assert(pairs.nonEmpty)
    // brute-force reference: all SAME-GEOMETRY pairs at hamming ≤ 3
    // that share ≥1 band (the dimension-blocked contract)
    val docs = Tables.documents(spark, TestSpark.tiny)
      .select("doc_id").as[Long].collect().sorted
    def geom(id: Long): (Long, Long) = (id / 4 % 29 + 8, id / 4 % 17 + 8)
    val hashes = docs.map { id =>
      val (w, h) = geom(id)
      id -> formulaHash(id, w.toInt, h.toInt)
    }.toMap
    def bands(x: Long): Seq[Long] = (0 until 4).map(k => (x >> (16 * k)) & 0xFFFFL)
    val brute = (for {
      a <- docs; b <- docs if a < b
      if geom(a) == geom(b)
      ha = hashes(a); hb = hashes(b)
      if bands(ha).zip(bands(hb)).exists { case (x, y) => x == y }
      d = java.lang.Long.bitCount(ha ^ hb)
      if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(pairs.toSet === brute)
    // the planted quartet near-dups survive the blocking
    assert(brute.exists { case (a, b, _) => a / 4 == b / 4 })
  }

  test("phash components ≡ brute-force union-find over the pair graph; " +
    "canonical keep = min id per cluster") {
    val pairs = Multimodal2.phashDedup.run(spark, TestSpark.tiny)
      .select("a_id", "b_id").as[(Long, Long)].collect()
    // driver-side union-find reference
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- pairs) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(id => id -> find(id)).toMap
    val got = Multimodal2.phashComponents.run(spark, TestSpark.tiny)
      .select("id", "rep_id", "keep", "n_members")
      .as[(Long, Long, Boolean, Long)].collect()
    assert(got.map(r => r._1 -> r._2).toMap === expected)
    val sizes = expected.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    for ((id, rep, keep, n) <- got) {
      assert(keep === (id == rep))
      assert(n === sizes(rep), s"cluster size for rep $rep")
    }
    // every cluster names exactly one canonical member
    assert(got.count(_._3) === sizes.size)
  }

  test("banded pair-build plan: equi-join buckets, never cartesian/BNL") {
    val plan = Multimodal2.phashPairsBuild(spark, TestSpark.tiny)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in phash build:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNL in phash build:\n$plan")
  }

  test("NN-resampled renditions: 1:1 ratio is byte-identical to buildBmp; " +
    "2x upscale hashes IDENTICALLY; downscale degrades but stays near") {
    for (seed <- Seq(3L, 99L); (w, h) <- Seq((9, 11), (20, 16))) {
      assert(BmpPixels.buildBmpResampled(seed, w, h, 1, 1).toSeq ===
        BmpPixels.buildBmp(seed, w, h).toSeq, s"1:1 seed=$seed")
      val hb = BmpPixels.bmpAHash(BmpPixels.buildBmp(seed, w, h), 8, 8, 2)
      val hu = BmpPixels.bmpAHash(
        BmpPixels.buildBmpResampled(seed, w, h, 2, 1), 8, 8, 2)
      assert(hb === hu, s"2x upscale must be hash-invariant (seed=$seed)")
    }
    val rescale = Multimodal2.phashRescale.run(spark, TestSpark.tiny)
      .select("ham_up", "ham_down").as[(Long, Long)].collect()
    assert(rescale.forall(_._1 == 0L), "ham_up must be identically 0")
    assert(rescale.exists(_._2 > 0L), "downscale should degrade somewhere")
    assert(rescale.forall(_._2 <= 32L), "downscale stays in the near range")
  }
}
