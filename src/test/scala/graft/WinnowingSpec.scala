package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Winnowing

class WinnowingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def keys(s: String, k: Int = 8, w: Int = 8): Seq[Long] =
    Winnowing.winnowKeys(UTF8String.fromString(s), k, w)
      .toLongArray().toSeq

  /** brute-force reference: all gram hashes, per-window min with
    * rightmost tie-break, global distinct. */
  private def ref(s: String, k: Int = 8, w: Int = 8): Set[Long] = {
    val cps = s.codePoints().toArray
    val m = cps.length - k + 1
    if (m < w) return Set.empty
    val hs = (0 until m).map { g =>
      var acc = 0L
      (0 until k).foreach(t => acc = (acc * 31 + cps(g + t)) % 1000000007L)
      acc * Winnowing.PosBase + (Winnowing.PosMask - (g + 1))
    }
    (w - 1 until m).map(j => hs.slice(j - w + 1, j + 1).min).toSet
  }

  test("selection ≡ brute force on random ASCII strings") {
    val rnd = new scala.util.Random(42)
    (1 to 50).foreach { _ =>
      val len = 8 + rnd.nextInt(200)
      val s = (1 to len).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      assert(keys(s).toSet === ref(s), s"mismatch for $s")
      // picks are position-non-decreasing, emitted once each
      val ks = keys(s)
      assert(ks.distinct === ks)
    }
  }

  test("guarantee: a shared substring ≥ k+w−1 chars shares a fingerprint") {
    val rnd = new scala.util.Random(7)
    def rand(n: Int) = (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    (1 to 20).foreach { _ =>
      val common = rand(15 + rnd.nextInt(30))
      val d1 = rand(40) + common + rand(40)
      val d2 = rand(40) + common + rand(40)
      val h1 = keys(d1).map(_ >> 31).toSet
      val h2 = keys(d2).map(_ >> 31).toSet
      assert(h1.intersect(h2).nonEmpty,
        s"no shared fingerprint for common='$common'")
    }
  }

  test("rightmost-min tie rule and short-input contract") {
    // 'aaaa…' ⇒ all gram hashes equal ⇒ every window picks its newest gram
    val s = "a" * 30
    val ks = keys(s)
    val m = 30 - 8 + 1 // 23 grams
    val positions = ks.map(k => Winnowing.PosMask - (k % Winnowing.PosBase))
    assert(positions === (8L to m.toLong)) // one pick per window, rightmost
    assert(keys("a" * 14).isEmpty) // below k+w−1
    assert(keys("a" * 15).size === 1)
  }

  test("query density matches the ≈2/(w+1) winnowing band on the corpus") {
    val got = graft.operators.TextAnalysis8.winnowing
      .run(spark, TestSpark.tiny)
      .select("doc_id", "n_fp", "n_shared", "density")
      .as[(Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, nFp, nShared, dens) =>
      assert(nFp >= 1 && nShared <= nFp, s"doc $id")
      assert(dens > 0.0 && dens <= 1.0)
    }
    val mean = got.map(_._4).sum / got.length
    // 2/(w+1) = 0.222… ; the corpus' 12-char vocabulary inflates tie
    // runs, so allow a wide but binding band
    assert(mean > 0.10 && mean < 0.45, s"mean density $mean")
  }
}
