package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TiffTags._

/** Build→walk round trip for the dual-endianness TIFF IFD walker,
  * against the closed-form tag inventory, plus malformation sentinels.
  */
class TiffTagsSpec extends AnyFunSuite {

  private def expectedChecksum(seed: Long): Long =
    256 * (seed % 977 + 1) + 257 * (seed % 433 + 1) + 259 +
      (0L until seed % 3).map(i => (32768 + i) * ((seed * 31 + i) % 65536)).sum

  test("walk recovers the generated IFD in both byte orders") {
    for (seed <- 0L to 64L) {
      val t = buildTiff(seed)
      // even → II, odd → MM; both must parse with the same code path
      assert(t(0) === (if (seed % 2 == 0) 'I' else 'M').toByte)
      assert(tiffWalk(t, 0) === 3 + seed % 3, s"n seed=$seed")
      assert(tiffWalk(t, 1) === seed % 977 + 1, s"w seed=$seed")
      assert(tiffWalk(t, 2) === seed % 433 + 1, s"h seed=$seed")
      assert(tiffWalk(t, 3) === expectedChecksum(seed), s"ck seed=$seed")
    }
  }

  test("endianness actually differs on the wire") {
    // same logical inventory, flipped byte order → different bytes
    val a = buildTiff(2); val b = buildTiff(3)
    assert(a(0) === 'I'.toByte && b(0) === 'M'.toByte)
    // magic 42 sits in opposite byte positions
    assert((a(2) & 0xFF) === 42 && (a(3) & 0xFF) === 0)
    assert((b(2) & 0xFF) === 0 && (b(3) & 0xFF) === 42)
  }

  test("malformed inputs return the -1 sentinel, never throw") {
    assert(tiffWalk(null, 0) === -1L)
    assert(tiffWalk(Array[Byte]('I', 'M', 0, 42), 0) === -1L) // mixed BOM
    val t = buildTiff(5)
    for (cut <- Seq(1, 4, 8, t.length / 2, t.length - 3))
      assert(tiffWalk(t.take(cut), 0) === -1L, s"cut=$cut")
    // magic byte corrupted
    val bad = t.clone(); bad(2) = 7; bad(3) = 7
    assert(tiffWalk(bad, 0) === -1L)
    // unsorted tags rejected: swap the first two entries
    val u = buildTiff(4).clone() // little-endian, entries at offset 10
    for (k <- 0 until 12) {
      val tmp = u(10 + k); u(10 + k) = u(22 + k); u(22 + k) = tmp
    }
    assert(tiffWalk(u, 0) === -1L)
  }
}
