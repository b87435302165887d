package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PngChunks._

/** Build→walk round trip for the PNG chunk walker, against the
  * closed-form chunk inventory, plus malformation sentinels.
  */
class PngChunksSpec extends AnyFunSuite {

  private def expectedChunks(seed: Long): Long =
    (seed % 3 + 1) + (seed % 4 + 1) + 2
  private def expectedIdat(seed: Long): Long =
    (0L until (seed % 4 + 1)).map(i => (seed + 7 * i) % 13 + 1).sum

  test("walk recovers the generated chunk inventory") {
    for (seed <- 0L to 64L) {
      val png = buildPng(seed)
      assert(pngWalk(png, 0) === expectedChunks(seed), s"chunks seed=$seed")
      assert(pngWalk(png, 1) === expectedIdat(seed), s"idat seed=$seed")
      val bad = if (seed % 5 == 0) 1 else 0
      assert(pngWalk(png, 2) === expectedChunks(seed) - bad, s"crc seed=$seed")
    }
  }

  test("corrupting any payload byte is caught by exactly the CRC mode") {
    val png = buildPng(7) // 7 % 5 != 0 → all CRCs valid as built
    assert(pngWalk(png, 2) === expectedChunks(7))
    // flip one bit inside the first tEXt payload (offset: sig + IHDR = 8
    // + 25; chunk header 8 → first payload byte at 41)
    val mut = png.clone()
    mut(41) = (mut(41) ^ 0x40).toByte
    assert(pngWalk(mut, 0) === pngWalk(png, 0)) // structure unchanged
    assert(pngWalk(mut, 2) === expectedChunks(7) - 1)
  }

  test("malformed inputs return the -1 sentinel, never throw") {
    assert(pngWalk(null, 0) === -1L)
    assert(pngWalk(Array.emptyByteArray, 0) === -1L)
    assert(pngWalk("not a png at all".getBytes, 0) === -1L)
    val png = buildPng(3)
    // truncation anywhere inside the chunk stream
    for (cut <- Seq(4, 8, 12, png.length / 2, png.length - 1))
      assert(pngWalk(png.take(cut), 0) === -1L, s"cut=$cut")
    // declared length running past the buffer
    val lie = png.clone()
    lie(8) = 0x7F // IHDR length high byte → huge declared length
    assert(pngWalk(lie, 0) === -1L)
  }
}
