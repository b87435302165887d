package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{JpegSegments, Mp4Boxes}

/** Builder/walker round-trip specs for the JPEG and MP4 container
  * walkers, plus malformed-input sentinels — the walker must survive
  * hostile bytes, not just its own builder's output. */
class JpegMp4Spec extends AnyFunSuite {

  test("jpegWalk round-trips every generating formula across seeds") {
    (0L until 600L).foreach { seed =>
      val b = JpegSegments.buildJpeg(seed)
      assert(JpegSegments.jpegWalk(b, 0) === 5 + seed % 3 + 1, s"segs @ $seed")
      assert(JpegSegments.jpegWalk(b, 1) === seed % 997 + 1, s"w @ $seed")
      assert(JpegSegments.jpegWalk(b, 2) === seed % 499 + 1, s"h @ $seed")
      assert(JpegSegments.jpegWalk(b, 3) === seed % 251 + 1, s"scan @ $seed")
      val dqt = (0 until 64).map(j => (seed + j) % 256).sum
      assert(JpegSegments.jpegWalk(b, 4) === dqt, s"dqt @ $seed")
    }
  }

  test("jpegWalk rejects malformed streams with the -1 sentinel") {
    assert(JpegSegments.jpegWalk(null, 0) === -1L)
    assert(JpegSegments.jpegWalk(Array[Byte](1, 2, 3), 0) === -1L)
    val ok = JpegSegments.buildJpeg(42L)
    // truncate before EOI: scan never terminates
    assert(JpegSegments.jpegWalk(ok.dropRight(2), 0) === -1L)
    // desync the first marker byte after SOI
    val bad = ok.clone(); bad(2) = 0x00
    assert(JpegSegments.jpegWalk(bad, 0) === -1L)
    // corrupt a segment length so it overruns the buffer
    val bad2 = ok.clone(); bad2(4) = 0x7F
    assert(JpegSegments.jpegWalk(bad2, 0) === -1L)
  }

  test("mp4Walk round-trips every generating formula across seeds") {
    (0L until 600L).foreach { seed =>
      val b = Mp4Boxes.buildMp4(seed)
      val nMdat = seed % 3 + 1
      assert(Mp4Boxes.mp4Walk(b, 0) === 3 + nMdat, s"boxes @ $seed")
      val mdat = (0L until nMdat).map(i => (seed + 13 * i) % 4093 + 1).sum
      assert(Mp4Boxes.mp4Walk(b, 1) === mdat, s"mdat @ $seed")
      assert(Mp4Boxes.mp4Walk(b, 2) === seed % 9973 + 1, s"ts @ $seed")
      assert(Mp4Boxes.mp4Walk(b, 3) === seed % 86400 + 1, s"dur @ $seed")
    }
  }

  test("id3Walk round-trips every generating formula across seeds") {
    import graft.functions.Id3Tags
    (0L until 600L).foreach { seed =>
      val b = Id3Tags.buildId3(seed)
      assert(Id3Tags.id3Walk(b, 0) === 3 + seed % 3, s"frames @ $seed")
      val comm = (0L until seed % 3).map(i => (seed + 5 * i) % 29 + 5).sum
      val payload = (1 + seed % 23 + 1) + (1 + seed % 17 + 1) +
        (1 + (seed % 99 + 1).toString.length) + comm
      assert(Id3Tags.id3Walk(b, 1) === payload, s"payload @ $seed")
      assert(Id3Tags.id3Walk(b, 2) === seed % 23 + 1, s"title @ $seed")
      assert(Id3Tags.id3Walk(b, 3) === seed % 99 + 1, s"track @ $seed")
      assert(Id3Tags.id3Walk(b, 4) ===
        payload + 10 * (3 + seed % 3) + seed % 33, s"size @ $seed")
    }
  }

  test("id3Walk rejects malformed streams with the -1 sentinel") {
    import graft.functions.Id3Tags
    assert(Id3Tags.id3Walk(null, 0) === -1L)
    assert(Id3Tags.id3Walk(Array[Byte](1, 2, 3), 0) === -1L)
    val ok = Id3Tags.buildId3(77L) // 77 % 33 = 11 → real padding present
    // truncation below the declared size
    assert(Id3Tags.id3Walk(ok.dropRight(1), 0) === -1L)
    // nonzero byte inside the padding
    val bad = ok.clone(); bad(bad.length - 1) = 1
    assert(Id3Tags.id3Walk(bad, 0) === -1L)
    // non-digit in TRCK (first TRCK digit is at a fixed offset:
    // header 10 + TIT2 frame + TPE1 frame + TRCK header + encoding)
    val titleLen = (77L % 23 + 1).toInt; val artistLen = (77L % 17 + 1).toInt
    val trckDigit = 10 + (10 + 1 + titleLen) + (10 + 1 + artistLen) + 10 + 1
    val bad2 = ok.clone(); bad2(trckDigit) = 'x'.toByte
    assert(Id3Tags.id3Walk(bad2, 0) === -1L)
  }

  test("mp4Walk rejects malformed streams with the -1 sentinel") {
    assert(Mp4Boxes.mp4Walk(null, 0) === -1L)
    assert(Mp4Boxes.mp4Walk(Array.fill[Byte](7)(0), 0) === -1L)
    val ok = Mp4Boxes.buildMp4(42L)
    // truncation: last box overruns
    assert(Mp4Boxes.mp4Walk(ok.dropRight(1), 0) === -1L)
    // zero-size box
    val bad = ok.clone(); bad(0) = 0; bad(1) = 0; bad(2) = 0; bad(3) = 0
    assert(Mp4Boxes.mp4Walk(bad, 0) === -1L)
    // corrupt the moov child size so children stop tiling the container
    val bad2 = ok.clone(); bad2(16 + 3) = 31
    assert(Mp4Boxes.mp4Walk(bad2, 0) === -1L)
  }
}
