package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{EbmlTree, ZipDirectory}

/** Builder/walker round-trip specs for the EBML (VINT tree) and ZIP
  * (backward EOCD) walkers, plus malformed-input sentinels — the
  * walkers must survive hostile bytes, not just their own builders'
  * output. */
class EbmlZipSpec extends AnyFunSuite {

  test("ebmlWalk round-trips every generating formula across seeds") {
    (0L until 600L).foreach { seed =>
      val b = EbmlTree.buildEbml(seed)
      val n = seed % 4 + 1
      assert(EbmlTree.ebmlWalk(b, 0) === 4 + n, s"census @ $seed")
      val cb = (0L until n).map(i => (seed + 7 * i) % 199 + 1).sum
      assert(EbmlTree.ebmlWalk(b, 1) === cb, s"clusterBytes @ $seed")
      assert(EbmlTree.ebmlWalk(b, 2) === seed % 999983 + 1, s"ts @ $seed")
      assert(EbmlTree.ebmlWalk(b, 3) === n, s"nClusters @ $seed")
    }
  }

  test("ebmlWalk rejects malformed streams with the -1 sentinel") {
    assert(EbmlTree.ebmlWalk(null, 0) === -1L)
    assert(EbmlTree.ebmlWalk(Array[Byte](1, 2, 3), 0) === -1L)
    val ok = EbmlTree.buildEbml(42L)
    // truncation: last cluster overruns
    assert(EbmlTree.ebmlWalk(ok.dropRight(1), 0) === -1L)
    // a 0x00 lead byte has no VINT marker within 8 bits
    val bad = ok.clone(); bad(0) = 0x00
    assert(EbmlTree.ebmlWalk(bad, 0) === -1L)
    // corrupt the segment size VINT (byte 15 = its low byte: header is
    // id 0-3, size 4-5, payload 6-9; segment id 10-13, size 14-15) so
    // children stop tiling the container
    val bad2 = ok.clone(); bad2(15) = (bad2(15) + 1).toByte
    assert(EbmlTree.ebmlWalk(bad2, 0) === -1L)
  }

  test("zipWalk round-trips every generating formula across seeds") {
    (0L until 600L).foreach { seed =>
      val b = ZipDirectory.buildZip(seed)
      val n = seed % 5 + 1
      assert(ZipDirectory.zipWalk(b, 0) === n, s"entries @ $seed")
      val comp = (0L until n).map(i => (seed + 11 * i) % 509 + 1).sum
      assert(ZipDirectory.zipWalk(b, 1) === comp, s"comp @ $seed")
      val uncomp = comp + (0L until n).map(i => (i % 3) * 17).sum
      assert(ZipDirectory.zipWalk(b, 2) === uncomp, s"uncomp @ $seed")
      val defl = (0L until n).count(i => (seed + i) % 2 == 1).toLong
      assert(ZipDirectory.zipWalk(b, 3) === defl, s"deflated @ $seed")
    }
  }

  test("flacWalk round-trips every generating formula across seeds") {
    import graft.functions.FlacStreaminfo
    (0L until 600L).foreach { seed =>
      val b = FlacStreaminfo.buildFlac(seed)
      assert(FlacStreaminfo.flacWalk(b, 0) === seed % 96000 + 8000,
        s"rate @ $seed")
      assert(FlacStreaminfo.flacWalk(b, 1) === seed % 8 + 1, s"ch @ $seed")
      assert(FlacStreaminfo.flacWalk(b, 2) === seed % 25 + 8, s"bps @ $seed")
      assert(FlacStreaminfo.flacWalk(b, 3) === seed % 999999937 + 1,
        s"samples @ $seed")
      assert(FlacStreaminfo.flacWalk(b, 4) === 2L, s"blocks @ $seed")
    }
  }

  test("flacWalk rejects malformed streams with the -1 sentinel") {
    import graft.functions.FlacStreaminfo
    assert(FlacStreaminfo.flacWalk(null, 0) === -1L)
    assert(FlacStreaminfo.flacWalk(new Array[Byte](50), 0) === -1L)
    val ok = FlacStreaminfo.buildFlac(65L) // 65 % 64 = 1 → padding present
    // truncation: padding block overruns
    assert(FlacStreaminfo.flacWalk(ok.dropRight(1), 0) === -1L)
    // bad magic
    val bad = ok.clone(); bad(0) = 'X'.toByte
    assert(FlacStreaminfo.flacWalk(bad, 0) === -1L)
    // first block not STREAMINFO
    val bad2 = ok.clone(); bad2(4) = 0x01
    assert(FlacStreaminfo.flacWalk(bad2, 0) === -1L)
    // last-flag stripped from the terminator → chain never ends
    val bad3 = ok.clone(); bad3(42) = 0x01
    assert(FlacStreaminfo.flacWalk(bad3, 0) === -1L)
  }

  test("zipWalk rejects malformed archives with the -1 sentinel") {
    assert(ZipDirectory.zipWalk(null, 0) === -1L)
    assert(ZipDirectory.zipWalk(new Array[Byte](30), 0) === -1L)
    val ok = ZipDirectory.buildZip(42L) // comment len 42%13=3 > 0
    // truncation: EOCD comment no longer reaches the end
    assert(ZipDirectory.zipWalk(ok.dropRight(1), 0) === -1L)
    // EOCD count vs directory census mismatch
    val bad = ok.clone()
    val eocd = bad.length - 22 - (42 % 13)
    bad(eocd + 10) = (bad(eocd + 10) + 1).toByte
    assert(ZipDirectory.zipWalk(bad, 0) === -1L)
    // a central-directory local offset pointing at a non-PK\3\4 byte
    val bad2 = ok.clone()
    bad2(0) = 'X'.toByte // first local header signature byte
    assert(ZipDirectory.zipWalk(bad2, 0) === -1L)
  }
}
