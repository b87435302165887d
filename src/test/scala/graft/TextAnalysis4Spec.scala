package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis4

class TextAnalysis4Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("pack_sequences: fragments tile the token stream exactly — " +
    "full bins hold PackLen tokens, per-doc fragments sum to the doc's " +
    "token count, split flags mark exactly the straddling docs") {
    val L = TextAnalysis4.PackLen
    val rows = TextAnalysis4.packSequences.run(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(rows.nonEmpty)

    // per-bin: fragments tile [0, L) contiguously; all bins but the
    // last are exactly full
    val byBin = rows.groupBy(_._2).toSeq.sortBy(_._1)
    val lastBin = byBin.map(_._1).max
    for ((bin, frs) <- byBin) {
      val sorted = frs.sortBy(_._3)
      assert(sorted.head._3 === 0L, s"bin $bin does not start at 0")
      sorted.toSeq.sliding(2).foreach {
        case Seq((_, _, p1, n1, _), (_, _, p2, _, _)) =>
          assert(p1 + n1 === p2, s"bin $bin has a gap/overlap at pos $p2")
        case _ => ()
      }
      val filled = sorted.last._3 + sorted.last._4
      if (bin != lastBin) assert(filled === L, s"bin $bin not full: $filled")
      else assert(filled <= L)
    }

    // per-doc: fragment lengths sum to the doc's token count
    val docTok = graft.Tables.documents(spark, sf)
      .selectExpr("doc_id", "cast(size(split(trim(text), ' ')) as long) as n")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDoc = rows.groupBy(_._1)
    assert(byDoc.keySet === docTok.keySet)
    for ((doc, frs) <- byDoc) {
      assert(frs.map(_._4).sum === docTok(doc), s"doc $doc fragment sum")
      val split = frs.exists(_._5)
      assert(split === (frs.length > 1 || frs.exists(_._5)),
        s"doc $doc split flag")
      // is_split is uniform across a doc's fragments and true iff >1 bins
      assert(frs.map(_._5).distinct.length === 1, s"doc $doc mixed flags")
      assert(frs.head._5 === (frs.length > 1), s"doc $doc flag vs spans")
    }
  }

  test("mixture_sample: keep rates match the temperature formula per " +
    "language and the hash threshold is exact") {
    val rows = TextAnalysis4.mixtureSample.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    assert(rows.nonEmpty)
    val byLang = rows.groupBy(_._2)
    val nl = byLang.map { case (l, rs) => l -> rs.length.toLong }
    val kl = nl.map { case (l, n) =>
      l -> math.floor(math.sqrt(n.toDouble) * 1048576 + 0.5).toLong }
    val sumk = kl.values.sum
    val target = nl.values.sum / 2
    for ((l, rs) <- byLang) {
      // exact expected rate (possibly > 1 → everything kept)
      val rate = math.min(1.0,
        kl(l).toDouble * target / (sumk.toDouble * nl(l)))
      val got = rs.count(_._3).toDouble / rs.length
      // the portable hash is uniform; n_l ≈ 10-60 at sf0.001, so allow
      // generous sampling noise while still pinning the rate
      assert(math.abs(got - rate) < 0.25, s"lang $l rate $got vs $rate")
      // per-doc determinism: recompute the threshold rule directly
      rs.foreach { case (id, _, kept) =>
        val h = BigInt(id % 67108864L) * 2654435761L % 4294967296L
        val lhs = h * sumk * nl(l)
        val rhs = BigInt(kl(l)) * target * 4294967296L
        assert(kept === (lhs < rhs), s"doc $id kept flag")
      }
    }
  }
}
