package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Similarity, Similarity3}

/** Plain-Scala reference recomputation of the similarity-eval batch
  * (fixed-centroid cluster assignment, ANN recall report) on sf0.001.
  */
class SimilarityEvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def embs(): Seq[(Long, IndexedSeq[Float])] =
    Tables.embeddings(spark, sf).selectExpr("vec_id", "embedding")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Float](1).toIndexedSeq))

  // sequential fold in array order — same arithmetic as DotProduct
  private def dot(a: IndexedSeq[Float], b: IndexedSeq[Float]): Double =
    a.indices.foldLeft(0.0)((acc, i) => acc + a(i).toDouble * b(i).toDouble)
  private def cos(a: IndexedSeq[Float], b: IndexedSeq[Float]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  test("sim_cluster_assign matches a plain-Scala reference") {
    val e = embs()
    val cen = e.filter(_._1 < 8)
    val assigned = e.map { case (id, v) =>
      val best = cen.map { case (cid, cv) => (cid, cos(v, cv)) }
        .minBy { case (cid, s) => (-s, cid) }
      (best._1, math.floor(best._2 * 1099511627776.0 + 0.5).toLong)
    }
    val expected = assigned.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (cid, v) =>
        val st = v.map(_._2).sum
        (cid, v.size.toLong, (st.toDouble / 1099511627776.0) / v.size)
      }
    val got = Similarity3.clusterAssign.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(_._1) === expected.map(_._1))
    assert(got.map(_._2) === expected.map(_._2))
    for (((_, _, g), (_, _, x)) <- got.zip(expected))
      assert(math.abs(g - x) < 1e-12)
  }

  test("sim_centroid_update matches a plain-Scala Lloyd step") {
    val e = embs()
    val cen = e.filter(_._1 < 8)
    val members = e.map { case (id, v) =>
      val best = cen.map { case (cid, cv) => (cid, cos(v, cv)) }
        .minBy { case (cid, s) => (-s, cid) }._1
      (best, v)
    }
    val expected = members.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (cid, vs) =>
        (0 until 64).map { d =>
          val qs = vs.map(v => math.floor(
            v._2(d).toDouble * 1099511627776.0 + 0.5).toLong)
          (cid, (d + 1).toLong,
            (qs.sum.toDouble / 1099511627776.0) / qs.size)
        }
    }
    val got = Similarity3.centroidUpdate.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(g => (g._1, g._2)) === expected.map(x => (x._1, x._2)))
    for (((_, _, g), (_, _, x)) <- got.zip(expected))
      assert(math.abs(g - x) < 1e-12)
  }

  test("sim_ann_recall agrees with a direct join of the two registered queries") {
    val exact = Similarity.topkBruteForce.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annLsh.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = exact.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (q, rows) =>
        val m = rows.count(ann).toLong
        (q, m, m.toDouble / 5)
      }
    val got = Similarity3.annRecall.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === expected)
    // the LSH tier must actually be a useful index on this corpus
    val meanRecall = got.map(_._3).sum / got.size
    assert(meanRecall >= 0.5, s"mean recall@5 $meanRecall below floor")
  }
}
