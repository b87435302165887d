package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Similarity9, TextAnalysis10}

/** Round-10 mixture-health + PQ-audit specs: JSD against a driver-side
  * FULL-vocabulary computation (independently validating the
  * shared-vocab algebraic identity the query uses), the epoch plan
  * against exact integer arithmetic, and PQ distortion against a
  * driver-side per-cell SSE. */
class TextAnalysis10Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("text_js_divergence ≡ driver-side full-vocabulary JSD; " +
    "symmetric-bounded in [0, ln 2]") {
    val got = TextAnalysis10.jsDivergence.run(spark, TestSpark.tiny)
      .as[(String, String, Long, Double)].collect()
    val docs = Tables.documents(spark, TestSpark.tiny)
      .select("source", "text").as[(String, String)].collect()
    val counts: Map[String, Map[String, Long]] = docs.groupBy(_._1)
      .view.mapValues(_.flatMap(_._2.trim.split(" "))
        .groupBy(identity).view.mapValues(_.length.toLong).toMap).toMap
    val ln2 = math.log(2.0)
    def jsd(a: String, b: String): Double = {
      val ca = counts(a); val cb = counts(b)
      val na = ca.values.sum.toDouble; val nb = cb.values.sum.toDouble
      (ca.keySet ++ cb.keySet).iterator.map { w =>
        val p = ca.getOrElse(w, 0L) / na
        val q = cb.getOrElse(w, 0L) / nb
        val m = (p + q) / 2.0
        (if (p > 0) p * math.log(p / m) else 0.0) +
          (if (q > 0) q * math.log(q / m) else 0.0)
      }.sum / 2.0
    }
    assert(got.length === counts.size * (counts.size - 1) / 2)
    got.foreach { case (a, b, shared, v) =>
      assert(a < b)
      val ref = jsd(a, b)
      val sharedRef = (counts(a).keySet & counts(b).keySet).size.toLong
      assert(shared === sharedRef, s"($a,$b)")
      // per-term ×1e12 quantization bounds the drift by ~5e-13·|vocab|
      assert(math.abs(v - ref) <= 1e-6, s"($a,$b): $v vs $ref")
      assert(v >= -1e-9 && v <= ln2 + 1e-9, s"($a,$b)")
    }
  }

  test("curation_epoch_plan: exact integer budget arithmetic and the " +
    "4-epoch cap invariants") {
    val got = TextAnalysis10.epochPlan.run(spark, TestSpark.tiny)
      .as[(String, Long, Long, Double, Long, Double, Long, Long)].collect()
    val docs = Tables.documents(spark, TestSpark.tiny)
      .select("source", "text").as[(String, String)].collect()
    val toks = docs.groupBy(_._1).view
      .mapValues(ds => (ds.length.toLong,
        ds.map(_._2.trim.split(" ").length.toLong).sum)).toMap
    val total = toks.values.map(_._2).sum
    val k = toks.size
    val target = 2 * total / k
    assert(got.length === k)
    got.foreach { case (src, nDocs, tokens, share, tgt, epochs, planned,
        deficit) =>
      val (nd, tk) = toks(src)
      assert((nDocs, tokens) === ((nd, tk)), src)
      assert(tgt === target, src)
      assert(math.abs(share - tk.toDouble / total) <= 1e-12, src)
      assert(math.abs(epochs - target.toDouble / tk) <= 1e-12, src)
      assert(planned === math.min(4 * tk, target), src)
      assert(deficit === target - planned, src)
      assert(deficit >= 0, src)
    }
  }

  test("text_topk_coverage ≡ driver-side cumulative frequency curve") {
    val got = TextAnalysis10.topkCoverage.run(spark, TestSpark.tiny)
      .as[(Long, Long, Long, Double)].collect()
    val toks = Tables.documents(spark, TestSpark.tiny)
      .select("text").as[String].collect().flatMap(_.trim.split(" "))
    val wc = toks.groupBy(identity).view.mapValues(_.length.toLong).toSeq
    val ranked = wc.sortBy { case (w, c) => (-c, w) }
    val total = toks.length.toLong
    assert(got.map(_._1).toSeq === Seq(10L, 100L, 1000L))
    got.foreach { case (k, nTypes, covered, cov) =>
      val top = ranked.take(k.toInt)
      assert(nTypes === top.length.toLong, s"k=$k")
      assert(covered === top.map(_._2).sum, s"k=$k")
      assert(math.abs(cov - covered.toDouble / total) <= 1e-15, s"k=$k")
    }
    // the curve is monotone and ends ≤ 1
    assert(got.map(_._4).toSeq === got.map(_._4).sorted.toSeq)
    assert(got.last._4 <= 1.0 + 1e-12)
  }

  test("dedup_cluster_size_hist ≡ driver-side union-find over the " +
    "exact-Jaccard pair relation") {
    val got = graft.operators.Dedup2.clusterSizeHist.run(spark, TestSpark.tiny)
      .as[(Long, Long, Long)].collect()
    val pairs = graft.operators.Dedup.ngramJaccard.run(spark, TestSpark.tiny)
      .select("a_id", "b_id").as[(Long, Long)].collect()
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val sizes = parent.keys.toSeq.groupBy(find).map(_._2.size.toLong)
    val hist = sizes.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    assert(got.length === hist.size)
    got.foreach { case (size, nClusters, nDocs) =>
      assert(hist(size) === nClusters, s"size=$size")
      assert(nDocs === size * nClusters, s"size=$size")
      assert(size >= 2, "singletons never enter the pair graph")
    }
  }

  test("sim_filtered_topk: every neighbor shares the query's label, " +
    "ranks are the label-restricted brute-force order") {
    val got = Similarity9.filteredTopk.run(spark, TestSpark.tiny)
      .as[(Long, Long, Long, Long, Double)].collect()
    val emb = Tables.embeddings(spark, TestSpark.tiny)
      .select("vec_id", "embedding", "label")
      .as[(Long, Seq[Float], Long)].collect()
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      // sequential fold in index order, like the engine
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val byQ = got.groupBy(_._1)
    assert(byQ.keySet === emb.filter(_._1 < 10).map(_._1).toSet)
    byQ.foreach { case (qId, rows) =>
      val q = emb.find(_._1 == qId).get
      val inLabel = emb.filter(e => e._1 != qId && e._3 == q._3)
      val ref = inLabel.map(e => (e._1, cos(q._2, e._2)))
        .sortBy { case (id, sim) => (-sim, id) }.take(5)
      assert(rows.length === math.min(5, inLabel.length), s"q=$qId")
      rows.sortBy(_._4).zip(ref).foreach { case ((_, ql, nId, _, sim), (refId, refSim)) =>
        assert(ql === q._3, s"q=$qId")
        assert(nId === refId, s"q=$qId")
        assert(math.abs(sim - refSim) <= 1e-9, s"q=$qId")
      }
    }
  }

  test("sim_filtered_ivf: label invariant holds, results are a subset " +
    "of the probed-and-filtered candidates, recall vs the exact " +
    "filtered baseline is deterministic on this corpus") {
    val ivf = Similarity9.filteredIvf.run(spark, TestSpark.tiny)
      .as[(Long, Long, Long, Long, Double)].collect()
    val brute = Similarity9.filteredTopk.run(spark, TestSpark.tiny)
      .as[(Long, Long, Long, Long, Double)].collect()
    val labels = Tables.embeddings(spark, TestSpark.tiny)
      .select("vec_id", "label").as[(Long, Long)].collect().toMap
    assert(ivf.nonEmpty)
    ivf.foreach { case (q, ql, n, _, _) =>
      assert(labels(q) === ql, s"q=$q")
      assert(labels(n) === ql, s"q=$q n=$n: neighbor must share the label")
    }
    // per query, ranks are 1..m with strictly the ANN ordering
    ivf.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._4).sorted.toSeq === (1L to rows.length).toSeq, s"q=$q")
    }
    // recall@5 vs the exact in-category baseline: seeded planes make
    // this a fixed fact of the corpus, not a probabilistic hope
    val bruteSets = brute.groupBy(_._1).view.mapValues(_.map(_._3).toSet)
    val hits = ivf.count { case (q, _, n, _, _) => bruteSets(q).contains(n) }
    val recall = hits.toDouble / brute.length
    assert(recall >= 0.5,
      s"filtered-IVF recall@5 fell below the measured floor: $recall")
  }

  test("sim_pq_distortion ≡ driver-side per-cell SSE; cells partition " +
    "the corpus per subspace") {
    val got = Similarity9.pqDistortion.run(spark, TestSpark.tiny)
      .as[(Long, Long, Long, Double, Double)].collect()
    val emb = Tables.embeddings(spark, TestSpark.tiny)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    // same encode path as the query (seeded planes — deterministic)
    val codes: Seq[((Int, Long), Array[Array[Float]])] =
      emb.flatMap { case (_, e) =>
        (0 until 4).map { j =>
          val sl = e.slice(j * 16, (j + 1) * 16).toArray
          val code = (0 until 4).foldLeft(0L) { (acc, b) =>
            val p = 36 + j * 4 + b
            val dot = sl.indices.map(i =>
              sl(i).toDouble * graft.functions.SignMatrix.sign(p, i)).sum
            if (dot >= 0) acc | (1L << b) else acc
          }
          ((j, code), sl)
        }
      }.groupBy(_._1).view.mapValues(_.map(_._2).toArray).toSeq
    val refByCell = codes.map { case ((j, code), members) =>
      val n = members.length
      val sse = (0 until 16).map { pos =>
        val fp = members.map(m =>
          BigInt(math.floor(m(pos).toDouble * 1048576.0 + 0.5).toLong))
        val s = fp.sum; val ss = fp.map(v => v * v).sum
        (ss.toDouble - s.toDouble * s.toDouble / n) / (1048576.0 * 1048576.0)
      }.foldLeft(0.0)(_ + _)
      (j.toLong, code) -> ((n.toLong, sse))
    }.toMap
    assert(got.nonEmpty)
    assert(got.map(_._3).sum === emb.length.toLong * 4,
      "cells must partition the corpus once per subspace")
    got.foreach { case (j, code, n, sse, mse) =>
      val (nRef, sseRef) = refByCell((j, code))
      assert(n === nRef, s"cell ($j,$code)")
      assert(math.abs(sse - sseRef) <= 1e-9 * math.max(1.0, sseRef),
        s"cell ($j,$code)")
      assert(math.abs(mse - sse / (n * 16)) <= 1e-15, s"cell ($j,$code)")
      assert(mse >= -1e-12, s"cell ($j,$code)")
    }
    assert(got.length === refByCell.size)
  }
}
