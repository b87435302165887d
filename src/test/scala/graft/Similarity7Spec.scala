package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity7

class Similarity7Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sim_kmeans_rounds ≡ driver-side integer Lloyd loop") {
    val vecs = Tables.embeddings(spark, TestSpark.tiny)
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val scale = 1048576L
    val q = vecs.map { case (id, e) =>
      id -> e.map(x => math.floor(x.toDouble * scale + 0.5).toLong)
    }.toMap
    def cos(e: Array[Float], c: Array[Double]): Double = {
      var dot = 0.0; var ne = 0.0; var nc = 0.0; var i = 0
      while (i < e.length) {
        dot += e(i).toDouble * c(i); ne += e(i).toDouble * e(i)
        nc += c(i) * c(i); i += 1
      }
      dot / (math.sqrt(ne) * math.sqrt(nc))
    }
    def trunc(s: Long, n: Long): Long =
      if (s >= 0) s / n else -((-s) / n)

    var centroids: Map[Long, Array[Double]] = vecs.filter(_._1 < 8)
      .map { case (id, _) =>
        id -> q(id).map(_.toDouble / scale)
      }.toMap
    var assign: Map[Long, Long] = Map.empty
    var update: Map[(Long, Int), Long] = Map.empty
    for (_ <- 1 to 3) {
      assign = vecs.map { case (id, e) =>
        val best = centroids.toSeq
          .map { case (cid, c) => (cid, cos(e, c)) }
          .sortBy { case (cid, s) => (-s, cid) }.head._1
        id -> best
      }.toMap
      val members = assign.groupBy(_._2).view.mapValues(_.keys.toSeq).toMap
      update = members.flatMap { case (cid, ids) =>
        (0 until 64).map { d =>
          val s = ids.map(q(_)(d)).sum
          (cid, d) -> trunc(s, ids.size.toLong)
        }
      }.toMap
      centroids = members.keys.map { cid =>
        cid -> (0 until 64).map(d => update((cid, d)).toDouble / scale)
          .toArray
      }.toMap
    }
    val sizes = assign.groupBy(_._2).view.mapValues(_.size.toLong).toMap

    val got = Similarity7.kmeansRounds.run(spark, TestSpark.tiny)
      .select("cid", "dim", "centroid", "n_members")
      .as[(Long, Long, Double, Long)].collect()
    assert(got.length === centroids.size * 64)
    got.foreach { case (cid, dim, c, n) =>
      assert(c === update((cid, dim.toInt - 1)).toDouble / scale,
        s"centroid ($cid,$dim)")
      assert(n === sizes(cid))
    }
    assert(got.map(_._4).sum / 64 === vecs.length.toLong)
  }

  test("sim_knn_graph ≡ driver-side mutual top-5; edges reciprocated") {
    val vecs = Tables.embeddings(spark, TestSpark.tiny)
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
      .filter { case (id, _) => id % 10 == 0 && id < 20000L }
    def seqCos(a: Array[Float], b: Array[Float]): Double = {
      // the operator's sequential-fold shape: acc starts at 0.0, index order
      def dotF(x: Array[Float], y: Array[Float]): Double = {
        var acc = 0.0; var i = 0
        while (i < x.length) { acc += x(i).toDouble * y(i).toDouble; i += 1 }
        acc
      }
      dotF(a, b) / (math.sqrt(dotF(a, a)) * math.sqrt(dotF(b, b)))
    }
    val topk: Map[Long, Set[Long]] = vecs.map { case (id, e) =>
      id -> vecs.filter(_._1 != id)
        .map { case (oid, oe) => (oid, seqCos(e, oe)) }
        .sortBy { case (oid, s) => (-s, oid) }
        .take(5).map(_._1).toSet
    }.toMap
    val refEdges = (for {
      (a, na) <- topk.toSeq; b <- na
      if a < b && topk(b).contains(a)
    } yield (a, b)).toSet
    val got = Similarity7.knnGraph.run(spark, TestSpark.tiny)
      .select("a_id", "b_id")
      .as[(Long, Long)].collect().toSet
    assert(got === refEdges)
    assert(got.nonEmpty)
  }
}
